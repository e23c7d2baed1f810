"""Return/advantage estimators as XLA scan kernels.

TPU-native replacements for the reference's numba kernels:
- ``_gae_return`` (``tianshou/policy/base.py:696-742``) -> :func:`gae_advantages`
  as a reversed ``lax.scan`` (jit-compiled, fuses into the train step).
- ``_nstep_return`` (``tianshou/policy/base.py:745-769``) -> :func:`nstep_return`
  over pre-gathered index chains (see ``data/buffer.py`` for the chaining).

Semantics preserved exactly (verified by parity tests against pure-Python
references, mirroring ``test/base/test_returns.py``):
- bootstrap mask: a state's value is bootstrapped unless the episode
  *terminated* there (truncated episodes DO bootstrap) — the reference's
  ``value_mask`` (``policy/base.py:553-571``).
- accumulation stops at ``done = terminated | truncated`` (the reference's
  ``end_flag``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "gae_advantages",
    "nstep_return",
    "nstep_return_components",
    "discounted_returns",
]


def gae_advantages(
    rewards: jax.Array,
    values: jax.Array,
    next_values: jax.Array,
    terminated: jax.Array,
    done: jax.Array,
    gamma: float,
    gae_lambda: float,
) -> tuple[jax.Array, jax.Array]:
    """Generalized advantage estimation over the leading time axis.

    All inputs are time-major ``[T, ...]`` (trailing dims broadcast, e.g.
    ``[T, num_envs]``).  ``next_values`` are V(s_{t+1}) — for the last step of
    an unfinished trajectory this is the bootstrap value; for a terminated
    step it is masked out here.

    Returns ``(advantages, returns)`` with ``returns = advantages + values``.
    """
    terminated = terminated.astype(values.dtype)
    done = done.astype(values.dtype)
    deltas = rewards + gamma * next_values * (1.0 - terminated) - values
    decay = gamma * gae_lambda * (1.0 - done)

    def _step(carry, x):
        delta_t, decay_t = x
        adv = delta_t + decay_t * carry
        return adv, adv

    _, advantages = jax.lax.scan(
        _step, jnp.zeros_like(deltas[0]), (deltas, decay), reverse=True
    )
    return advantages, advantages + values


def discounted_returns(
    rewards: jax.Array,
    next_values: jax.Array,
    terminated: jax.Array,
    done: jax.Array,
    gamma: float,
) -> jax.Array:
    """Monte-Carlo discounted returns with bootstrap at truncation.

    Equivalent to GAE with ``gae_lambda=1`` (the reference computes REINFORCE
    returns exactly this way, ``policy/modelfree/pg.py:127-173``), but exposed
    directly for clarity.
    """
    terminated = terminated.astype(rewards.dtype)
    done = done.astype(rewards.dtype)

    def _step(carry, x):
        r, v_next, term, dn = x
        # Episode boundary: restart accumulation from the (masked) bootstrap.
        future = jnp.where(dn > 0, v_next * (1.0 - term), carry)
        ret = r + gamma * future
        return ret, ret

    # Seed with the unfinished-tail bootstrap; the scan's first (reverse)
    # iteration overwrites the carry whenever that step is done anyway.
    init = next_values[-1] * (1.0 - terminated[-1])
    _, returns = jax.lax.scan(
        _step, init, (rewards, next_values, terminated, done), reverse=True
    )
    return returns


def nstep_return(
    rew_chain: jax.Array,
    done_chain: jax.Array,
    q_terminal: jax.Array,
    gamma: float,
) -> jax.Array:
    """n-step bootstrapped target from pre-gathered transition chains.

    ``rew_chain``/``done_chain`` are ``[B, n]`` where position ``k`` holds the
    reward / done flag of the k-th transition after (and including) the
    sampled one; chains gathered with saturation at episode ends (duplicated
    entries are harmless: the accumulator is zeroed at every done flag, which
    reproduces the reference's backward recursion ``policy/base.py:745-769``).

    ``q_terminal`` is ``[B]``: the (already value-masked) target value at the
    chain's final state, i.e. ``mask * max_a Q_target(s_{t+n}, a)`` or the
    target critic value.
    """
    returns, discount = nstep_return_components(
        rew_chain, done_chain, gamma, dtype=q_terminal.dtype
    )
    return q_terminal * discount + returns


def nstep_return_components(
    rew_chain: jax.Array,
    done_chain: jax.Array,
    gamma: float,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Decomposed n-step target: ``(accumulated_returns [B],
    bootstrap_discount [B])`` with ``target = q_terminal * discount +
    returns``.  Exposed separately so distributional targets (C51 support
    projection, quantile targets) can shift whole value distributions:
    ``Tz_j = returns + discount * z_j``."""
    bsz, n = rew_chain.shape
    returns = jnp.zeros((bsz,), dtype)
    gammas = jnp.full((bsz,), n, dtype=jnp.int32)
    for k in range(n - 1, -1, -1):
        dk = done_chain[:, k] > 0
        gammas = jnp.where(dk, k + 1, gammas)
        returns = jnp.where(dk, 0.0, returns)
        returns = rew_chain[:, k].astype(dtype) + gamma * returns
    discount = jnp.power(jnp.asarray(gamma, dtype), gammas.astype(dtype))
    return returns, discount
