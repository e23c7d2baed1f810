"""Parity tests for return estimators against hand-rolled pure-Python
references — the pattern the reference uses to validate its numba kernels
(``test/base/test_returns.py:20,179,257``)."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.ops.returns import (
    discounted_returns,
    gae_advantages,
    nstep_return,
)


# -- pure-python oracles -----------------------------------------------------

def py_gae(rew, val, val_next, terminated, done, gamma, lam):
    T = len(rew)
    adv = np.zeros(T)
    running = 0.0
    for t in reversed(range(T)):
        delta = rew[t] + gamma * val_next[t] * (1 - terminated[t]) - val[t]
        running = delta + gamma * lam * (1 - done[t]) * running
        adv[t] = running
    return adv


def py_nstep(rews, dones, q_term, gamma, n):
    """Episode-aware n-step target for a single chain (already gathered,
    saturated at dones)."""
    # replicate semantics: accumulate rewards until first done (inclusive),
    # bootstrap with gamma^(steps) * q_term
    ret = 0.0
    steps = n
    for k in range(n):
        ret += (gamma**k) * rews[k]
        if dones[k]:
            steps = k + 1
            break
    return ret + (gamma**steps) * q_term


def test_gae_matches_reference_single_env():
    rng = np.random.default_rng(0)
    T = 57
    rew = rng.normal(size=T)
    val = rng.normal(size=T)
    val_next = rng.normal(size=T)
    terminated = rng.random(T) < 0.1
    truncated = (rng.random(T) < 0.05) & ~terminated
    done = terminated | truncated
    adv, ret = gae_advantages(
        jnp.asarray(rew),
        jnp.asarray(val),
        jnp.asarray(val_next),
        jnp.asarray(terminated),
        jnp.asarray(done),
        0.99,
        0.95,
    )
    expected = py_gae(rew, val, val_next, terminated, done, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), expected + val, rtol=1e-5, atol=1e-5)


def test_gae_batched_envs():
    rng = np.random.default_rng(1)
    T, N = 31, 4
    rew = rng.normal(size=(T, N))
    val = rng.normal(size=(T, N))
    val_next = rng.normal(size=(T, N))
    terminated = rng.random((T, N)) < 0.1
    done = terminated | (rng.random((T, N)) < 0.05)
    adv, _ = gae_advantages(
        jnp.asarray(rew),
        jnp.asarray(val),
        jnp.asarray(val_next),
        jnp.asarray(terminated),
        jnp.asarray(done),
        0.9,
        0.8,
    )
    for i in range(N):
        expected = py_gae(
            rew[:, i], val[:, i], val_next[:, i], terminated[:, i], done[:, i], 0.9, 0.8
        )
        np.testing.assert_allclose(np.asarray(adv)[:, i], expected, rtol=1e-4, atol=1e-5)


def test_gae_lambda_1_is_mc_return():
    """GAE(lambda=1) returns equal discounted MC returns (policy gradient
    path, reference ``pg.py:127-173``)."""
    rng = np.random.default_rng(2)
    T = 40
    rew = rng.normal(size=T).astype(np.float32)
    val = rng.normal(size=T).astype(np.float32)
    terminated = rng.random(T) < 0.15
    done = terminated.copy()
    done[-1] = True  # close the tail
    # within an episode the next-state value must be the next step's value
    # for the telescoping identity GAE(lambda=1)+V == MC return to hold
    val_next = np.empty_like(val)
    val_next[:-1] = val[1:]
    val_next[-1] = 0.0
    val_next[done] = rng.normal(size=int(done.sum()))  # arbitrary bootstrap
    terminated_j = jnp.asarray(terminated)
    done_j = jnp.asarray(done)
    _, ret = gae_advantages(
        jnp.asarray(rew), jnp.asarray(val), jnp.asarray(val_next),
        terminated_j, done_j, 0.99, 1.0,
    )
    mc = discounted_returns(
        jnp.asarray(rew), jnp.asarray(val_next), terminated_j, done_j, 0.99
    )
    np.testing.assert_allclose(np.asarray(ret), np.asarray(mc), rtol=1e-4, atol=1e-4)


def test_nstep_return_matches_oracle():
    rng = np.random.default_rng(3)
    B, n = 64, 5
    rews = rng.normal(size=(B, n))
    # saturated chains: after first done, entries repeat the done transition
    dones = np.zeros((B, n), bool)
    for b in range(B):
        if rng.random() < 0.6:
            k = rng.integers(0, n)
            dones[b, k:] = True
            rews[b, k + 1:] = rews[b, k]  # duplicated saturation entries
    q_term = rng.normal(size=B)
    gamma = 0.97
    got = nstep_return(
        jnp.asarray(rews), jnp.asarray(dones.astype(np.int32)),
        jnp.asarray(q_term), gamma,
    )
    expected = np.array(
        [py_nstep(rews[b], dones[b], q_term[b], gamma, n) for b in range(B)]
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


def test_nstep_one_step_is_td_target():
    rews = jnp.asarray([[1.0], [2.0]])
    dones = jnp.asarray([[0], [1]])
    q = jnp.asarray([10.0, 10.0])
    got = nstep_return(rews, dones, q, 0.5)
    np.testing.assert_allclose(np.asarray(got), [1.0 + 5.0, 2.0 + 5.0])
    # note: with n=1 the bootstrap applies in both cases; termination masking
    # happens via the value mask on q before calling (q=0 when terminated)


def test_truncation_bootstraps_termination_does_not():
    """value-mask semantics test (reference ``test_returns.py:257`` pattern):
    the caller masks q with ~terminated; GAE must stop accumulation at BOTH
    kinds of done but keep the bootstrap for truncation."""
    rew = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    val = jnp.zeros(4)
    val_next = jnp.asarray([0.0, 5.0, 0.0, 7.0])
    terminated = jnp.asarray([False, False, False, False])
    truncated = jnp.asarray([False, True, False, True])
    done = terminated | truncated
    adv, ret = gae_advantages(rew, val, val_next, terminated, done, 1.0, 1.0)
    # episode 1: steps 0-1, returns = 1 + (1 + 5) = 7, then 6
    # episode 2: steps 2-3, returns = 1 + (1 + 7) = 9, then 8
    np.testing.assert_allclose(np.asarray(ret), [7.0, 6.0, 9.0, 8.0])
    # terminated instead: no bootstrap
    terminated2 = truncated
    adv2, ret2 = gae_advantages(rew, val, val_next, terminated2, done, 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(ret2), [2.0, 1.0, 2.0, 1.0])
