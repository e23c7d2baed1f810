"""C51 (categorical DQN) and Rainbow.

TPU-native counterparts of ``tianshou/policy/modelfree/c51.py:23``
(``C51Policy``: support atoms + projection ``c51.py:101-117``, cross-entropy
loss ``c51.py:119-137``) and ``rainbow.py:468`` (``RainbowPolicy``: C51 +
NoisyLinear resampling per learn step ``rainbow.py:442-456,479-488``; PER +
n-step arrive via buffer/config as in the reference).  The categorical
projection is a vectorized scatter-add over the support — one fused XLA op
sequence instead of the reference's per-sample torch indexing.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algos.base import TrainState
from tianshou_tpu.algos.dqn import DQN
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.envs.spaces import Discrete
from tianshou_tpu.ops.returns import nstep_return_components

__all__ = ["C51", "Rainbow"]


class C51(DQN):
    def __init__(
        self,
        network,  # obs -> [B, A, num_atoms] probabilities
        action_space: Discrete,
        *,
        num_atoms: int = 51,
        v_min: float = -10.0,
        v_max: float = 10.0,
        noisy_net: bool = False,
        **kwargs,
    ):
        super().__init__(network, action_space, **kwargs)
        assert v_max > v_min
        self.num_atoms = num_atoms
        self.v_min = v_min
        self.v_max = v_max
        self.noisy_net = noisy_net
        self.support = jnp.linspace(v_min, v_max, num_atoms)
        self.delta_z = (v_max - v_min) / (num_atoms - 1)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, obs_example: Any) -> TrainState:
        obs = jnp.asarray(obs_example)[None]
        if self.noisy_net:
            k1, k2 = jax.random.split(key)
            params = self.network.init({"params": k1, "noise": k2}, obs)
        else:
            params = self.network.init(key, obs)
        return TrainState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def probs(self, params, obs, key=None, noisy=False):
        if self.noisy_net:
            if noisy:
                return self.network.apply(
                    params, obs, True, rngs={"noise": key}
                )
            return self.network.apply(params, obs, False)
        return self.network.apply(params, obs)

    def q_from_probs(self, probs: jax.Array) -> jax.Array:
        return (probs * self.support).sum(axis=-1)

    # eps-greedy over expected values; noisy nets explore via weight noise
    def act(self, ts, obs, key, explore, explore_param=0.0):
        k_noise, k_eps = jax.random.split(key)
        q = self.q_from_probs(
            self.probs(ts.params, obs, k_noise, noisy=explore)
        )
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        if not explore or self.noisy_net:
            return greedy, Batch()
        k1, k2 = jax.random.split(k_eps)
        rand = jax.random.randint(k1, greedy.shape, 0, self.action_space.n)
        take = jax.random.uniform(k2, greedy.shape) < explore_param
        return jnp.where(take, rand, greedy).astype(jnp.int32), Batch()

    # ------------------------------------------------------------------
    def _project(self, target_probs, returns, discount, mask):
        """Categorical projection of ``Tz_j = returns + discount*mask*z_j``
        back onto the fixed support (Bellemare et al. 2017, alg. 1)."""
        B = returns.shape[0]
        tz = returns[:, None] + discount[:, None] * mask[:, None] * self.support
        tz = jnp.clip(tz, self.v_min, self.v_max)
        b = (tz - self.v_min) / self.delta_z
        low = jnp.floor(b)
        high = jnp.ceil(b)
        # when b is integral, put all mass on `low`
        frac_h = b - low
        frac_l = 1.0 - frac_h
        m = jnp.zeros((B, self.num_atoms))
        rows = jnp.broadcast_to(jnp.arange(B)[:, None], b.shape)
        m = m.at[rows, low.astype(jnp.int32)].add(target_probs * frac_l)
        m = m.at[rows, jnp.minimum(high, self.num_atoms - 1).astype(jnp.int32)].add(
            target_probs * frac_h
        )
        return m

    supports_presampled = True

    def update_sampled(
        self,
        ts: TrainState,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        sampled: tuple,
        key: jax.Array,
    ):
        k_n1, k_n2 = jax.random.split(key)
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        returns, discount = nstep_return_components(
            rew_chain, done_chain, self.gamma
        )

        p_target = self.probs(ts.target_params, term["obs_next"], k_n1, noisy=True)
        if self.is_double:
            q_online = self.q_from_probs(
                self.probs(ts.params, term["obs_next"], k_n2, noisy=True)
            )
            a_star = jnp.argmax(q_online, axis=-1)
        else:
            a_star = jnp.argmax(self.q_from_probs(p_target), axis=-1)
        p_star = jnp.take_along_axis(
            p_target, a_star[:, None, None], axis=1
        ).squeeze(1)  # [B, atoms]
        m = jax.lax.stop_gradient(
            self._project(p_star, returns, discount, mask)
        )

        def loss_fn(params):
            p = self.probs(params, batch["obs"], k_n2, noisy=True)
            p_a = jnp.take_along_axis(
                p, batch["act"].astype(jnp.int32)[:, None, None], axis=1
            ).squeeze(1)
            ce = -(m * jnp.log(jnp.clip(p_a, 1e-8))).sum(axis=-1)
            return (weight * ce).mean(), ce

        (loss, ce), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        bstate = buffer.update_priorities(bstate, env_idx, pos, ce)
        updates, opt_state = self.optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        step = ts.step + 1
        if self.target_update_freq > 0:
            sync = (step % self.target_update_freq) == 0
            target_params = jax.tree.map(
                lambda t, o: jnp.where(sync, o, t), ts.target_params, params
            )
        else:
            target_params = params
        ts = ts.replace(
            params=params, target_params=target_params, opt_state=opt_state, step=step
        )
        return ts, bstate, {"loss": loss}

    def priority_scores(self, ts, sampled, key=None):
        """Per-sample cross-entropy under ``ts`` — C51's PER priority
        (what :meth:`update_sampled` writes back).  With the update's
        ``key`` the noisy-net forwards mirror the update's key splits
        exactly; without one, deterministic weights are used (noise-free
        approximation)."""
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        returns, discount = nstep_return_components(
            rew_chain, done_chain, self.gamma
        )
        noisy = key is not None
        k_n1, k_n2 = (
            jax.random.split(key) if noisy else (jax.random.key(0),) * 2
        )
        p_target = self.probs(ts.target_params, term["obs_next"], k_n1, noisy=noisy)
        if self.is_double:
            q_online = self.q_from_probs(
                self.probs(ts.params, term["obs_next"], k_n2, noisy=noisy)
            )
            a_star = jnp.argmax(q_online, axis=-1)
        else:
            a_star = jnp.argmax(self.q_from_probs(p_target), axis=-1)
        p_star = jnp.take_along_axis(
            p_target, a_star[:, None, None], axis=1
        ).squeeze(1)
        m = self._project(p_star, returns, discount, mask)
        p = self.probs(ts.params, batch["obs"], k_n2, noisy=noisy)
        p_a = jnp.take_along_axis(
            p, batch["act"].astype(jnp.int32)[:, None, None], axis=1
        ).squeeze(1)
        return -(m * jnp.log(jnp.clip(p_a, 1e-8))).sum(axis=-1)


class Rainbow(C51):
    """C51 + noisy networks (+ PER and n-step via buffer/config), the
    reference's ``RainbowPolicy`` (``rainbow.py:468``).  Pass a
    ``C51Net(noisy=True)``-style network; fresh factorized noise is drawn
    per forward from the explicit keys, reproducing the
    sample-noise-per-learn-step rule."""

    def __init__(self, network, action_space, **kwargs):
        kwargs.setdefault("noisy_net", True)
        super().__init__(network, action_space, **kwargs)
