"""DRQN: deep recurrent Q-learning over frame-stacked histories.

TPU-native counterpart of the reference's recurrent-DQN configuration
(``test/discrete/test_drqn.py``: ``DQNPolicy`` + ``Recurrent`` net +
``stack_num`` buffer sampling): acting threads an explicit LSTM carry
through the collector scan (``Algorithm.act_with_state``), and learning
rebuilds truncated histories of length ``stack_num`` from the ring buffer's
episode-aware ``prev`` chains (``buffer/base.py:340-382``).
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

__all__ = ["DRQN"]


class DRQN(DQN):
    def __init__(
        self,
        network,  # RecurrentQNet: (obs [B,L,D], carry) -> (q, carry)
        action_space: Discrete,
        *,
        stack_num: int = 4,
        **kwargs,
    ):
        kwargs.setdefault("n_step", 1)
        super().__init__(network, action_space, **kwargs)
        self.stack_num = stack_num

    def init(self, key: jax.Array, obs_example: Any) -> TrainState:
        obs = jnp.asarray(obs_example)[None]
        params = self.network.init(key, obs, self.network.init_carry(1))
        return TrainState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    # -- recurrent acting ---------------------------------------------------
    def init_policy_state(self, num_envs: int):
        return self.network.init_carry(num_envs)

    def act_with_state(self, ts, obs, policy_state, key, explore, explore_param=0.0):
        q, new_state = self.network.apply(ts.params, obs, policy_state)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        if not explore:
            return greedy, Batch(), new_state
        k1, k2 = jax.random.split(key)
        rand = jax.random.randint(k1, greedy.shape, 0, self.action_space.n)
        take = jax.random.uniform(k2, greedy.shape) < explore_param
        return jnp.where(take, rand, greedy).astype(jnp.int32), Batch(), new_state

    def act(self, ts, obs, key, explore, explore_param=0.0):
        act, extras, _ = self.act_with_state(
            ts, obs, self.network.init_carry(obs.shape[0]), key, explore,
            explore_param,
        )
        return act, extras

    # -- recurrent learning -------------------------------------------------
    def _q_from_history(self, params, stacked: jax.Array) -> jax.Array:
        carry = self.network.init_carry(stacked.shape[0])
        q, _ = self.network.apply(params, stacked, carry)
        return q

    def update(
        self,
        ts: TrainState,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        key: jax.Array,
        batch_size: int,
    ):
        env_idx, pos, weight = buffer.sample_with_weights(bstate, key, batch_size)
        batch = buffer.get(
            bstate, env_idx, pos, keys=("act", "rew", "terminated", "truncated")
        )
        stacked = buffer.stacked_obs(bstate, env_idx, pos, self.stack_num)
        stacked_next = buffer.stacked_obs(
            bstate, env_idx, pos, self.stack_num, obs_key="obs_next"
        )
        mask = 1.0 - batch["terminated"].astype(jnp.float32)

        q_t = self._q_from_history(ts.target_params, stacked_next)
        if self.is_double:
            a_star = jnp.argmax(
                self._q_from_history(ts.params, stacked_next), axis=-1
            )
            q_next = jnp.take_along_axis(q_t, a_star[:, None], axis=-1).squeeze(-1)
        else:
            q_next = q_t.max(axis=-1)
        target = jax.lax.stop_gradient(
            batch["rew"] + self.gamma * mask * q_next
        )

        def loss_fn(params):
            q = self._q_from_history(params, stacked)
            q_a = jnp.take_along_axis(
                q, batch["act"].astype(jnp.int32)[:, None], axis=-1
            ).squeeze(-1)
            td = q_a - target
            return (weight * td**2).mean(), jnp.abs(td)

        (loss, td_abs), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        bstate = buffer.update_priorities(bstate, env_idx, pos, td_abs)
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
