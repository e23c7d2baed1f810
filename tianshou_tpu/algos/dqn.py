"""DQN with double-Q, dueling (via net choice) and n-step targets.

TPU-native counterpart of ``tianshou/policy/modelfree/dqn.py:31``
(``DQNPolicy``): the ``process_fn`` n-step target computation
(``dqn.py:137-156`` -> ``compute_nstep_return`` ``policy/base.py:626``) and
the ``learn`` SGD step (``dqn.py:212-234``) are fused into one jitted
:meth:`update`; the target network sync (``dqn.py:117-119``) is a periodic
functional swap; eps-greedy exploration (``dqn.py:238-254``) uses explicit
PRNG keys inside :meth:`act` so it runs inside the collector scan.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.envs.spaces import Discrete
from tianshou_tpu.ops.returns import nstep_return

__all__ = ["DQN"]


class DQN(Algorithm):
    def __init__(
        self,
        network: nn.Module,
        action_space: Discrete,
        optimizer: optax.GradientTransformation | None = None,
        lr: float = 1e-3,
        gamma: float = 0.99,
        n_step: int = 1,
        target_update_freq: int = 0,
        is_double: bool = True,
        huber: bool = False,
    ):
        self.network = network
        self.action_space = action_space
        self.optimizer = optimizer or optax.adam(lr)
        self.gamma = gamma
        self.n_step = n_step
        self.target_update_freq = target_update_freq
        self.is_double = is_double
        self.huber = huber

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, obs_example: Any) -> TrainState:
        obs = jax.tree.map(lambda x: jnp.asarray(x)[None], obs_example)
        params = self.network.init(key, self._net_input(obs))
        return TrainState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @staticmethod
    def _net_input(obs: Any) -> jax.Array:
        """Support dict observations with action masks (the reference's
        ``obs.mask`` pattern, ``dqn.py:158-164``, used by MARL envs)."""
        if isinstance(obs, (Batch, dict)) and "obs" in obs:
            return obs["obs"]
        return obs

    @staticmethod
    def _action_mask(obs: Any) -> jax.Array | None:
        if isinstance(obs, (Batch, dict)) and "mask" in obs:
            return obs["mask"].astype(bool)
        return None

    def q_values(self, params: Any, obs: Any) -> jax.Array:
        q = self.network.apply(params, self._net_input(obs))
        mask = self._action_mask(obs)
        if mask is not None:
            q = jnp.where(mask, q, -1e9)
        return q

    # ------------------------------------------------------------------
    def act_params(self, ts):
        return ts.params

    def with_act_params(self, ts, sub):
        return ts.replace(params=sub)

    def act(self, ts, obs, key, explore, explore_param=0.0):
        q = self.q_values(ts.params, obs)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        if not explore:
            return greedy, Batch()
        k1, k2 = jax.random.split(key)
        mask = self._action_mask(obs)
        if mask is None:
            rand = jax.random.randint(k1, greedy.shape, 0, self.action_space.n)
        else:
            # uniform over legal actions via masked Gumbel trick
            g = jax.random.gumbel(k1, q.shape)
            rand = jnp.argmax(jnp.where(mask, g, -jnp.inf), axis=-1).astype(
                jnp.int32
            )
        take_rand = jax.random.uniform(k2, greedy.shape) < explore_param
        return jnp.where(take_rand, rand, greedy).astype(jnp.int32), Batch()

    # ------------------------------------------------------------------
    def _target_q(self, ts: TrainState, obs_next: jax.Array, value_mask: jax.Array):
        """Masked bootstrap value at the n-step terminal states
        (double-DQN action selection per ``dqn.py:127-135``)."""
        q_t = self.q_values(ts.target_params, obs_next)
        if self.is_double:
            a_star = jnp.argmax(self.q_values(ts.params, obs_next), axis=-1)
            q = jnp.take_along_axis(q_t, a_star[:, None], axis=-1).squeeze(-1)
        else:
            q = q_t.max(axis=-1)
        return q * value_mask

    def _loss(self, params, obs, act, target, weight):
        q = jnp.take_along_axis(
            self.q_values(params, obs), act[:, None].astype(jnp.int32), axis=-1
        ).squeeze(-1)
        td = q - target
        if self.huber:
            loss = (weight * optax.huber_loss(q, target)).mean()
        else:
            loss = (weight * td**2).mean()
        return loss, jnp.abs(td)

    supports_presampled = True

    def update_sampled(
        self,
        ts: TrainState,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        sampled: tuple,
        key: jax.Array,
    ) -> tuple[TrainState, ReplayBufferState, dict[str, jax.Array]]:
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        # value_mask: bootstrap unless terminated (policy/base.py:553-571)
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        q_term = self._target_q(ts, term["obs_next"], mask)
        target = nstep_return(rew_chain, done_chain, q_term, self.gamma)
        target = jax.lax.stop_gradient(target)

        (loss, td_abs), grads = jax.value_and_grad(self._loss, has_aux=True)(
            ts.params, batch["obs"], batch["act"], target, weight
        )
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
        return ts, bstate, {"loss": loss, "td_abs_mean": td_abs.mean()}

    def priority_scores(self, ts: TrainState, sampled: tuple, key=None) -> jax.Array:
        """|TD| of the sampled batch under ``ts`` (pre-update params): the
        quantity :meth:`update_sampled` writes into the PER tree, exposed
        for process-local write-back in the distributed trainer.
        Deterministic — ``key`` is unused."""
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        q_term = self._target_q(ts, term["obs_next"], mask)
        target = nstep_return(rew_chain, done_chain, q_term, self.gamma)
        q = jnp.take_along_axis(
            self.q_values(ts.params, batch["obs"]),
            batch["act"][:, None].astype(jnp.int32),
            axis=-1,
        ).squeeze(-1)
        return jnp.abs(q - target)
