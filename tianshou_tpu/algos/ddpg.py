"""DDPG and TD3: deterministic actor-critic with target networks.

TPU-native counterparts of ``tianshou/policy/modelfree/ddpg.py:34``
(``DDPGPolicy``) and ``td3.py:28`` (``TD3Policy``).  The twin critics are a
``CriticEnsemble`` (one batched matmul) instead of two modules; target
computation + n-step returns + SGD fuse into one jitted :meth:`update`;
Gaussian exploration noise (reference ``ddpg.py:214-224``) is applied inside
:meth:`act` from an explicit PRNG key with the noise scale as the
``explore_param``.  TD3's delayed actor update (``td3.py:143-157``) is a
``lax.cond`` so the whole update stays one XLA program.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from tianshou_tpu.algos.base import Algorithm, polyak_update
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.envs.spaces import Box
from tianshou_tpu.ops.returns import nstep_return

__all__ = ["ACTrainState", "DDPG", "TD3"]


@struct.dataclass
class ACTrainState:
    actor_params: Any
    critic_params: Any
    target_actor_params: Any
    target_critic_params: Any
    actor_opt_state: Any
    critic_opt_state: Any
    step: jax.Array
    # SAC extras (unused by DDPG/TD3)
    log_alpha: Any = None
    alpha_opt_state: Any = None
    # CQL(Lagrange) dual variable (offline.py CQL.with_lagrange)
    cql_log_alpha: Any = None
    cql_alpha_opt_state: Any = None

    # uniform access used by the collector plumbing
    @property
    def params(self):
        return self.actor_params


class DDPG(Algorithm):
    def __init__(
        self,
        actor: nn.Module,
        critic: nn.Module,
        action_space: Box,
        *,
        actor_lr: float = 1e-3,
        critic_lr: float = 1e-3,
        gamma: float = 0.99,
        tau: float = 0.005,
        n_step: int = 1,
        exploration_noise: float = 0.1,
    ):
        self.actor = actor
        self.critic = critic  # CriticEnsemble-compatible: (obs, act) -> [K, B]
        self.action_space = action_space
        self.actor_optim = optax.adam(actor_lr)
        self.critic_optim = optax.adam(critic_lr)
        self.gamma = gamma
        self.tau = tau
        self.n_step = n_step
        self.exploration_noise = exploration_noise

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, obs_example: Any) -> ACTrainState:
        obs = jnp.asarray(obs_example)[None]
        k_a, k_c = jax.random.split(key)
        act_dim = self.action_space.shape[0]
        actor_params = self.actor.init(k_a, obs)
        act = jnp.zeros((1, act_dim), jnp.float32)
        critic_params = self.critic.init(k_c, obs, act)
        return ACTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=actor_params,
            target_critic_params=critic_params,
            actor_opt_state=self.actor_optim.init(actor_params),
            critic_opt_state=self.critic_optim.init(critic_params),
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def act_params(self, ts):
        return ts.actor_params

    def with_act_params(self, ts, sub):
        return ts.replace(actor_params=sub)

    def act(self, ts: ACTrainState, obs, key, explore, explore_param=None):
        a = self.actor.apply(ts.actor_params, obs)
        if explore:
            sigma = (
                self.exploration_noise if explore_param is None else explore_param
            )
            a = a + sigma * jax.random.normal(key, a.shape)
            a = jnp.clip(a, -1.0, 1.0)
        return a, Batch()

    # ------------------------------------------------------------------
    def _target_action(self, ts: ACTrainState, obs_next, key):
        return self.actor.apply(ts.target_actor_params, obs_next)

    def _target_q(self, ts: ACTrainState, obs_next, value_mask, key):
        a_next = self._target_action(ts, obs_next, key)
        q = self.critic.apply(ts.target_critic_params, obs_next, a_next)
        return q.min(axis=0) * value_mask

    def _actor_loss(self, ts: ACTrainState, actor_params, batch) -> jax.Array:
        obs = batch["obs"]
        a = self.actor.apply(actor_params, obs)
        q = self.critic.apply(ts.critic_params, obs, a)[0]
        return -q.mean()

    def _update_actor(
        self, ts: ACTrainState, batch
    ) -> tuple[ACTrainState, jax.Array]:
        def actor_loss_fn(ap):
            return self._actor_loss(ts, ap, batch)

        loss, grads = jax.value_and_grad(actor_loss_fn)(ts.actor_params)
        updates, opt_state = self.actor_optim.update(
            grads, ts.actor_opt_state, ts.actor_params
        )
        actor_params = optax.apply_updates(ts.actor_params, updates)
        ts = ts.replace(
            actor_params=actor_params,
            actor_opt_state=opt_state,
            target_actor_params=polyak_update(
                ts.target_actor_params, actor_params, self.tau
            ),
            target_critic_params=polyak_update(
                ts.target_critic_params, ts.critic_params, self.tau
            ),
        )
        return ts, loss

    supports_presampled = True

    def update_sampled(
        self,
        ts: ACTrainState,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        sampled: tuple,
        key: jax.Array,
    ) -> tuple[ACTrainState, ReplayBufferState, dict[str, jax.Array]]:
        k_tgt = key
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        q_term = self._target_q(ts, term["obs_next"], mask, k_tgt)
        target = jax.lax.stop_gradient(
            nstep_return(rew_chain, done_chain, q_term, self.gamma)
        )

        def critic_loss_fn(cp):
            q = self.critic.apply(cp, batch["obs"], batch["act"])  # [K, B]
            td = q - target[None, :]
            return (weight[None, :] * td**2).mean(), jnp.abs(td).mean(axis=0)

        (closs, td_abs), grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            ts.critic_params
        )
        bstate = buffer.update_priorities(bstate, env_idx, pos, td_abs)
        updates, c_opt = self.critic_optim.update(
            grads, ts.critic_opt_state, ts.critic_params
        )
        ts = ts.replace(
            critic_params=optax.apply_updates(ts.critic_params, updates),
            critic_opt_state=c_opt,
            step=ts.step + 1,
        )

        ts, aloss = self._maybe_update_actor(ts, batch)
        return ts, bstate, {"critic_loss": closs, "actor_loss": aloss}

    def priority_scores(self, ts: ACTrainState, sampled: tuple, key=None):
        """Mean-over-critics |TD| under ``ts`` — what :meth:`update_sampled`
        writes back.  With the update's ``key`` the target computation
        (TD3 smoothing noise) mirrors the update exactly."""
        if key is None:
            key = jax.random.key(0)
        k_tgt = key  # update_sampled uses the whole key as k_tgt
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        q_term = self._target_q(ts, term["obs_next"], mask, k_tgt)
        target = nstep_return(rew_chain, done_chain, q_term, self.gamma)
        q = self.critic.apply(ts.critic_params, batch["obs"], batch["act"])
        return jnp.abs(q - target[None, :]).mean(axis=0)

    def _maybe_update_actor(self, ts: ACTrainState, batch):
        return self._update_actor(ts, batch)


class TD3(DDPG):
    """TD3 = DDPG + twin critics + target policy smoothing + delayed actor
    (reference ``td3.py:28``)."""

    def __init__(
        self,
        actor: nn.Module,
        critic: nn.Module,
        action_space: Box,
        *,
        policy_noise: float = 0.2,
        noise_clip: float = 0.5,
        update_actor_freq: int = 2,
        **kwargs,
    ):
        super().__init__(actor, critic, action_space, **kwargs)
        self.policy_noise = policy_noise
        self.noise_clip = noise_clip
        self.update_actor_freq = update_actor_freq

    def _target_action(self, ts, obs_next, key):
        a = self.actor.apply(ts.target_actor_params, obs_next)
        noise = jnp.clip(
            self.policy_noise * jax.random.normal(key, a.shape),
            -self.noise_clip,
            self.noise_clip,
        )
        return jnp.clip(a + noise, -1.0, 1.0)

    def _maybe_update_actor(self, ts: ACTrainState, batch):
        def do_update(ts):
            return self._update_actor(ts, batch)

        def skip(ts):
            return ts, jnp.zeros(())

        return jax.lax.cond(
            ts.step % self.update_actor_freq == 0, do_update, skip, ts
        )
