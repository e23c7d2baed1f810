"""SAC: squashed-Gaussian actor, twin critics, automatic entropy tuning.

TPU-native counterpart of ``tianshou/policy/modelfree/sac.py:37``
(``SACPolicy``): the tanh-squashed reparameterized sampling with log-prob
correction (``sac.py:170-198``), entropy-regularized twin-critic targets
(``sac.py:200-213``) and auto-alpha dual update (``sac.py:122-143,234-241``)
all live in one jitted :meth:`update`; sampling in :meth:`act` uses explicit
PRNG keys so it runs inside the collector scan.  DiscreteSAC
(``discrete_sac.py:26``) shares the alpha machinery with expectation-based
targets.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from tianshou_tpu.algos.base import Algorithm
from tianshou_tpu.algos.ddpg import ACTrainState, polyak_update
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.envs.spaces import Box, Discrete
from tianshou_tpu.ops.dist import (
    categorical_sample,
    tanh_normal_sample_and_log_prob,
)
from tianshou_tpu.ops.returns import nstep_return

__all__ = ["SAC", "DiscreteSAC"]


class SAC(Algorithm):
    def __init__(
        self,
        actor: nn.Module,  # obs -> (mu, sigma)
        critic: nn.Module,  # CriticEnsemble (obs, act) -> [K, B]
        action_space: Box,
        *,
        actor_lr: float = 1e-3,
        critic_lr: float = 1e-3,
        alpha: float = 0.2,
        auto_alpha: bool = True,
        alpha_lr: float = 3e-4,
        target_entropy: float | None = None,
        gamma: float = 0.99,
        tau: float = 0.005,
        n_step: int = 1,
        deterministic_eval: bool = True,
    ):
        self.actor = actor
        self.critic = critic
        self.action_space = action_space
        self.actor_optim = optax.adam(actor_lr)
        self.critic_optim = optax.adam(critic_lr)
        self.alpha_optim = optax.adam(alpha_lr)
        self.fixed_alpha = alpha
        self.auto_alpha = auto_alpha
        # reference default: -dim(A)  (sac.py auto-alpha setup)
        self.target_entropy = (
            target_entropy
            if target_entropy is not None
            else -float(action_space.shape[0])
        )
        self.gamma = gamma
        self.tau = tau
        self.n_step = n_step
        self.deterministic_eval = deterministic_eval

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, obs_example: Any) -> ACTrainState:
        obs = jnp.asarray(obs_example)[None]
        k_a, k_c = jax.random.split(key)
        act_dim = self.action_space.shape[0]
        actor_params = self.actor.init(k_a, obs)
        critic_params = self.critic.init(
            k_c, obs, jnp.zeros((1, act_dim), jnp.float32)
        )
        log_alpha = jnp.asarray(jnp.log(self.fixed_alpha), jnp.float32)
        return ACTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=actor_params,  # unused; kept for struct parity
            target_critic_params=critic_params,
            actor_opt_state=self.actor_optim.init(actor_params),
            critic_opt_state=self.critic_optim.init(critic_params),
            step=jnp.zeros((), jnp.int32),
            log_alpha=log_alpha,
            alpha_opt_state=self.alpha_optim.init(log_alpha),
        )

    # ------------------------------------------------------------------
    def act_params(self, ts):
        return ts.actor_params

    def with_act_params(self, ts, sub):
        return ts.replace(actor_params=sub)

    def act(self, ts: ACTrainState, obs, key, explore, explore_param=0.0):
        mu, sigma = self.actor.apply(ts.actor_params, obs)
        if not explore and self.deterministic_eval:
            return jnp.tanh(mu), Batch()
        a, _ = tanh_normal_sample_and_log_prob(key, mu, sigma)
        return a, Batch()

    def _sample_with_log_prob(self, params, obs, key):
        mu, sigma = self.actor.apply(params, obs)
        return tanh_normal_sample_and_log_prob(key, mu, sigma)

    # ------------------------------------------------------------------
    supports_presampled = True

    def update_sampled(
        self,
        ts: ACTrainState,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        sampled: tuple,
        key: jax.Array,
    ) -> tuple[ACTrainState, ReplayBufferState, dict[str, jax.Array]]:
        k_tgt, k_pi = jax.random.split(key)
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        alpha = jnp.exp(ts.log_alpha)

        # entropy-regularized target (sac.py:200-213)
        a_next, logp_next = self._sample_with_log_prob(
            ts.actor_params, term["obs_next"], k_tgt
        )
        q_next = self.critic.apply(
            ts.target_critic_params, term["obs_next"], a_next
        ).min(axis=0)
        q_term = (q_next - alpha * logp_next) * mask
        target = jax.lax.stop_gradient(
            nstep_return(rew_chain, done_chain, q_term, self.gamma)
        )

        def critic_loss_fn(cp):
            q = self.critic.apply(cp, batch["obs"], batch["act"])
            td = q - target[None, :]
            return (weight[None, :] * td**2).mean(), jnp.abs(td).mean(axis=0)

        (closs, td_abs), grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            ts.critic_params
        )
        bstate = buffer.update_priorities(bstate, env_idx, pos, td_abs)
        updates, c_opt = self.critic_optim.update(
            grads, ts.critic_opt_state, ts.critic_params
        )
        critic_params = optax.apply_updates(ts.critic_params, updates)

        def actor_loss_fn(ap):
            a, logp = self._sample_with_log_prob(ap, batch["obs"], k_pi)
            q = self.critic.apply(critic_params, batch["obs"], a).min(axis=0)
            return (alpha * logp - q).mean(), logp

        (aloss, logp), grads = jax.value_and_grad(actor_loss_fn, has_aux=True)(
            ts.actor_params
        )
        updates, a_opt = self.actor_optim.update(
            grads, ts.actor_opt_state, ts.actor_params
        )
        actor_params = optax.apply_updates(ts.actor_params, updates)

        log_alpha, al_opt, alpha_loss = ts.log_alpha, ts.alpha_opt_state, jnp.zeros(())
        if self.auto_alpha:

            def alpha_loss_fn(la):
                return -(
                    la * jax.lax.stop_gradient(logp + self.target_entropy)
                ).mean()

            alpha_loss, agrad = jax.value_and_grad(alpha_loss_fn)(ts.log_alpha)
            aupd, al_opt = self.alpha_optim.update(agrad, ts.alpha_opt_state)
            log_alpha = optax.apply_updates(ts.log_alpha, aupd)

        ts = ts.replace(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=polyak_update(
                ts.target_critic_params, critic_params, self.tau
            ),
            actor_opt_state=a_opt,
            critic_opt_state=c_opt,
            log_alpha=log_alpha,
            alpha_opt_state=al_opt,
            step=ts.step + 1,
        )
        return ts, bstate, {
            "critic_loss": closs,
            "actor_loss": aloss,
            "alpha": jnp.exp(log_alpha),
            "alpha_loss": alpha_loss,
        }

    def priority_scores(self, ts, sampled, key=None):
        """Mean-over-critics |TD| against the entropy-regularized target
        under ``ts``; with the update's ``key`` the next-action sample
        mirrors the update's ``k_tgt`` split exactly."""
        if key is None:
            key = jax.random.key(0)
        k_tgt, _ = jax.random.split(key)  # mirror update_sampled
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        alpha = jnp.exp(ts.log_alpha)
        a_next, logp_next = self._sample_with_log_prob(
            ts.actor_params, term["obs_next"], k_tgt
        )
        q_next = self.critic.apply(
            ts.target_critic_params, term["obs_next"], a_next
        ).min(axis=0)
        q_term = (q_next - alpha * logp_next) * mask
        target = nstep_return(rew_chain, done_chain, q_term, self.gamma)
        q = self.critic.apply(ts.critic_params, batch["obs"], batch["act"])
        return jnp.abs(q - target[None, :]).mean(axis=0)


class DiscreteSAC(Algorithm):
    """SAC over categorical policies (reference ``discrete_sac.py:26``):
    expectation-based targets instead of sampled ones."""

    def __init__(
        self,
        actor: nn.Module,  # obs -> logits
        critic: nn.Module,  # ensemble obs -> [K, B, A]
        action_space: Discrete,
        *,
        actor_lr: float = 1e-3,
        critic_lr: float = 1e-3,
        alpha: float = 0.05,
        auto_alpha: bool = True,
        alpha_lr: float = 3e-4,
        target_entropy: float | None = None,
        gamma: float = 0.99,
        tau: float = 0.005,
        n_step: int = 1,
    ):
        self.actor = actor
        self.critic = critic
        self.action_space = action_space
        self.actor_optim = optax.adam(actor_lr)
        self.critic_optim = optax.adam(critic_lr)
        self.alpha_optim = optax.adam(alpha_lr)
        self.fixed_alpha = alpha
        self.auto_alpha = auto_alpha
        # reference: 0.98 * log(|A|)
        self.target_entropy = (
            target_entropy
            if target_entropy is not None
            else 0.98 * float(jnp.log(action_space.n))
        )
        self.gamma = gamma
        self.tau = tau
        self.n_step = n_step

    def init(self, key: jax.Array, obs_example: Any) -> ACTrainState:
        obs = jnp.asarray(obs_example)[None]
        k_a, k_c = jax.random.split(key)
        actor_params = self.actor.init(k_a, obs)
        critic_params = self.critic.init(k_c, obs)
        log_alpha = jnp.asarray(jnp.log(self.fixed_alpha), jnp.float32)
        return ACTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=actor_params,
            target_critic_params=critic_params,
            actor_opt_state=self.actor_optim.init(actor_params),
            critic_opt_state=self.critic_optim.init(critic_params),
            step=jnp.zeros((), jnp.int32),
            log_alpha=log_alpha,
            alpha_opt_state=self.alpha_optim.init(log_alpha),
        )

    def act_params(self, ts):
        return ts.actor_params

    def with_act_params(self, ts, sub):
        return ts.replace(actor_params=sub)

    def act(self, ts, obs, key, explore, explore_param=0.0):
        logits = self.actor.apply(ts.actor_params, obs)
        if not explore:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), Batch()
        return categorical_sample(key, logits), Batch()

    supports_presampled = True

    def update_sampled(self, ts, buffer, bstate, sampled, key):
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        alpha = jnp.exp(ts.log_alpha)

        # expectation-based soft value (discrete_sac.py:117-128)
        logits_next = self.actor.apply(ts.actor_params, term["obs_next"])
        pi_next = jax.nn.softmax(logits_next, axis=-1)
        logpi_next = jax.nn.log_softmax(logits_next, axis=-1)
        q_next = self.critic.apply(ts.target_critic_params, term["obs_next"]).min(
            axis=0
        )
        v_next = (pi_next * (q_next - alpha * logpi_next)).sum(axis=-1)
        target = jax.lax.stop_gradient(
            nstep_return(rew_chain, done_chain, v_next * mask, self.gamma)
        )

        act_idx = batch["act"].astype(jnp.int32)

        def critic_loss_fn(cp):
            q_all = self.critic.apply(cp, batch["obs"])  # [K, B, A]
            q = jnp.take_along_axis(
                q_all, act_idx[None, :, None], axis=-1
            ).squeeze(-1)
            td = q - target[None, :]
            return (weight[None, :] * td**2).mean(), jnp.abs(td).mean(axis=0)

        (closs, td_abs), grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            ts.critic_params
        )
        bstate = buffer.update_priorities(bstate, env_idx, pos, td_abs)
        updates, c_opt = self.critic_optim.update(
            grads, ts.critic_opt_state, ts.critic_params
        )
        critic_params = optax.apply_updates(ts.critic_params, updates)

        def actor_loss_fn(ap):
            logits = self.actor.apply(ap, batch["obs"])
            pi = jax.nn.softmax(logits, axis=-1)
            logpi = jax.nn.log_softmax(logits, axis=-1)
            q = self.critic.apply(critic_params, batch["obs"]).min(axis=0)
            entropy = -(pi * logpi).sum(axis=-1)
            loss = -(
                (pi * jax.lax.stop_gradient(q)).sum(axis=-1) + alpha * entropy
            ).mean()
            return loss, entropy

        (aloss, entropy), grads = jax.value_and_grad(actor_loss_fn, has_aux=True)(
            ts.actor_params
        )
        updates, a_opt = self.actor_optim.update(
            grads, ts.actor_opt_state, ts.actor_params
        )
        actor_params = optax.apply_updates(ts.actor_params, updates)

        log_alpha, al_opt, alpha_loss = ts.log_alpha, ts.alpha_opt_state, jnp.zeros(())
        if self.auto_alpha:

            def alpha_loss_fn(la):
                return (
                    la * jax.lax.stop_gradient(entropy - self.target_entropy)
                ).mean()

            alpha_loss, agrad = jax.value_and_grad(alpha_loss_fn)(ts.log_alpha)
            aupd, al_opt = self.alpha_optim.update(agrad, ts.alpha_opt_state)
            log_alpha = optax.apply_updates(ts.log_alpha, aupd)

        ts = ts.replace(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=polyak_update(
                ts.target_critic_params, critic_params, self.tau
            ),
            actor_opt_state=a_opt,
            critic_opt_state=c_opt,
            log_alpha=log_alpha,
            alpha_opt_state=al_opt,
            step=ts.step + 1,
        )
        return ts, bstate, {
            "critic_loss": closs,
            "actor_loss": aloss,
            "alpha": jnp.exp(log_alpha),
            "alpha_loss": alpha_loss,
        }

    def priority_scores(self, ts, sampled, key=None):
        """Mean-over-critics |TD| against the expectation-based soft
        target under ``ts`` (deterministic; ``key`` unused)."""
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        alpha = jnp.exp(ts.log_alpha)
        logits_next = self.actor.apply(ts.actor_params, term["obs_next"])
        pi_next = jax.nn.softmax(logits_next, axis=-1)
        logpi_next = jax.nn.log_softmax(logits_next, axis=-1)
        q_next = self.critic.apply(ts.target_critic_params, term["obs_next"]).min(
            axis=0
        )
        v_next = (pi_next * (q_next - alpha * logpi_next)).sum(axis=-1)
        target = nstep_return(rew_chain, done_chain, v_next * mask, self.gamma)
        act_idx = batch["act"].astype(jnp.int32)
        q_all = self.critic.apply(ts.critic_params, batch["obs"])
        q = jnp.take_along_axis(q_all, act_idx[None, :, None], axis=-1).squeeze(-1)
        return jnp.abs(q - target[None, :]).mean(axis=0)
