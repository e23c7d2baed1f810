"""REDQ: randomized ensemble double Q-learning (arXiv 2101.05982).

TPU-native counterpart of ``tianshou/policy/modelfree/redq.py:29``
(``REDQPolicy``): an N-critic ensemble (one batched matmul via
``CriticEnsemble``), targets from the min over a random M-subset
(``redq.py:177-193``), delayed actor updates (``redq.py:195+``), and
SAC-style entropy regularization with auto-alpha.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algos.ddpg import ACTrainState, polyak_update
from tianshou_tpu.algos.sac import SAC
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.ops.returns import nstep_return

__all__ = ["REDQ"]


class REDQ(SAC):
    def __init__(
        self,
        *args,
        ensemble_size: int = 10,
        subset_size: int = 2,
        actor_delay: int = 20,
        target_mode: str = "min",
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        assert 0 < subset_size <= ensemble_size
        assert target_mode in ("min", "mean")
        self.ensemble_size = ensemble_size
        self.subset_size = subset_size
        self.actor_delay = actor_delay
        self.target_mode = target_mode

    supports_presampled = True

    def update_sampled(
        self,
        ts: ACTrainState,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        sampled: tuple,
        key: jax.Array,
    ):
        k_tgt, k_pi, k_sub = jax.random.split(key, 3)
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        alpha = jnp.exp(ts.log_alpha)

        # random critic subset for the target (redq.py:177-193)
        a_next, logp_next = self._sample_with_log_prob(
            ts.actor_params, term["obs_next"], k_tgt
        )
        q_all = self.critic.apply(
            ts.target_critic_params, term["obs_next"], a_next
        )  # [N, B]
        subset = jax.random.permutation(k_sub, self.ensemble_size)[
            : self.subset_size
        ]
        q_sub = q_all[subset]  # [M, B]
        q_next = (
            q_sub.min(axis=0) if self.target_mode == "min" else q_sub.mean(axis=0)
        )
        q_term = (q_next - alpha * logp_next) * mask
        target = jax.lax.stop_gradient(
            nstep_return(rew_chain, done_chain, q_term, self.gamma)
        )

        def critic_loss_fn(cp):
            q = self.critic.apply(cp, batch["obs"], batch["act"])  # [N, B]
            td = q - target[None, :]
            return (weight[None, :] * td**2).mean(), jnp.abs(td).mean(axis=0)

        (closs, td_abs), grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            ts.critic_params
        )
        bstate = buffer.update_priorities(bstate, env_idx, pos, td_abs)
        upd, c_opt = self.critic_optim.update(
            grads, ts.critic_opt_state, ts.critic_params
        )
        critic_params = optax.apply_updates(ts.critic_params, upd)
        step = ts.step + 1

        # delayed actor + alpha update (redq.py:195+)
        def do_actor(carry):
            actor_params, a_opt, log_alpha, al_opt = carry

            def actor_loss_fn(ap):
                a, logp = self._sample_with_log_prob(ap, batch["obs"], k_pi)
                q = self.critic.apply(critic_params, batch["obs"], a).mean(axis=0)
                return (alpha * logp - q).mean(), logp

            (aloss, logp), agrads = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(actor_params)
            au, a_opt = self.actor_optim.update(agrads, a_opt, actor_params)
            actor_params = optax.apply_updates(actor_params, au)
            if self.auto_alpha:

                def alpha_loss_fn(la):
                    return -(
                        la * jax.lax.stop_gradient(logp + self.target_entropy)
                    ).mean()

                _, agrad = jax.value_and_grad(alpha_loss_fn)(log_alpha)
                alu, al_opt = self.alpha_optim.update(agrad, al_opt)
                log_alpha = optax.apply_updates(log_alpha, alu)
            return actor_params, a_opt, log_alpha, al_opt

        carry = (ts.actor_params, ts.actor_opt_state, ts.log_alpha, ts.alpha_opt_state)
        actor_params, a_opt, log_alpha, al_opt = jax.lax.cond(
            step % self.actor_delay == 0, do_actor, lambda c: c, carry
        )

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
            step=step,
        )
        return ts, bstate, {
            "critic_loss": closs, "alpha": jnp.exp(log_alpha)
        }

    def priority_scores(self, ts, sampled, key=None):
        """Mean-over-ensemble |TD| against the random-subset target under
        ``ts``; with the update's ``key`` the next-action sample and the
        critic subset mirror the update's splits exactly."""
        if key is None:
            key = jax.random.key(0)
        k_tgt, _, k_sub = jax.random.split(key, 3)  # mirror update_sampled
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        alpha = jnp.exp(ts.log_alpha)
        a_next, logp_next = self._sample_with_log_prob(
            ts.actor_params, term["obs_next"], k_tgt
        )
        q_all = self.critic.apply(ts.target_critic_params, term["obs_next"], a_next)
        subset = jax.random.permutation(k_sub, self.ensemble_size)[
            : self.subset_size
        ]
        q_sub = q_all[subset]
        q_next = (
            q_sub.min(axis=0) if self.target_mode == "min" else q_sub.mean(axis=0)
        )
        q_term = (q_next - alpha * logp_next) * mask
        target = nstep_return(rew_chain, done_chain, q_term, self.gamma)
        q = self.critic.apply(ts.critic_params, batch["obs"], batch["act"])
        return jnp.abs(q - target[None, :]).mean(axis=0)
