"""Offline RL algorithms: BC, TD3+BC, BCQ, CQL and the discrete variants.

TPU-native counterparts of ``tianshou/policy/imitation/``:
- ``base.py:34``  ``ImitationPolicy``      -> :class:`BC`
- ``td3_bc.py:24`` ``TD3BCPolicy``         -> :class:`TD3BC`
- ``bcq.py:30``   ``BCQPolicy``            -> :class:`BCQ`
- ``cql.py:33``   ``CQLPolicy``            -> :class:`CQL`
- ``discrete_bcq.py:34`` ``DiscreteBCQPolicy`` -> :class:`DiscreteBCQ`
- ``discrete_cql.py:25`` ``DiscreteCQLPolicy`` -> :class:`DiscreteCQL`
- ``discrete_crr.py:27`` ``DiscreteCRRPolicy`` -> :class:`DiscreteCRR`

All consume a static replay buffer through the same ``update`` interface as
the off-policy algorithms, so the OfflineTrainer is just "updates without
collect" (reference ``OfflineTrainer`` ``trainer/base.py:586-605``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from tianshou_tpu.algos.base import Algorithm, TrainState, polyak_update
from tianshou_tpu.algos.ddpg import ACTrainState, TD3
from tianshou_tpu.algos.qrdqn import QRDQN, quantile_huber_loss
from tianshou_tpu.algos.sac import SAC
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.envs.spaces import Box, Discrete
from tianshou_tpu.ops.dist import categorical_log_prob, categorical_sample

__all__ = [
    "BC",
    "TD3BC",
    "BCQ",
    "CQL",
    "DiscreteBCQ",
    "DiscreteCQL",
    "DiscreteCRR",
]


class BC(Algorithm):
    """Behavior cloning (reference ``ImitationPolicy``): MSE for continuous
    actions, cross-entropy for discrete."""

    def __init__(self, actor: nn.Module, action_space, *, lr: float = 1e-3):
        self.actor = actor
        self.action_space = action_space
        self.discrete = isinstance(action_space, Discrete)
        self.optimizer = optax.adam(lr)

    def init(self, key, obs_example):
        obs = jnp.asarray(obs_example)[None]
        params = self.actor.init(key, obs)
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def act(self, ts, obs, key, explore, explore_param=0.0):
        out = self.actor.apply(ts.params, obs)
        if self.discrete:
            return jnp.argmax(out, axis=-1).astype(jnp.int32), Batch()
        return out, Batch()

    def update(self, ts, buffer, bstate, key, batch_size):
        env_idx, pos, _ = buffer.sample_with_weights(bstate, key, batch_size)
        batch = buffer.get(bstate, env_idx, pos, keys=("obs", "act"))

        def loss_fn(params):
            out = self.actor.apply(params, batch["obs"])
            if self.discrete:
                return -categorical_log_prob(
                    batch["act"].astype(jnp.int32), out
                ).mean()
            return ((out - batch["act"]) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(ts.params)
        updates, opt_state = self.optimizer.update(grads, ts.opt_state, ts.params)
        ts = ts.replace(
            params=optax.apply_updates(ts.params, updates),
            opt_state=opt_state,
            step=ts.step + 1,
        )
        return ts, bstate, {"loss": loss}


class TD3BC(TD3):
    """TD3 + behavior-cloning regularizer (reference ``td3_bc.py:24``):
    ``actor_loss = -lambda * Q + MSE(pi(s), a_data)`` with
    ``lambda = alpha / mean|Q|``."""

    def __init__(self, *args, bc_alpha: float = 2.5, **kwargs):
        super().__init__(*args, **kwargs)
        self.bc_alpha = bc_alpha

    def _actor_loss(self, ts, actor_params, batch):
        obs, act_data = batch["obs"], batch["act"]
        a = self.actor.apply(actor_params, obs)
        q = self.critic.apply(ts.critic_params, obs, a)[0]
        lmbda = self.bc_alpha / jax.lax.stop_gradient(jnp.abs(q).mean() + 1e-8)
        return -lmbda * q.mean() + ((a - act_data) ** 2).mean()


@struct.dataclass
class BCQTrainState(ACTrainState):
    vae_params: Any = None
    vae_opt_state: Any = None


class BCQ(Algorithm):
    """Continuous BCQ (reference ``bcq.py:30``): VAE behavior model +
    perturbation actor + weighted twin-critic target."""

    def __init__(
        self,
        perturbation: nn.Module,  # (obs, act) -> act
        critic: nn.Module,  # CriticEnsemble K=2
        vae: nn.Module,  # VAE
        action_space: Box,
        *,
        actor_lr: float = 1e-3,
        critic_lr: float = 1e-3,
        vae_lr: float = 1e-3,
        gamma: float = 0.99,
        tau: float = 0.005,
        lmbda: float = 0.75,
        num_sampled_action: int = 10,
    ):
        self.actor = perturbation
        self.critic = critic
        self.vae = vae
        self.action_space = action_space
        self.actor_optim = optax.adam(actor_lr)
        self.critic_optim = optax.adam(critic_lr)
        self.vae_optim = optax.adam(vae_lr)
        self.gamma = gamma
        self.tau = tau
        self.lmbda = lmbda
        self.num_sampled_action = num_sampled_action

    def init(self, key, obs_example):
        obs = jnp.asarray(obs_example)[None]
        k_a, k_c, k_v, k_vr = jax.random.split(key, 4)
        act_dim = self.action_space.shape[0]
        act = jnp.zeros((1, act_dim), jnp.float32)
        actor_params = self.actor.init(k_a, obs, act)
        critic_params = self.critic.init(k_c, obs, act)
        vae_params = self.vae.init(k_v, obs, act, k_vr)
        return BCQTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=actor_params,
            target_critic_params=critic_params,
            actor_opt_state=self.actor_optim.init(actor_params),
            critic_opt_state=self.critic_optim.init(critic_params),
            step=jnp.zeros((), jnp.int32),
            vae_params=vae_params,
            vae_opt_state=self.vae_optim.init(vae_params),
        )

    def _candidates(self, ts, params_actor, obs, key, n):
        """Sample n candidate actions per obs: VAE decode + perturb."""
        B = obs.shape[0]
        obs_rep = jnp.repeat(obs, n, axis=0)
        decoded = self.vae.apply(
            ts.vae_params, obs_rep, key=key, method="decode"
        )
        perturbed = self.actor.apply(params_actor, obs_rep, decoded)
        return obs_rep, perturbed  # [B*n, ...]

    def act(self, ts, obs, key, explore, explore_param=0.0):
        B = obs.shape[0]
        n = self.num_sampled_action
        obs_rep, cand = self._candidates(ts, ts.actor_params, obs, key, n)
        q = self.critic.apply(ts.critic_params, obs_rep, cand)[0]  # [B*n]
        best = jnp.argmax(q.reshape(B, n), axis=-1)
        cand = cand.reshape(B, n, -1)
        return jnp.take_along_axis(cand, best[:, None, None], axis=1).squeeze(1), Batch()

    def update(self, ts, buffer, bstate, key, batch_size):
        k_s, k_v, k_t, k_a = jax.random.split(key, 4)
        env_idx, pos, _ = buffer.sample_with_weights(bstate, k_s, batch_size)
        batch = buffer.get(
            bstate, env_idx, pos,
            keys=("obs", "act", "rew", "obs_next", "terminated", "truncated"),
        )
        obs, act = batch["obs"], batch["act"]

        # 1. VAE reconstruction + KL
        def vae_loss_fn(vp):
            recon, mean, log_std = self.vae.apply(vp, obs, act, k_v)
            recon_loss = ((recon - act) ** 2).mean()
            kl = (
                -0.5
                * (1 + 2 * log_std - mean**2 - jnp.exp(2 * log_std)).mean()
            )
            return recon_loss + 0.5 * kl

        vloss, vgrads = jax.value_and_grad(vae_loss_fn)(ts.vae_params)
        vupd, v_opt = self.vae_optim.update(vgrads, ts.vae_opt_state)
        ts = ts.replace(
            vae_params=optax.apply_updates(ts.vae_params, vupd),
            vae_opt_state=v_opt,
        )

        # 2. critic: weighted min/max over sampled target actions
        obs_next = batch["obs_next"]
        obs_rep, cand = self._candidates(
            ts, ts.target_actor_params, obs_next, k_t, self.num_sampled_action
        )
        q_t = self.critic.apply(ts.target_critic_params, obs_rep, cand)  # [2, B*n]
        q_mix = self.lmbda * q_t.min(axis=0) + (1 - self.lmbda) * q_t.max(axis=0)
        q_next = q_mix.reshape(batch_size, self.num_sampled_action).max(axis=-1)
        mask = 1.0 - batch["terminated"].astype(jnp.float32)
        target = jax.lax.stop_gradient(
            batch["rew"] + self.gamma * mask * q_next
        )

        def critic_loss_fn(cp):
            q = self.critic.apply(cp, obs, act)
            return ((q - target[None, :]) ** 2).mean()

        closs, cgrads = jax.value_and_grad(critic_loss_fn)(ts.critic_params)
        cupd, c_opt = self.critic_optim.update(
            cgrads, ts.critic_opt_state, ts.critic_params
        )
        critic_params = optax.apply_updates(ts.critic_params, cupd)

        # 3. perturbation actor: maximize Q1 of perturbed VAE actions
        decoded = jax.lax.stop_gradient(
            self.vae.apply(ts.vae_params, obs, key=k_a, method="decode")
        )

        def actor_loss_fn(ap):
            a = self.actor.apply(ap, obs, decoded)
            return -self.critic.apply(critic_params, obs, a)[0].mean()

        aloss, agrads = jax.value_and_grad(actor_loss_fn)(ts.actor_params)
        aupd, a_opt = self.actor_optim.update(
            agrads, ts.actor_opt_state, ts.actor_params
        )
        actor_params = optax.apply_updates(ts.actor_params, aupd)

        ts = ts.replace(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt_state=a_opt,
            critic_opt_state=c_opt,
            target_actor_params=polyak_update(
                ts.target_actor_params, actor_params, self.tau
            ),
            target_critic_params=polyak_update(
                ts.target_critic_params, critic_params, self.tau
            ),
            step=ts.step + 1,
        )
        return ts, bstate, {
            "vae_loss": vloss, "critic_loss": closs, "actor_loss": aloss
        }


class CQL(SAC):
    """Conservative Q-learning on top of SAC (reference ``cql.py:33``):
    logsumexp penalty over random/policy/next-policy actions minus the
    dataset Q, scaled by ``cql_weight``.

    ``with_lagrange`` enables CQL(Lagrange) (``cql.py:98-103,361-373``):
    the penalty scale becomes a learned dual variable
    ``clip(exp(cql_log_alpha), alpha_min, alpha_max)`` applied per critic
    to ``penalty_k - lagrange_threshold`` and trained to MAXIMIZE the
    scaled penalties (gradient ascent on the dual).  Defaults on, matching
    the reference (``cql.py:98``); pass ``with_lagrange=False`` for plain
    CQL."""

    def __init__(
        self,
        *args,
        cql_weight: float = 1.0,
        temperature: float = 1.0,
        num_repeat_actions: int = 10,
        with_lagrange: bool = True,
        lagrange_threshold: float = 10.0,
        cql_alpha_lr: float = 1e-4,
        alpha_min: float = 0.0,
        alpha_max: float = 1e6,
        calibrated: bool = False,
        **kwargs,
    ):
        kwargs.setdefault("n_step", 1)
        super().__init__(*args, **kwargs)
        self.cql_weight = cql_weight
        self.temperature = temperature
        self.num_repeat_actions = num_repeat_actions
        self.with_lagrange = with_lagrange
        self.lagrange_threshold = lagrange_threshold
        self.cql_alpha_optim = optax.adam(cql_alpha_lr)
        self.alpha_min = alpha_min
        self.alpha_max = alpha_max
        # CalQL (arXiv:2303.05479; reference cql.py:106,323-338): clamp the
        # OOD Q-values in the penalty at the transition's Monte-Carlo
        # return, precomputed over the dataset by prepare_offline
        self.calibrated = calibrated

    def prepare_offline(self, buffer, bstate):
        """Precompute per-transition Monte-Carlo returns (reward-to-go with
        zero bootstrap) into ``storage['calibration_return']`` — the
        reference's ``process_buffer`` CalQL hook (``cql.py:214-233``)."""
        if not self.calibrated:
            return bstate
        from tianshou_tpu.ops.returns import discounted_returns

        chron = buffer.chronological(bstate)  # [T, N, ...]
        done = chron["terminated"] | chron["truncated"]
        rets = discounted_returns(
            chron["rew"], jnp.zeros_like(chron["rew"]),
            chron["terminated"], done, self.gamma,
        )  # [T, N] in age order
        # scatter back to ring positions: slot (cursor + t) % capacity
        T, N = rets.shape
        pos = (bstate.cursor[None, :] + jnp.arange(T)[:, None]) % T  # [T, N]
        env = jnp.broadcast_to(jnp.arange(N)[None, :], pos.shape)
        cal = jnp.zeros((N, T), rets.dtype).at[env, pos].set(rets)
        storage = Batch(bstate.storage)
        storage["calibration_return"] = cal
        return bstate.replace(storage=storage)

    def init(self, key, obs_example):
        ts = super().init(key, obs_example)
        if self.with_lagrange:
            la = jnp.zeros((), jnp.float32)
            ts = ts.replace(
                cql_log_alpha=la,
                cql_alpha_opt_state=self.cql_alpha_optim.init(la),
            )
        return ts

    def update(self, ts, buffer, bstate, key, batch_size):
        k_s, k_pi, k_tgt, k_cur, k_nxt, k_rand = jax.random.split(key, 6)
        env_idx, pos, _ = buffer.sample_with_weights(bstate, k_s, batch_size)
        batch = buffer.get(
            bstate, env_idx, pos,
            keys=("obs", "act", "rew", "obs_next", "terminated", "truncated"),
        )
        obs, act, obs_next = batch["obs"], batch["act"], batch["obs_next"]
        done = (batch["terminated"] | batch["truncated"]).astype(jnp.float32)
        alpha = jnp.exp(ts.log_alpha)
        n_rep = self.num_repeat_actions
        act_dim = self.action_space.shape[0]

        # actor + alpha update (SAC-style, cql.py:255-276)
        def actor_loss_fn(ap):
            a, logp = self._sample_with_log_prob(ap, obs, k_pi)
            q = self.critic.apply(ts.critic_params, obs, a).min(axis=0)
            return (alpha * logp - q).mean(), logp

        (aloss, logp), agrads = jax.value_and_grad(actor_loss_fn, has_aux=True)(
            ts.actor_params
        )
        aupd, a_opt = self.actor_optim.update(
            agrads, ts.actor_opt_state, ts.actor_params
        )
        actor_params = optax.apply_updates(ts.actor_params, aupd)

        log_alpha, al_opt = ts.log_alpha, ts.alpha_opt_state
        if self.auto_alpha:

            def alpha_loss_fn(la):
                return -(
                    la * jax.lax.stop_gradient(logp + self.target_entropy)
                ).mean()

            _, agrad = jax.value_and_grad(alpha_loss_fn)(ts.log_alpha)
            aupd2, al_opt = self.alpha_optim.update(agrad, ts.alpha_opt_state)
            log_alpha = optax.apply_updates(ts.log_alpha, aupd2)

        # target Q (1-step, cql.py:278-292)
        a_next, logp_next = self._sample_with_log_prob(
            actor_params, obs_next, k_tgt
        )
        q_next = self.critic.apply(
            ts.target_critic_params, obs_next, a_next
        ).min(axis=0)
        target = jax.lax.stop_gradient(
            batch["rew"] + self.gamma * (1 - done) * (q_next - alpha * logp_next)
        )

        # conservative penalty inputs (cql.py:294-345)
        obs_rep = jnp.repeat(obs, n_rep, axis=0)
        obs_next_rep = jnp.repeat(obs_next, n_rep, axis=0)
        a_cur, logp_cur = self._sample_with_log_prob(actor_params, obs_rep, k_cur)
        a_nxt, logp_nxt = self._sample_with_log_prob(
            actor_params, obs_next_rep, k_nxt
        )
        a_rand = jax.random.uniform(
            k_rand, (batch_size * n_rep, act_dim), minval=-1.0, maxval=1.0
        )
        logp_rand = jnp.log(0.5**act_dim)
        a_cur, logp_cur = jax.lax.stop_gradient((a_cur, logp_cur))
        a_nxt, logp_nxt = jax.lax.stop_gradient((a_nxt, logp_nxt))
        cal_ret = None
        if self.calibrated:
            # [B] MC return of each sampled transition, repeated per action
            cal_ret = jnp.repeat(
                bstate.storage["calibration_return"][env_idx, pos], n_rep
            )[None, :]  # [1, B*n_rep] broadcasting over the critic axis

        # CQL(Lagrange): penalties scaled by the (constant-for-this-grad)
        # clamped dual; the dual itself is updated below by ascent
        cql_alpha = jnp.float32(1.0)
        if self.with_lagrange:
            cql_alpha = jax.lax.stop_gradient(
                jnp.clip(
                    jnp.exp(ts.cql_log_alpha), self.alpha_min, self.alpha_max
                )
            )

        def critic_loss_fn(cp):
            q_data = self.critic.apply(cp, obs, act)  # [2, B]
            td_loss = ((q_data - target[None, :]) ** 2).mean()
            q_cur = self.critic.apply(cp, obs_rep, a_cur)
            q_nxt = self.critic.apply(cp, obs_rep, a_nxt)
            q_rand = self.critic.apply(cp, obs_rep, a_rand)
            if cal_ret is not None:
                # CalQL: OOD values are floored at the MC return BEFORE the
                # importance correction (cql.py:323-338)
                q_cur = jnp.maximum(q_cur, cal_ret)
                q_nxt = jnp.maximum(q_nxt, cal_ret)
                q_rand = jnp.maximum(q_rand, cal_ret)
            q_cur = q_cur - logp_cur[None, :]
            q_nxt = q_nxt - logp_nxt[None, :]
            q_rand = q_rand - logp_rand
            cat = jnp.concatenate(
                [
                    q_rand.reshape(2, batch_size, n_rep),
                    q_cur.reshape(2, batch_size, n_rep),
                    q_nxt.reshape(2, batch_size, n_rep),
                ],
                axis=-1,
            )  # [2, B, 3n]
            lse = jax.scipy.special.logsumexp(
                cat / self.temperature, axis=-1
            )  # [2, B]
            # per-critic raw penalties (reference cql1/2_scaled_loss)
            raw = (
                lse.mean(axis=-1) * self.cql_weight * self.temperature
                - q_data.mean(axis=-1) * self.cql_weight
            )  # [2]
            if self.with_lagrange:
                # reference sums the per-critic scaled penalties
                penalty = (
                    cql_alpha * (raw - self.lagrange_threshold)
                ).sum()
            else:
                # plain CQL: mean over the critic axis (exactly the
                # round-1 benchmarked loss)
                penalty = raw.mean()
            return td_loss + penalty, (td_loss, penalty, raw)

        (closs, (td_loss, penalty, raw_pen)), cgrads = jax.value_and_grad(
            critic_loss_fn, has_aux=True
        )(ts.critic_params)
        cupd, c_opt = self.critic_optim.update(
            cgrads, ts.critic_opt_state, ts.critic_params
        )
        critic_params = optax.apply_updates(ts.critic_params, cupd)

        cql_log_alpha = ts.cql_log_alpha
        cql_alpha_opt_state = ts.cql_alpha_opt_state
        if self.with_lagrange:
            raw_const = jax.lax.stop_gradient(raw_pen)

            def dual_loss_fn(la):
                a = jnp.clip(jnp.exp(la), self.alpha_min, self.alpha_max)
                return -0.5 * (
                    a * (raw_const - self.lagrange_threshold)
                ).sum()

            _, dgrad = jax.value_and_grad(dual_loss_fn)(ts.cql_log_alpha)
            dupd, cql_alpha_opt_state = self.cql_alpha_optim.update(
                dgrad, ts.cql_alpha_opt_state
            )
            cql_log_alpha = optax.apply_updates(ts.cql_log_alpha, dupd)

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
            cql_log_alpha=cql_log_alpha,
            cql_alpha_opt_state=cql_alpha_opt_state,
            step=ts.step + 1,
        )
        metrics = {
            "critic_loss": closs,
            "td_loss": td_loss,
            "cql_penalty": penalty,
            "actor_loss": aloss,
            "alpha": jnp.exp(log_alpha),
        }
        if self.with_lagrange:
            metrics["cql_alpha"] = jnp.clip(
                jnp.exp(cql_log_alpha), self.alpha_min, self.alpha_max
            )
        return ts, bstate, metrics


@struct.dataclass
class DiscreteBCQTrainState(TrainState):
    imitation_params: Any = None


class DiscreteBCQ(Algorithm):
    """Discrete BCQ (reference ``discrete_bcq.py:34``): Q-learning with
    actions masked to those the imitation model deems likely
    (``unlikely_action_threshold``, ``discrete_bcq.py:120-149``)."""

    def __init__(
        self,
        q_network: nn.Module,
        imitation_network: nn.Module,
        action_space: Discrete,
        *,
        lr: float = 1e-3,
        gamma: float = 0.99,
        target_update_freq: int = 8000,
        unlikely_action_threshold: float = 0.3,
        imitation_logits_penalty: float = 1e-2,
    ):
        self.q_network = q_network
        self.imitation_network = imitation_network
        self.action_space = action_space
        self.optimizer = optax.adam(lr)
        self.gamma = gamma
        self.target_update_freq = target_update_freq
        self.log_tau = jnp.log(unlikely_action_threshold)
        self.reg_weight = imitation_logits_penalty

    def init(self, key, obs_example):
        obs = jnp.asarray(obs_example)[None]
        k_q, k_i = jax.random.split(key)
        params = {
            "q": self.q_network.init(k_q, obs),
            "imitation": self.imitation_network.init(k_i, obs),
        }
        return TrainState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def _masked_greedy(self, params, obs):
        q = self.q_network.apply(params["q"], obs)
        logits = self.imitation_network.apply(params["imitation"], obs)
        log_ratio = jax.nn.log_softmax(logits, axis=-1) - jax.nn.log_softmax(
            logits, axis=-1
        ).max(axis=-1, keepdims=True)
        mask = log_ratio > self.log_tau
        q_masked = jnp.where(mask, q, -jnp.inf)
        return jnp.argmax(q_masked, axis=-1).astype(jnp.int32), q, logits

    def act(self, ts, obs, key, explore, explore_param=0.0):
        a, _, _ = self._masked_greedy(ts.params, obs)
        if not explore:
            return a, Batch()
        k1, k2 = jax.random.split(key)
        rand = jax.random.randint(k1, a.shape, 0, self.action_space.n)
        take = jax.random.uniform(k2, a.shape) < explore_param
        return jnp.where(take, rand, a).astype(jnp.int32), Batch()

    def update(self, ts, buffer, bstate, key, batch_size):
        env_idx, pos, _ = buffer.sample_with_weights(bstate, key, batch_size)
        batch = buffer.get(
            bstate, env_idx, pos,
            keys=("obs", "act", "rew", "obs_next", "terminated", "truncated"),
        )
        act = batch["act"].astype(jnp.int32)
        done = (batch["terminated"] | batch["truncated"]).astype(jnp.float32)
        mask = 1.0 - batch["terminated"].astype(jnp.float32)

        a_next, _, _ = self._masked_greedy(ts.params, batch["obs_next"])
        q_t = self.q_network.apply(ts.target_params["q"], batch["obs_next"])
        q_next = jnp.take_along_axis(q_t, a_next[:, None], axis=-1).squeeze(-1)
        target = jax.lax.stop_gradient(
            batch["rew"] + self.gamma * mask * q_next
        )

        def loss_fn(params):
            q = self.q_network.apply(params["q"], batch["obs"])
            q_a = jnp.take_along_axis(q, act[:, None], axis=-1).squeeze(-1)
            q_loss = ((q_a - target) ** 2).mean()
            logits = self.imitation_network.apply(params["imitation"], batch["obs"])
            i_loss = -categorical_log_prob(act, logits).mean()
            reg = (logits**2).mean()
            return q_loss + i_loss + self.reg_weight * reg, (q_loss, i_loss)

        (loss, (q_loss, i_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params)
        updates, opt_state = self.optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        step = ts.step + 1
        sync = (step % self.target_update_freq) == 0
        target_params = jax.tree.map(
            lambda t, o: jnp.where(sync, o, t), ts.target_params, params
        )
        ts = ts.replace(
            params=params, target_params=target_params, opt_state=opt_state, step=step
        )
        return ts, bstate, {"loss": loss, "q_loss": q_loss, "imitation_loss": i_loss}


class DiscreteCQL(QRDQN):
    """QRDQN + CQL penalty (reference ``discrete_cql.py:25``):
    ``min_q_weight * (logsumexp_a Q(s,a) - Q(s, a_data))``."""

    def __init__(self, *args, min_q_weight: float = 10.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.min_q_weight = min_q_weight

    def update(self, ts, buffer, bstate, key, batch_size):
        k_s, _ = jax.random.split(key)
        env_idx, pos, weight, batch, term, mask, returns, discount = (
            self._sample_batch(buffer, bstate, k_s, batch_size)
        )
        theta_t = self.quantiles(ts.target_params, term["obs_next"])
        a_star = jnp.argmax(theta_t.mean(axis=-1), axis=-1)
        theta_star = jnp.take_along_axis(
            theta_t, a_star[:, None, None], axis=1
        ).squeeze(1)
        target = jax.lax.stop_gradient(
            returns[:, None] + (discount * mask)[:, None] * theta_star
        )
        tau_hats = jnp.broadcast_to(self.tau_hats, (batch_size, self.num_quantiles))
        act = batch["act"].astype(jnp.int32)

        def loss_fn(params):
            theta = self.quantiles(params, batch["obs"])  # [B, A, K]
            theta_a = jnp.take_along_axis(
                theta, act[:, None, None], axis=1
            ).squeeze(1)
            per_sample, td_abs = quantile_huber_loss(theta_a, target, tau_hats)
            qr_loss = (weight * per_sample).mean()
            q_mean = theta.mean(axis=-1)  # [B, A]
            cql = (
                jax.scipy.special.logsumexp(q_mean, axis=-1)
                - jnp.take_along_axis(q_mean, act[:, None], axis=-1).squeeze(-1)
            ).mean()
            return qr_loss + self.min_q_weight * cql, (qr_loss, cql, td_abs)

        (loss, (qr_loss, cql, td_abs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params)
        bstate = buffer.update_priorities(bstate, env_idx, pos, td_abs)
        ts = self._finish_update(ts, (loss, grads))
        return ts, bstate, {"loss": loss, "qr_loss": qr_loss, "cql_loss": cql}


class DiscreteCRR(Algorithm):
    """Critic-regularized regression (reference ``discrete_crr.py:27``):
    advantage-weighted imitation with exp or binary weights."""

    def __init__(
        self,
        actor: nn.Module,  # obs -> logits
        critic: nn.Module,  # obs -> [B, A]
        action_space: Discrete,
        *,
        lr: float = 1e-3,
        gamma: float = 0.99,
        policy_improvement_mode: str = "exp",
        ratio_upper_bound: float = 20.0,
        beta: float = 1.0,
        min_q_weight: float = 10.0,
        target_update_freq: int = 500,
    ):
        assert policy_improvement_mode in ("exp", "binary", "all")
        self.actor = actor
        self.critic = critic
        self.action_space = action_space
        self.optimizer = optax.adam(lr)
        self.gamma = gamma
        self.mode = policy_improvement_mode
        self.ratio_upper_bound = ratio_upper_bound
        self.beta = beta
        self.min_q_weight = min_q_weight
        self.target_update_freq = target_update_freq

    def init(self, key, obs_example):
        obs = jnp.asarray(obs_example)[None]
        k_a, k_c = jax.random.split(key)
        params = {
            "actor": self.actor.init(k_a, obs),
            "critic": self.critic.init(k_c, obs),
        }
        return TrainState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def act(self, ts, obs, key, explore, explore_param=0.0):
        logits = self.actor.apply(ts.params["actor"], obs)
        if explore:
            return categorical_sample(key, logits), Batch()
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), Batch()

    def update(self, ts, buffer, bstate, key, batch_size):
        env_idx, pos, _ = buffer.sample_with_weights(bstate, key, batch_size)
        batch = buffer.get(
            bstate, env_idx, pos,
            keys=("obs", "act", "rew", "obs_next", "terminated", "truncated"),
        )
        act = batch["act"].astype(jnp.int32)
        mask = 1.0 - batch["terminated"].astype(jnp.float32)

        # target: E_{pi_target}[Q_target(s', .)] (discrete_crr.py:107+)
        q_t = self.critic.apply(ts.target_params["critic"], batch["obs_next"])
        logits_t = self.actor.apply(ts.target_params["actor"], batch["obs_next"])
        pi_t = jax.nn.softmax(logits_t, axis=-1)
        v_next = (pi_t * q_t).sum(axis=-1)
        target = jax.lax.stop_gradient(
            batch["rew"] + self.gamma * mask * v_next
        )

        def loss_fn(params):
            q = self.critic.apply(params["critic"], batch["obs"])  # [B, A]
            q_a = jnp.take_along_axis(q, act[:, None], axis=-1).squeeze(-1)
            critic_loss = ((q_a - target) ** 2).mean()
            logits = self.actor.apply(params["actor"], batch["obs"])
            pi = jax.nn.softmax(logits, axis=-1)
            adv = q_a - (pi * q).sum(axis=-1)
            adv = jax.lax.stop_gradient(adv)
            if self.mode == "exp":
                w = jnp.clip(jnp.exp(adv / self.beta), 0, self.ratio_upper_bound)
            elif self.mode == "binary":
                w = (adv > 0).astype(jnp.float32)
            else:
                w = jnp.ones_like(adv)
            logp = categorical_log_prob(act, logits)
            actor_loss = -(w * logp).mean()
            cql = (
                jax.scipy.special.logsumexp(q, axis=-1) - q_a
            ).mean()
            return (
                actor_loss + critic_loss + self.min_q_weight * cql,
                (actor_loss, critic_loss),
            )

        (loss, (aloss, closs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params
        )
        updates, opt_state = self.optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        step = ts.step + 1
        sync = (step % self.target_update_freq) == 0
        target_params = jax.tree.map(
            lambda t, o: jnp.where(sync, o, t), ts.target_params, params
        )
        ts = ts.replace(
            params=params, target_params=target_params, opt_state=opt_state, step=step
        )
        return ts, bstate, {"loss": loss, "actor_loss": aloss, "critic_loss": closs}
