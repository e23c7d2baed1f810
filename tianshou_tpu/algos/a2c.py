"""A2C: advantage actor-critic with GAE.

TPU-native counterpart of ``tianshou/policy/modelfree/a2c.py:33``
(``A2CPolicy``): the minibatched no-grad value pass + GAE of
``_compute_returns`` (``a2c.py:118-156``) is one fused pass over the rollout
(values for obs and obs_next in a single forward), and the
actor+critic+entropy loss (``a2c.py:160-206``) runs per minibatch inside the
jitted on-policy super-step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from tianshou_tpu.algos.base import TrainState
from tianshou_tpu.algos.pg import PG
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.envs.spaces import Box, Discrete
from tianshou_tpu.ops.returns import gae_advantages

__all__ = ["A2C"]


class A2C(PG):
    def __init__(
        self,
        actor: nn.Module,
        critic: nn.Module,  # ValueNet: obs -> [B]
        action_space: Box | Discrete,
        *,
        lr: float = 7e-4,
        gamma: float = 0.99,
        gae_lambda: float = 0.95,
        vf_coef: float = 0.5,
        ent_coef: float = 0.01,
        max_grad_norm: float | None = None,
        adv_norm: bool = False,
        ret_norm: bool = False,
        deterministic_eval: bool = True,
        optimizer: optax.GradientTransformation | None = None,
    ):
        super().__init__(
            actor,
            action_space,
            lr=lr,
            gamma=gamma,
            ent_coef=ent_coef,
            max_grad_norm=max_grad_norm,
            deterministic_eval=deterministic_eval,
            optimizer=optimizer,
        )
        self.critic = critic
        self.gae_lambda = gae_lambda
        self.vf_coef = vf_coef
        self.adv_norm = adv_norm
        self.ret_norm = ret_norm

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, obs_example: Any) -> TrainState:
        obs = jnp.asarray(obs_example)[None]
        k_a, k_c = jax.random.split(key)
        params = {
            "actor": self.actor.init(k_a, obs),
            "critic": self.critic.init(k_c, obs),
        }
        ret_stats = (
            dict(
                ret_mean=jnp.zeros(()),
                ret_var=jnp.ones(()),
                ret_count=jnp.asarray(1e-4, jnp.float32),
            )
            if self.ret_norm
            else {}
        )
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
            **ret_stats,
        )

    def values(self, params: Any, obs: jax.Array) -> jax.Array:
        return self.critic.apply(params, obs)

    # ------------------------------------------------------------------
    def _ret_scale(self, ts: TrainState) -> jax.Array:
        return jnp.sqrt(ts.ret_var + 1e-8)

    def _gae(self, ts: TrainState, traj: Batch):
        """Critic values + GAE with reference-exact scale handling
        (``a2c.py:111-139``): with return normalization the critic PREDICTS
        normalized values, so v/v_next are unnormalized (x running return
        std) before entering GAE against raw rewards; advantages come out
        in RAW reward scale (the reference does NOT rescale ``batch.adv``).
        Returns ``(v_pred, adv, unnormalized_returns)`` — ``v_pred`` is the
        critic's raw (normalized-scale) output for value clipping."""
        T, N = traj["rew"].shape
        flat = lambda x: x.reshape((T * N,) + x.shape[2:])
        unflat = lambda x: x.reshape((T, N))
        v_pred = unflat(self.values(ts.params["critic"], flat(traj["obs"])))
        v_next = unflat(
            self.values(ts.params["critic"], flat(traj["obs_next"]))
        )
        v, vn = v_pred, v_next
        if self.ret_norm:
            scale = self._ret_scale(ts)
            v = v * scale
            vn = vn * scale
        done = traj["terminated"] | traj["truncated"]
        adv, ret_unnorm = gae_advantages(
            traj["rew"], v, vn, traj["terminated"], done,
            self.gamma, self.gae_lambda,
        )
        return v_pred, adv, ret_unnorm

    def process_rollout(self, ts: TrainState, traj: Batch) -> Batch:
        v_pred, adv, ret = self._gae(ts, traj)
        if self.ret_norm:
            # scale-only normalization of the VALUE TARGETS: divide by the
            # running return std WITHOUT subtracting the mean
            # (``a2c.py:132-139``); advantages stay in raw reward scale
            ret = ret / self._ret_scale(ts)
        out = Batch(
            obs=traj["obs"],
            act=traj["act"],
            adv=adv,
            ret=ret,
            v_s=v_pred,
            logp_old=traj["policy"]["log_prob"],
        )
        return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), out)

    def update_rollout_stats(self, ts: TrainState, traj: Batch) -> TrainState:
        """Fold this rollout's UNNORMALIZED returns into the running return
        statistics (Chan parallel update — the reference's
        ``self.ret_rms.update(unnormalized_returns)``)."""
        if not self.ret_norm:
            return ts
        _, _, ret = self._gae(ts, traj)
        b_mean = ret.mean()
        b_var = ret.var()
        b_count = jnp.asarray(float(ret.size), jnp.float32)
        delta = b_mean - ts.ret_mean
        tot = ts.ret_count + b_count
        new_mean = ts.ret_mean + delta * b_count / tot
        m2 = (
            ts.ret_var * ts.ret_count
            + b_var * b_count
            + delta**2 * ts.ret_count * b_count / tot
        )
        return ts.replace(
            ret_mean=new_mean, ret_var=m2 / tot, ret_count=tot
        )

    # ------------------------------------------------------------------
    def _policy_loss(self, logp, ent, mb, adv):
        return -(logp * adv).mean()

    def _value_loss(self, v, mb):
        return ((mb["ret"] - v) ** 2).mean()

    def learn(self, ts: TrainState, mb: Batch, key: jax.Array):
        adv = mb["adv"]
        if self.adv_norm:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        def loss_fn(params):
            dist = self._dist(params["actor"], mb["obs"])
            logp, ent = self._log_prob_entropy(dist, mb["act"])
            v = self.values(params["critic"], mb["obs"])
            pl = self._policy_loss(logp, ent, mb, adv)
            vl = self._value_loss(v, mb)
            el = ent.mean()
            return pl + self.vf_coef * vl - self.ent_coef * el, (pl, vl, el)

        (loss, (pl, vl, el)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params
        )
        updates, opt_state = self.optimizer.update(grads, ts.opt_state, ts.params)
        ts = ts.replace(
            params=optax.apply_updates(ts.params, updates),
            opt_state=opt_state,
            step=ts.step + 1,
        )
        return ts, {
            "loss": loss,
            "policy_loss": pl,
            "value_loss": vl,
            "entropy": el,
        }
