"""REINFORCE (policy gradient) with MC returns.

TPU-native counterpart of ``tianshou/policy/modelfree/pg.py:53``
(``PGPolicy``): the ``dist_fn`` abstraction (``pg.py:36-42``) becomes a
static dispatch on the action space (diagonal Gaussian for Box, categorical
for Discrete); MC returns (GAE with lambda=1, ``pg.py:127-173``) are a
``lax.scan`` kernel over the time-major rollout; learning consumes
minibatches inside the jitted on-policy super-step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.envs.spaces import Box, Discrete
from tianshou_tpu.ops.dist import (
    categorical_entropy,
    categorical_log_prob,
    categorical_sample,
    normal_entropy,
    normal_log_prob,
    normal_sample,
)
from tianshou_tpu.ops.returns import discounted_returns

__all__ = ["PG"]


class PG(Algorithm):
    def __init__(
        self,
        actor: nn.Module,
        action_space: Box | Discrete,
        *,
        lr: float = 1e-3,
        gamma: float = 0.99,
        ret_norm: bool = False,
        ent_coef: float = 0.0,
        max_grad_norm: float | None = None,
        deterministic_eval: bool = True,
        optimizer: optax.GradientTransformation | None = None,
    ):
        self.actor = actor
        self.action_space = action_space
        self.discrete = isinstance(action_space, Discrete)
        tx = optimizer or optax.adam(lr)
        if max_grad_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
        self.optimizer = tx
        self.gamma = gamma
        self.ret_norm = ret_norm
        self.ent_coef = ent_coef
        self.deterministic_eval = deterministic_eval

    # -- dist dispatch -----------------------------------------------------
    def _dist(self, params: Any, obs: jax.Array):
        return self.actor.apply(params, obs)

    def _sample_logp(self, dist, key):
        if self.discrete:
            a = categorical_sample(key, dist)
            return a, categorical_log_prob(a, dist)
        mu, sigma = dist
        a = normal_sample(key, mu, sigma)
        return a, normal_log_prob(a, mu, sigma)

    def _mode(self, dist):
        if self.discrete:
            return jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return dist[0]

    def _log_prob_entropy(self, dist, act):
        if self.discrete:
            return categorical_log_prob(act, dist), categorical_entropy(dist)
        mu, sigma = dist
        return normal_log_prob(act, mu, sigma), normal_entropy(sigma)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, obs_example: Any) -> TrainState:
        obs = jnp.asarray(obs_example)[None]
        params = {"actor": self.actor.init(key, obs)}
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def act_params(self, ts):
        return ts.params

    def with_act_params(self, ts, sub):
        return ts.replace(params=sub)

    def act(self, ts: TrainState, obs, key, explore, explore_param=0.0):
        dist = self._dist(ts.params["actor"], obs)
        if not explore and self.deterministic_eval:
            return self._mode(dist), Batch()
        a, logp = self._sample_logp(dist, key)
        return a, Batch(log_prob=logp)

    # ------------------------------------------------------------------
    def process_rollout(self, ts: TrainState, traj: Batch) -> Batch:
        """Compute targets over the ``[T, N, ...]`` rollout and flatten to
        ``[T*N, ...]`` for minibatch learning."""
        done = traj["terminated"] | traj["truncated"]
        ret = discounted_returns(
            traj["rew"],
            jnp.zeros_like(traj["rew"]),  # no critic: zero bootstrap
            traj["terminated"],
            done,
            self.gamma,
        )
        out = Batch(
            obs=traj["obs"],
            act=traj["act"],
            ret=ret,
            logp_old=traj["policy"]["log_prob"],
        )
        return jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), out
        )

    def learn(self, ts: TrainState, mb: Batch, key: jax.Array):
        ret = mb["ret"]
        if self.ret_norm:
            ret = (ret - ret.mean()) / (ret.std() + 1e-8)

        def loss_fn(params):
            dist = self._dist(params["actor"], mb["obs"])
            logp, ent = self._log_prob_entropy(dist, mb["act"])
            pg_loss = -(logp * ret).mean()
            ent_loss = -self.ent_coef * ent.mean()
            return pg_loss + ent_loss, (pg_loss, ent.mean())

        (loss, (pg_loss, ent)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params)
        updates, opt_state = self.optimizer.update(grads, ts.opt_state, ts.params)
        ts = ts.replace(
            params=optax.apply_updates(ts.params, updates),
            opt_state=opt_state,
            step=ts.step + 1,
        )
        return ts, {"loss": loss, "pg_loss": pg_loss, "entropy": ent}
