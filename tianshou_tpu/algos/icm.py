"""ICM: intrinsic curiosity module as a policy wrapper.

TPU-native counterpart of ``tianshou/policy/modelbased/icm.py:36``
(``ICMPolicy``): wraps any off-policy algorithm, augments rewards with the
forward-model prediction error at sample time (the reference's
``process_fn`` reward injection + ``post_process_fn`` restore,
``icm.py:124-176`` — here a pure buffer view, nothing to restore), and
trains the feature/forward/inverse models alongside the policy.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.envs.spaces import Discrete
from tianshou_tpu.networks.common import MLP

__all__ = ["ICM", "ICMNet"]


class ICMNet(nn.Module):
    """Feature encoder + forward model + inverse model (discrete actions)."""

    hidden_sizes: tuple[int, ...]
    feature_dim: int
    num_actions: int

    def setup(self):
        self.encoder = MLP(self.hidden_sizes, self.feature_dim)
        self.forward_head = MLP((self.feature_dim,), self.feature_dim)
        self.inverse_head = MLP((self.feature_dim,), self.num_actions)

    def __call__(self, obs, act, obs_next):
        phi = self.encoder(obs)
        phi_next = self.encoder(obs_next)
        act_oh = jax.nn.one_hot(act.astype(jnp.int32), self.num_actions)
        phi_pred = self.forward_head(
            jnp.concatenate([phi, act_oh], axis=-1)
        )
        act_logits = self.inverse_head(
            jnp.concatenate([phi, phi_next], axis=-1)
        )
        fwd_err = 0.5 * ((phi_pred - jax.lax.stop_gradient(phi_next)) ** 2).sum(
            axis=-1
        )
        return fwd_err, act_logits


@struct.dataclass
class ICMTrainState:
    inner: Any
    icm_params: Any
    icm_opt_state: Any

    @property
    def step(self):
        return self.inner.step


class _ICMBufferView(ReplayBuffer):
    """Buffer view adding the intrinsic reward at sample time (1-step)."""

    def __init__(self, base: ReplayBuffer, icm: "ICM", icm_params: Any):
        super().__init__(base.capacity, base.num_envs, base.stack_num)
        self._base = base
        self._icm = icm
        self._params = icm_params

    def sample_with_weights(self, state, key, batch_size):
        return self._base.sample_with_weights(state, key, batch_size)

    def get(self, state, env_idx, pos, keys=None):
        return self._base.get(state, env_idx, pos, keys=keys)

    def update_priorities(self, state, env_idx, pos, td_abs):
        return self._base.update_priorities(state, env_idx, pos, td_abs)

    def nstep_chain(self, state, env_idx, pos, n_step):
        assert n_step == 1, "ICM reward injection supports 1-step inner algos"
        rew_chain, done_chain, term_pos = self._base.nstep_chain(
            state, env_idx, pos, n_step
        )
        tr = self._base.get(state, env_idx, pos, keys=("obs", "act", "obs_next"))
        fwd_err, _ = self._icm.icm_net.apply(
            self._params, tr["obs"], tr["act"], tr["obs_next"]
        )
        intrinsic = self._icm.reward_scale * jax.lax.stop_gradient(fwd_err)
        return rew_chain + intrinsic[:, None], done_chain, term_pos


class ICM(Algorithm):
    def __init__(
        self,
        inner: Algorithm,
        icm_net: ICMNet,
        *,
        lr: float = 1e-3,
        reward_scale: float = 0.01,
        forward_loss_weight: float = 0.2,
    ):
        self.inner = inner
        self.icm_net = icm_net
        self.action_space = inner.action_space
        self.optimizer = optax.adam(lr)
        self.reward_scale = reward_scale
        self.forward_loss_weight = forward_loss_weight

    def init(self, key: jax.Array, obs_example: Any) -> ICMTrainState:
        k1, k2 = jax.random.split(key)
        inner_ts = self.inner.init(k1, obs_example)
        obs = jnp.asarray(obs_example)[None]
        icm_params = self.icm_net.init(
            k2, obs, jnp.zeros((1,), jnp.int32), obs
        )
        return ICMTrainState(
            inner=inner_ts,
            icm_params=icm_params,
            icm_opt_state=self.optimizer.init(icm_params),
        )

    def act(self, ts: ICMTrainState, obs, key, explore, explore_param=0.0):
        return self.inner.act(ts.inner, obs, key, explore, explore_param)

    def update(
        self,
        ts: ICMTrainState,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        key: jax.Array,
        batch_size: int,
    ):
        k_icm, k_inner = jax.random.split(key)
        # 1. train the curiosity models (icm.py learn)
        env_idx, pos, _ = buffer.sample_with_weights(bstate, k_icm, batch_size)
        tr = buffer.get(bstate, env_idx, pos, keys=("obs", "act", "obs_next"))

        def icm_loss_fn(p):
            fwd_err, act_logits = self.icm_net.apply(
                p, tr["obs"], tr["act"], tr["obs_next"]
            )
            logp = jax.nn.log_softmax(act_logits, axis=-1)
            inv_loss = -jnp.take_along_axis(
                logp, tr["act"].astype(jnp.int32)[:, None], axis=-1
            ).mean()
            fwd_loss = fwd_err.mean()
            w = self.forward_loss_weight
            return w * fwd_loss + (1 - w) * inv_loss, (fwd_loss, inv_loss)

        (loss, (fwd_loss, inv_loss)), grads = jax.value_and_grad(
            icm_loss_fn, has_aux=True
        )(ts.icm_params)
        upd, opt_state = self.optimizer.update(grads, ts.icm_opt_state)
        icm_params = optax.apply_updates(ts.icm_params, upd)

        # 2. inner update with intrinsic-augmented rewards
        view = _ICMBufferView(buffer, self, icm_params)
        inner_ts, bstate, metrics = self.inner.update(
            ts.inner, view, bstate, k_inner, batch_size
        )
        ts = ICMTrainState(
            inner=inner_ts, icm_params=icm_params, icm_opt_state=opt_state
        )
        metrics = dict(metrics)
        metrics.update(
            {"icm_loss": loss, "icm_forward": fwd_loss, "icm_inverse": inv_loss}
        )
        return ts, bstate, metrics
