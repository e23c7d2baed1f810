"""GAIL: PPO with a learned discriminator reward.

TPU-native counterpart of ``tianshou/policy/imitation/gail.py:35``
(``GAILPolicy``): the discriminator reward ``-logsigmoid(-D(s,a)) ==
softplus(D)`` replaces the env reward before advantage computation
(``gail.py:141-160``), and the discriminator trains against minibatches of
policy data vs. samples from a static expert buffer (``gail.py:162-180``)
inside the same jitted super-step (via the trainer's ``pre_learn`` hook).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from tianshou_tpu.algos.base import TrainState
from tianshou_tpu.algos.ppo import PPO
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState

__all__ = ["GAIL", "GAILTrainState"]


@struct.dataclass
class GAILTrainState(TrainState):
    disc_params: Any = None
    disc_opt_state: Any = None


class GAIL(PPO):
    def __init__(
        self,
        *args,
        disc_net: nn.Module,  # (obs, act) -> logit [B]
        expert_buffer: ReplayBuffer,
        expert_buffer_state: ReplayBufferState,
        disc_lr: float = 2.5e-4,
        disc_update_num: int = 4,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.disc_net = disc_net
        self.disc_optim = optax.adam(disc_lr)
        self.disc_update_num = disc_update_num
        self.expert_buffer = expert_buffer
        self.expert_buffer_state = expert_buffer_state

    def init(self, key: jax.Array, obs_example: Any) -> GAILTrainState:
        base = super().init(key, obs_example)
        obs = jnp.asarray(obs_example)[None]
        act_dim = self.action_space.shape[0]
        disc_params = self.disc_net.init(
            jax.random.fold_in(key, 1), obs, jnp.zeros((1, act_dim))
        )
        return GAILTrainState(
            params=base.params,
            opt_state=base.opt_state,
            step=base.step,
            ret_mean=base.ret_mean,
            ret_var=base.ret_var,
            ret_count=base.ret_count,
            disc_params=disc_params,
            disc_opt_state=self.disc_optim.init(disc_params),
        )

    # -- discriminator -----------------------------------------------------
    def disc_logits(self, disc_params, obs, act):
        return self.disc_net.apply(disc_params, obs, act)

    def pre_learn(self, ts: GAILTrainState, traj: Batch, key: jax.Array):
        """Train the discriminator on policy rollout vs expert samples."""
        T, N = traj["rew"].shape
        flat_obs = traj["obs"].reshape((T * N,) + traj["obs"].shape[2:])
        flat_act = traj["act"].reshape((T * N,) + traj["act"].shape[2:])
        bsz = max(1, (T * N) // self.disc_update_num)

        def body(carry, k):
            dp, dopt = carry
            k1, k2 = jax.random.split(k)
            idx = jax.random.randint(k1, (bsz,), 0, T * N)
            env_idx, pos, _ = self.expert_buffer.sample_with_weights(
                self.expert_buffer_state, k2, bsz
            )
            exp = self.expert_buffer.get(
                self.expert_buffer_state, env_idx, pos, keys=("obs", "act")
            )

            def disc_loss_fn(p):
                logits_pi = self.disc_logits(p, flat_obs[idx], flat_act[idx])
                logits_exp = self.disc_logits(p, exp["obs"], exp["act"])
                # -logsigmoid(-x) = softplus(x); -logsigmoid(x) = softplus(-x)
                loss_pi = jax.nn.softplus(logits_pi).mean()
                loss_exp = jax.nn.softplus(-logits_exp).mean()
                return loss_pi + loss_exp, (
                    (logits_pi < 0).mean(),
                    (logits_exp > 0).mean(),
                )

            (dloss, (acc_pi, acc_exp)), grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(dp)
            upd, dopt = self.disc_optim.update(grads, dopt, dp)
            return (optax.apply_updates(dp, upd), dopt), (dloss, acc_pi, acc_exp)

        keys = jax.random.split(key, self.disc_update_num)
        (disc_params, disc_opt_state), (dloss, acc_pi, acc_exp) = jax.lax.scan(
            body, (ts.disc_params, ts.disc_opt_state), keys
        )
        ts = ts.replace(disc_params=disc_params, disc_opt_state=disc_opt_state)
        return ts, {
            "disc_loss": dloss.mean(),
            "acc_pi": acc_pi.mean(),
            "acc_exp": acc_exp.mean(),
        }

    # -- reward substitution ------------------------------------------------
    def process_rollout(self, ts: GAILTrainState, traj: Batch) -> Batch:
        T, N = traj["rew"].shape
        flat_obs = traj["obs"].reshape((T * N,) + traj["obs"].shape[2:])
        flat_act = traj["act"].reshape((T * N,) + traj["act"].shape[2:])
        logits = self.disc_logits(ts.disc_params, flat_obs, flat_act)
        fake_rew = jax.nn.softplus(logits).reshape(T, N)
        traj = Batch(traj)
        traj["rew"] = jax.lax.stop_gradient(fake_rew)
        return super().process_rollout(ts, traj)
