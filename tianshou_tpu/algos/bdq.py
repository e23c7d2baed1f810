"""Branching dueling Q-network (BDQ, arXiv 1711.08946).

TPU-native counterpart of ``tianshou/policy/modelfree/bdq.py:250``
(``BranchingDQNPolicy``): per-branch argmax action selection over
MultiDiscrete spaces, branch-averaged bootstrap target (the reference's
custom 1-step return ``bdq.py:335-357``), and a TD loss summed over
branches.  Uses ``BranchingQNet`` (``networks/common.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algos.dqn import DQN
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.envs.spaces import MultiDiscrete
from tianshou_tpu.ops.returns import nstep_return

__all__ = ["BDQ"]


class BDQ(DQN):
    def __init__(self, network, action_space: MultiDiscrete, **kwargs):
        kwargs.setdefault("n_step", 1)
        super().__init__(network, action_space, **kwargs)
        self.num_branches = len(action_space.nvec)

    # network: obs -> [B, branches, actions_per_branch]
    def act(self, ts, obs, key, explore, explore_param=0.0):
        q = self.network.apply(ts.params, obs)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)  # [B, branches]
        if not explore:
            return greedy, Batch()
        k1, k2 = jax.random.split(key)
        rand = self.action_space.sample(k1, (greedy.shape[0],))
        take = (
            jax.random.uniform(k2, (greedy.shape[0],)) < explore_param
        )[:, None]
        return jnp.where(take, rand, greedy).astype(jnp.int32), Batch()

    def update_sampled(self, ts, buffer, bstate, sampled, key):
        # branch-aware TD step from the generic presampled n-step tuple;
        # overrides the scalar-action DQN.update_sampled, which the
        # presampled trainer path would otherwise silently use
        env_idx, pos, weight, batch, rew_chain, done_chain, term = sampled
        mask = 1.0 - term["terminated"].astype(jnp.float32)

        q_t = self.network.apply(ts.target_params, term["obs_next"])
        if self.is_double:
            a_star = jnp.argmax(
                self.network.apply(ts.params, term["obs_next"]), axis=-1
            )
            q_next = jnp.take_along_axis(q_t, a_star[..., None], axis=-1).squeeze(-1)
        else:
            q_next = q_t.max(axis=-1)
        # branch-mean bootstrap (bdq.py:335-357)
        q_term = q_next.mean(axis=-1) * mask
        target = jax.lax.stop_gradient(
            nstep_return(rew_chain, done_chain, q_term, self.gamma)
        )

        def loss_fn(params):
            q = self.network.apply(params, batch["obs"])  # [B, nb, apb]
            q_a = jnp.take_along_axis(
                q, batch["act"].astype(jnp.int32)[..., None], axis=-1
            ).squeeze(-1)  # [B, nb]
            td = q_a - target[:, None]
            return (weight[:, None] * td**2).mean(), jnp.abs(td).mean(axis=-1)

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
