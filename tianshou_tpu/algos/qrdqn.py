"""QRDQN, IQN and FQF: quantile-based distributional DQN.

TPU-native counterparts of:
- ``tianshou/policy/modelfree/qrdqn.py:162`` (``QRDQNPolicy``): fixed
  tau-hat midpoints (``qrdqn.py:220-224``) + quantile Huber loss
  (``qrdqn.py:244-268``);
- ``iqn.py:297`` (``IQNPolicy``): sampled fractions with separate
  online/target sample sizes (``iqn.py:370-429``);
- ``fqf.py:27`` (``FQFPolicy``): learned fraction proposals with a second
  optimizer + entropy regularization (``fqf.py:155-219``).

The pairwise quantile-Huber term is one ``[B, K, K']`` broadcast — a single
fused XLA kernel rather than the reference's element-wise torch graph.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tianshou_tpu.algos.base import TrainState
from tianshou_tpu.algos.dqn import DQN
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.envs.spaces import Discrete
from tianshou_tpu.ops.returns import nstep_return_components

__all__ = ["QRDQN", "IQN", "FQF", "quantile_huber_loss"]


def quantile_huber_loss(
    current: jax.Array,  # [B, K]   current quantile values
    target: jax.Array,  # [B, K']  target quantile values
    tau_hats: jax.Array,  # [B, K]   fractions of the current quantiles
    kappa: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Pairwise quantile Huber loss; returns (per-sample loss [B],
    per-sample mean |u| [B] for PER priorities)."""
    u = target[:, None, :] - current[:, :, None]  # [B, K, K']
    huber = jnp.where(
        jnp.abs(u) <= kappa, 0.5 * u**2, kappa * (jnp.abs(u) - 0.5 * kappa)
    )
    indicator = (u < 0).astype(jnp.float32)
    loss = jnp.abs(tau_hats[:, :, None] - indicator) * huber / kappa
    return loss.mean(axis=2).sum(axis=1), jnp.abs(u).mean(axis=(1, 2))


class QRDQN(DQN):
    def __init__(
        self,
        network,  # obs -> [B, A, K] quantile values
        action_space: Discrete,
        *,
        num_quantiles: int = 200,
        **kwargs,
    ):
        super().__init__(network, action_space, **kwargs)
        self.num_quantiles = num_quantiles
        # tau-hat midpoints (qrdqn.py:220-224)
        self.tau_hats = (jnp.arange(num_quantiles) + 0.5) / num_quantiles

    def quantiles(self, params, obs, key=None):
        return self.network.apply(params, obs)

    def q_values(self, params: Any, obs: jax.Array) -> jax.Array:
        return self.quantiles(params, obs).mean(axis=-1)

    # ------------------------------------------------------------------
    def _sample_batch(self, buffer, bstate, key, batch_size):
        env_idx, pos, weight = buffer.sample_with_weights(bstate, key, batch_size)
        batch = buffer.get(bstate, env_idx, pos, keys=("obs", "act"))
        rew_chain, done_chain, term_pos = buffer.nstep_chain(
            bstate, env_idx, pos, self.n_step
        )
        term = buffer.get(bstate, env_idx, term_pos, keys=("obs_next", "terminated"))
        mask = 1.0 - term["terminated"].astype(jnp.float32)
        returns, discount = nstep_return_components(
            rew_chain, done_chain, self.gamma
        )
        return env_idx, pos, weight, batch, term, mask, returns, discount

    # the quantile family presamples via ``_sample_batch`` (includes the
    # decomposed n-step return components) instead of the base
    # ``_sample_nstep`` tuple
    presample = _sample_batch

    def _finish_update(self, ts, loss_grads):
        loss, grads = loss_grads
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
        return ts.replace(
            params=params, target_params=target_params, opt_state=opt_state, step=step
        )

    def update_sampled(self, ts, buffer, bstate, sampled, key):
        env_idx, pos, weight, batch, term, mask, returns, discount = sampled
        theta_t = self.quantiles(ts.target_params, term["obs_next"])  # [B, A, K]
        if self.is_double:
            a_star = jnp.argmax(self.q_values(ts.params, term["obs_next"]), axis=-1)
        else:
            a_star = jnp.argmax(theta_t.mean(axis=-1), axis=-1)
        theta_star = jnp.take_along_axis(
            theta_t, a_star[:, None, None], axis=1
        ).squeeze(1)  # [B, K]
        target = jax.lax.stop_gradient(
            returns[:, None] + (discount * mask)[:, None] * theta_star
        )
        tau_hats = jnp.broadcast_to(
            self.tau_hats, (returns.shape[0], self.num_quantiles)
        )

        def loss_fn(params):
            theta = self.quantiles(params, batch["obs"])
            theta_a = jnp.take_along_axis(
                theta, batch["act"].astype(jnp.int32)[:, None, None], axis=1
            ).squeeze(1)
            per_sample, td_abs = quantile_huber_loss(theta_a, target, tau_hats)
            return (weight * per_sample).mean(), td_abs

        (loss, td_abs), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        bstate = buffer.update_priorities(bstate, env_idx, pos, td_abs)
        ts = self._finish_update(ts, (loss, grads))
        return ts, bstate, {"loss": loss}

    def priority_scores(self, ts, sampled, key=None):
        """Per-sample quantile |TD| under ``ts`` — the same quantity
        :meth:`update_sampled` writes into the PER tree, recomputed for
        process-local write-back in the distributed trainer."""
        env_idx, pos, weight, batch, term, mask, returns, discount = sampled
        theta_t = self.quantiles(ts.target_params, term["obs_next"])
        if self.is_double:
            a_star = jnp.argmax(self.q_values(ts.params, term["obs_next"]), axis=-1)
        else:
            a_star = jnp.argmax(theta_t.mean(axis=-1), axis=-1)
        theta_star = jnp.take_along_axis(
            theta_t, a_star[:, None, None], axis=1
        ).squeeze(1)
        target = returns[:, None] + (discount * mask)[:, None] * theta_star
        tau_hats = jnp.broadcast_to(
            self.tau_hats, (returns.shape[0], self.num_quantiles)
        )
        theta = self.quantiles(ts.params, batch["obs"])
        theta_a = jnp.take_along_axis(
            theta, batch["act"].astype(jnp.int32)[:, None, None], axis=1
        ).squeeze(1)
        _, td_abs = quantile_huber_loss(theta_a, target, tau_hats)
        return td_abs


class IQN(QRDQN):
    """Implicit quantile networks: fractions are sampled per forward
    (reference ``iqn.py:297``)."""

    def __init__(
        self,
        network,  # ImplicitQuantileNetwork: (obs, taus) -> [B, K, A]
        action_space: Discrete,
        *,
        sample_size: int = 32,
        online_sample_size: int = 8,
        target_sample_size: int = 8,
        **kwargs,
    ):
        kwargs.setdefault("num_quantiles", sample_size)
        super().__init__(network, action_space, **kwargs)
        self.sample_size = sample_size
        self.online_sample_size = online_sample_size
        self.target_sample_size = target_sample_size

    def init(self, key: jax.Array, obs_example: Any) -> TrainState:
        obs = jnp.asarray(obs_example)[None]
        taus = jnp.linspace(0.0, 1.0, self.sample_size)[None]
        params = self.network.init(key, obs, taus)
        return TrainState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def _rowwise_taus(self, key, n_rows, k, row_offset=0):
        """Per-row fraction sampling: row ``i`` draws from
        ``fold_in(key, row_offset + i)``, so the fractions of any batch row
        depend only on its GLOBAL row id — not on the batch shape.  This is
        what makes the distributed trainer's process-local priority
        recompute exact: a shard at ``row_offset = pid * batch_local``
        regenerates bit-for-bit the fractions its rows had inside the
        global dp-sharded update (trainer/distributed.py PER write-back)."""
        rows = row_offset + jnp.arange(n_rows)
        keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, rows)
        return jax.vmap(lambda kk: jax.random.uniform(kk, (k,)))(keys)

    def _quantiles_sampled(self, params, obs, key, k, row_offset=0):
        taus = self._rowwise_taus(key, obs.shape[0], k, row_offset)
        vals = self.network.apply(params, obs, taus)  # [B, K, A]
        return vals.transpose(0, 2, 1), taus  # [B, A, K]

    def act(self, ts, obs, key, explore, explore_param=0.0):
        k_tau, k_eps = jax.random.split(key)
        vals, _ = self._quantiles_sampled(
            ts.params, obs, k_tau, self.sample_size
        )
        q = vals.mean(axis=-1)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        if not explore:
            return greedy, Batch()
        k1, k2 = jax.random.split(k_eps)
        rand = jax.random.randint(k1, greedy.shape, 0, self.action_space.n)
        take = jax.random.uniform(k2, greedy.shape) < explore_param
        return jnp.where(take, rand, greedy).astype(jnp.int32), Batch()

    def update_sampled(self, ts, buffer, bstate, sampled, key):
        k_tgt, k_onl, k_dbl = jax.random.split(key, 3)
        env_idx, pos, weight, batch, term, mask, returns, discount = sampled
        theta_t, _ = self._quantiles_sampled(
            ts.target_params, term["obs_next"], k_tgt, self.target_sample_size
        )
        if self.is_double:
            v_onl, _ = self._quantiles_sampled(
                ts.params, term["obs_next"], k_dbl, self.target_sample_size
            )
            a_star = jnp.argmax(v_onl.mean(axis=-1), axis=-1)
        else:
            a_star = jnp.argmax(theta_t.mean(axis=-1), axis=-1)
        theta_star = jnp.take_along_axis(
            theta_t, a_star[:, None, None], axis=1
        ).squeeze(1)
        target = jax.lax.stop_gradient(
            returns[:, None] + (discount * mask)[:, None] * theta_star
        )

        def loss_fn(params):
            vals, taus = self._quantiles_sampled(
                params, batch["obs"], k_onl, self.online_sample_size
            )
            theta_a = jnp.take_along_axis(
                vals, batch["act"].astype(jnp.int32)[:, None, None], axis=1
            ).squeeze(1)
            per_sample, td_abs = quantile_huber_loss(theta_a, target, taus)
            return (weight * per_sample).mean(), td_abs

        (loss, td_abs), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        bstate = buffer.update_priorities(bstate, env_idx, pos, td_abs)
        ts = self._finish_update(ts, (loss, grads))
        return ts, bstate, {"loss": loss}

    def priority_scores(self, ts, sampled, key=None, row_offset=0):
        """Exact recompute of :meth:`update_sampled`'s quantile |TD|: the
        same key splits and the same per-row fractions (``row_offset``
        places this shard's rows inside the global batch, see
        :meth:`_rowwise_taus`)."""
        if key is None:
            key = jax.random.key(0)
        k_tgt, k_onl, k_dbl = jax.random.split(key, 3)
        env_idx, pos, weight, batch, term, mask, returns, discount = sampled
        theta_t, _ = self._quantiles_sampled(
            ts.target_params, term["obs_next"], k_tgt,
            self.target_sample_size, row_offset,
        )
        if self.is_double:
            v_onl, _ = self._quantiles_sampled(
                ts.params, term["obs_next"], k_dbl,
                self.target_sample_size, row_offset,
            )
            a_star = jnp.argmax(v_onl.mean(axis=-1), axis=-1)
        else:
            a_star = jnp.argmax(theta_t.mean(axis=-1), axis=-1)
        theta_star = jnp.take_along_axis(
            theta_t, a_star[:, None, None], axis=1
        ).squeeze(1)
        target = returns[:, None] + (discount * mask)[:, None] * theta_star
        vals, taus = self._quantiles_sampled(
            ts.params, batch["obs"], k_onl, self.online_sample_size, row_offset
        )
        theta_a = jnp.take_along_axis(
            vals, batch["act"].astype(jnp.int32)[:, None, None], axis=1
        ).squeeze(1)
        _, td_abs = quantile_huber_loss(theta_a, target, taus)
        return td_abs


@struct.dataclass
class FQFTrainState(TrainState):
    fraction_params: Any = None
    fraction_opt_state: Any = None


class FQF(QRDQN):
    """Fully-parameterized quantile function (reference ``fqf.py:27``):
    learned fraction proposals with their own optimizer and entropy
    regularization."""

    def priority_scores(self, ts, sampled, key=None, row_offset=0):
        """Exact recompute of :meth:`update_sampled`'s |TD|: FQF's
        fractions are LEARNED proposals (deterministic functions of the
        state features), so the recompute needs no key mirroring at all —
        it is exact for any batch sharding."""
        env_idx, pos, weight, batch, term, mask, returns, discount = sampled
        act = batch["act"].astype(jnp.int32)
        taus_t, tau_hats_t, vals_t, _, _ = self._forward(
            ts.target_params, ts.fraction_params, term["obs_next"]
        )
        w_t = (taus_t[:, 1:] - taus_t[:, :-1])[:, None, :]
        a_star = jnp.argmax((w_t * vals_t).sum(axis=-1), axis=-1)
        theta_star = jnp.take_along_axis(
            vals_t, a_star[:, None, None], axis=1
        ).squeeze(1)
        target = returns[:, None] + (discount * mask)[:, None] * theta_star
        _, tau_hats, vals, _, _ = self._forward(
            ts.params, ts.fraction_params, batch["obs"]
        )
        theta_a = jnp.take_along_axis(vals, act[:, None, None], axis=1).squeeze(1)
        _, td_abs = quantile_huber_loss(theta_a, target, tau_hats)
        return td_abs

    def __init__(
        self,
        network,  # FullQuantileFunction
        fraction_network,  # FractionProposalNetwork
        action_space: Discrete,
        *,
        fraction_lr: float = 2.5e-9,
        ent_coef: float = 10.0,
        num_fractions: int = 32,
        **kwargs,
    ):
        kwargs.setdefault("num_quantiles", num_fractions)
        super().__init__(network, action_space, **kwargs)
        self.fraction_network = fraction_network
        self.fraction_optim = optax.rmsprop(fraction_lr)
        self.ent_coef = ent_coef
        self.num_fractions = num_fractions

    def init(self, key: jax.Array, obs_example: Any) -> FQFTrainState:
        obs = jnp.asarray(obs_example)[None]
        k1, k2 = jax.random.split(key)
        taus = jnp.linspace(0.0, 1.0, self.num_fractions)[None]
        params = self.network.init(k1, obs, taus)
        feat = self.network.apply(params, obs, method="features")
        fraction_params = self.fraction_network.init(k2, feat)
        return FQFTrainState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
            fraction_params=fraction_params,
            fraction_opt_state=self.fraction_optim.init(fraction_params),
        )

    def _forward(self, params, fraction_params, obs):
        """Returns (taus [B,K+1], tau_hats [B,K], values at tau_hats
        [B,A,K], entropy [B], feat).

        Fractions are proposed from *detached* features and detached before
        re-entering the quantile head, as the reference does
        (``utils/net/discrete.py:308`` ``propose_model(logits.detach())``) —
        otherwise the quantile loss backprops into the trunk through the
        proposals and destabilizes training.
        """
        feat = self.network.apply(params, obs, method="features")
        taus, tau_hats, entropy = self.fraction_network.apply(
            fraction_params, jax.lax.stop_gradient(feat)
        )
        vals = self.network.apply(
            params, feat, jax.lax.stop_gradient(tau_hats), method="quantiles"
        )  # [B, K, A]
        return taus, tau_hats, vals.transpose(0, 2, 1), entropy, feat

    def q_values_fqf(self, ts, obs):
        taus, tau_hats, vals, _, _ = self._forward(
            ts.params, ts.fraction_params, obs
        )
        # E[Z] = sum_k (tau_{k+1} - tau_k) * theta(tau_hat_k)
        w = (taus[:, 1:] - taus[:, :-1])[:, None, :]
        return (w * vals).sum(axis=-1)

    def act_params(self, ts):
        # q_values_fqf reads the quantile net AND the fraction proposals
        return (ts.params, ts.fraction_params)

    def with_act_params(self, ts, sub):
        return ts.replace(params=sub[0], fraction_params=sub[1])

    def act(self, ts, obs, key, explore, explore_param=0.0):
        q = self.q_values_fqf(ts, obs)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        if not explore:
            return greedy, Batch()
        k1, k2 = jax.random.split(key)
        rand = jax.random.randint(k1, greedy.shape, 0, self.action_space.n)
        take = jax.random.uniform(k2, greedy.shape) < explore_param
        return jnp.where(take, rand, greedy).astype(jnp.int32), Batch()

    def update_sampled(self, ts, buffer, bstate, sampled, key):
        env_idx, pos, weight, batch, term, mask, returns, discount = sampled
        act = batch["act"].astype(jnp.int32)

        # target: quantiles of the target net at the online fractions
        taus_t, tau_hats_t, vals_t, _, _ = self._forward(
            ts.target_params, ts.fraction_params, term["obs_next"]
        )
        w_t = (taus_t[:, 1:] - taus_t[:, :-1])[:, None, :]
        a_star = jnp.argmax((w_t * vals_t).sum(axis=-1), axis=-1)
        theta_star = jnp.take_along_axis(
            vals_t, a_star[:, None, None], axis=1
        ).squeeze(1)
        target = jax.lax.stop_gradient(
            returns[:, None] + (discount * mask)[:, None] * theta_star
        )

        def loss_fn(params):
            taus, tau_hats, vals, entropy, feat = self._forward(
                params, ts.fraction_params, batch["obs"]
            )
            theta_a = jnp.take_along_axis(
                vals, act[:, None, None], axis=1
            ).squeeze(1)
            per_sample, td_abs = quantile_huber_loss(theta_a, target, tau_hats)
            return (weight * per_sample).mean(), (td_abs, feat)

        (loss, (td_abs, feat)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params)
        bstate = buffer.update_priorities(bstate, env_idx, pos, td_abs)

        # fraction loss: dW1/dtau_i = 2*F^-1(tau_i) - F^-1(tau_hat_i)
        #                - F^-1(tau_hat_{i-1}) (FQF paper eq. 7), plus
        # entropy regularization (fqf.py:155-219)
        feat = jax.lax.stop_gradient(feat)

        def fraction_loss_fn(fp):
            taus, tau_hats, entropy = self.fraction_network.apply(fp, feat)
            v_at_tau = self.network.apply(
                ts.params, feat, taus[:, 1:-1], method="quantiles"
            ).transpose(0, 2, 1)  # [B, A, K-1]
            v_at_hat = self.network.apply(
                ts.params, feat, tau_hats, method="quantiles"
            ).transpose(0, 2, 1)  # [B, A, K]
            v_tau_a = jnp.take_along_axis(
                v_at_tau, act[:, None, None], axis=1
            ).squeeze(1)
            v_hat_a = jnp.take_along_axis(
                v_at_hat, act[:, None, None], axis=1
            ).squeeze(1)
            grad_w1 = jax.lax.stop_gradient(
                2.0 * v_tau_a - v_hat_a[:, :-1] - v_hat_a[:, 1:]
            )
            floss = (grad_w1 * taus[:, 1:-1]).sum(axis=-1).mean()
            return floss - self.ent_coef * entropy.mean()

        floss, fgrads = jax.value_and_grad(fraction_loss_fn)(ts.fraction_params)
        fupd, f_opt = self.fraction_optim.update(
            fgrads, ts.fraction_opt_state, ts.fraction_params
        )
        fraction_params = optax.apply_updates(ts.fraction_params, fupd)

        ts = self._finish_update(ts, (loss, grads))
        ts = ts.replace(
            fraction_params=fraction_params, fraction_opt_state=f_opt
        )
        return ts, bstate, {"loss": loss, "fraction_loss": floss}
