"""NPG and TRPO: natural-gradient policy optimization.

TPU-native counterparts of ``tianshou/policy/modelfree/npg.py:394``
(``NPGPolicy``: conjugate-gradient solve of the Fisher system
``npg.py:555-577``, Hessian-vector products ``npg.py:548-553``, flat-param
updates ``npg.py:583-589``) and ``trpo.py:191`` (``TRPOPolicy``:
KL-constrained backtracking line search ``trpo.py:269-361``).

Everything — CG iterations, Fisher-vector products (forward-over-reverse
``jvp(grad(kl))``), and the TRPO backtracking loop — runs inside the jitted
learn step: CG is a ``lax.fori_loop``, the line search a ``lax.scan`` over
backtrack exponents with first-accept masking (fixed shapes, no host sync).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.flatten_util import ravel_pytree

from tianshou_tpu.algos.a2c import A2C
from tianshou_tpu.algos.base import TrainState
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.envs.spaces import Box, Discrete
from tianshou_tpu.ops.dist import kl_categorical, kl_normal

__all__ = ["NPG", "TRPO"]


class NPG(A2C):
    def __init__(
        self,
        actor: nn.Module,
        critic: nn.Module,
        action_space: Box | Discrete,
        *,
        critic_lr: float = 1e-3,
        gamma: float = 0.99,
        gae_lambda: float = 0.95,
        optim_critic_iters: int = 5,
        trust_region_size: float = 0.5,
        cg_iters: int = 10,
        cg_damping: float = 0.1,
        adv_norm: bool = True,
        ret_norm: bool = True,
        deterministic_eval: bool = True,
    ):
        super().__init__(
            actor,
            critic,
            action_space,
            lr=critic_lr,
            gamma=gamma,
            gae_lambda=gae_lambda,
            adv_norm=adv_norm,
            ret_norm=ret_norm,
            deterministic_eval=deterministic_eval,
        )
        self.optim_critic_iters = optim_critic_iters
        self.trust_region_size = trust_region_size
        self.cg_iters = cg_iters
        self.cg_damping = cg_damping

    # critic-only optimizer: actor params are updated by flat natural-
    # gradient steps, not Adam
    def init(self, key, obs_example):
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
            opt_state=self.optimizer.init(params["critic"]),
            step=jnp.zeros((), jnp.int32),
            **ret_stats,
        )

    # ------------------------------------------------------------------
    def _kl(self, dist_old, dist_new):
        if self.discrete:
            return kl_categorical(dist_old, dist_new).mean()
        return kl_normal(*dist_old, *dist_new).mean()

    def _surrogate(self, dist_new, mb, adv):
        """NPG uses the vanilla policy gradient objective
        (``npg.py:140-142``); TRPO overrides with the importance ratio."""
        logp, _ = self._log_prob_entropy(dist_new, mb["act"])
        return -(logp * adv).mean()

    def _conjugate_gradient(self, fvp, g):
        """Solve F x = g (fvp: v -> F v) by CG (npg.py:555-577)."""
        x = jnp.zeros_like(g)
        r = g
        p = g
        rdotr = r @ r

        def body(i, carry):
            x, r, p, rdotr = carry
            fp = fvp(p)
            alpha = rdotr / (p @ fp + 1e-12)
            x = x + alpha * p
            r = r - alpha * fp
            new_rdotr = r @ r
            beta = new_rdotr / (rdotr + 1e-12)
            p = r + beta * p
            return x, r, p, new_rdotr

        x, *_ = jax.lax.fori_loop(0, self.cg_iters, body, (x, r, p, rdotr))
        return x

    def _natural_gradient(self, ts, mb, adv):
        """Compute (flat_params, unravel, direction, step_size, dist_old)."""
        flat0, unravel = ravel_pytree(ts.params["actor"])
        dist_old = jax.lax.stop_gradient(
            self._dist(ts.params["actor"], mb["obs"])
        )

        def surrogate_flat(p):
            return self._surrogate(self._dist(unravel(p), mb["obs"]), mb, adv)

        def kl_flat(p):
            return self._kl(dist_old, self._dist(unravel(p), mb["obs"]))

        g = jax.grad(surrogate_flat)(flat0)
        kl_grad_fn = jax.grad(kl_flat)

        def fvp(v):
            # forward-over-reverse Hessian-vector product + damping
            return jax.jvp(kl_grad_fn, (flat0,), (v,))[1] + self.cg_damping * v

        direction = self._conjugate_gradient(fvp, g)
        dFd = direction @ fvp(direction)
        return flat0, unravel, direction, dFd, dist_old, surrogate_flat, kl_flat

    def _actor_step(self, ts, mb, adv):
        # constant step along the natural direction (npg.py:154-160,
        # actor_step_size == trust_region_size here)
        flat0, unravel, d, dFd, _, _, _ = self._natural_gradient(ts, mb, adv)
        new_flat = flat0 - self.trust_region_size * d
        return unravel(new_flat), {}

    # ------------------------------------------------------------------
    def learn(self, ts: TrainState, mb: Batch, key: jax.Array):
        adv = mb["adv"]
        if self.adv_norm:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        actor_params, extra = self._actor_step(ts, mb, adv)
        params = dict(ts.params)
        params["actor"] = actor_params

        # critic regression (optim_critic_iters steps)
        def critic_step(carry, _):
            cp, opt_state = carry

            def vloss_fn(c):
                v = self.critic.apply(c, mb["obs"])
                return ((mb["ret"] - v) ** 2).mean()

            vloss, grads = jax.value_and_grad(vloss_fn)(cp)
            upd, opt_state = self.optimizer.update(grads, opt_state, cp)
            return (optax.apply_updates(cp, upd), opt_state), vloss

        (critic_params, opt_state), vlosses = jax.lax.scan(
            critic_step,
            (params["critic"], ts.opt_state),
            None,
            length=self.optim_critic_iters,
        )
        params["critic"] = critic_params
        ts = ts.replace(params=params, opt_state=opt_state, step=ts.step + 1)
        metrics = {"value_loss": vlosses.mean()}
        metrics.update(extra)
        return ts, metrics


class TRPO(NPG):
    """NPG + backtracking line search under a hard KL constraint
    (reference ``trpo.py:191``)."""

    def __init__(
        self,
        *args,
        max_kl: float = 0.01,
        backtrack_coeff: float = 0.8,
        max_backtracks: int = 10,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.max_kl = max_kl
        self.backtrack_coeff = backtrack_coeff
        self.max_backtracks = max_backtracks

    def _surrogate(self, dist_new, mb, adv):
        """TRPO optimizes the importance-ratio surrogate
        (``trpo.py:120-123``)."""
        logp, _ = self._log_prob_entropy(dist_new, mb["act"])
        ratio = jnp.exp(logp - mb["logp_old"])
        return -(ratio * adv).mean()

    def _actor_step(self, ts, mb, adv):
        flat0, unravel, d, dFd, dist_old, surrogate_flat, kl_flat = (
            self._natural_gradient(ts, mb, adv)
        )
        # full step along d that the quadratic KL model puts at max_kl
        full_step = jnp.sqrt(2.0 * self.max_kl / (dFd + 1e-12))
        loss0 = surrogate_flat(flat0)

        fracs = self.backtrack_coeff ** jnp.arange(self.max_backtracks)

        def eval_frac(frac):
            p = flat0 - frac * full_step * d
            return surrogate_flat(p), kl_flat(p)

        losses, kls = jax.vmap(eval_frac)(fracs)
        ok = (kls < self.max_kl) & (losses < loss0)
        # first acceptable fraction; if none, keep old params
        first = jnp.argmax(ok)
        any_ok = jnp.any(ok)
        frac = jnp.where(any_ok, fracs[first], 0.0)
        new_flat = flat0 - frac * full_step * d
        return unravel(new_flat), {
            "accepted": any_ok.astype(jnp.float32),
            "kl": kls[first],
        }
