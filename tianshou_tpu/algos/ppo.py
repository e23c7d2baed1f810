"""PPO: clipped surrogate objective with optional dual/value clipping.

TPU-native counterpart of ``tianshou/policy/modelfree/ppo.py:32``
(``PPOPolicy``), the reference's flagship on-policy algorithm: ``logp_old``
is recorded during the collect scan (instead of a separate no-grad pass,
``ppo.py:129-143``); the clipped/dual-clipped surrogate + value-clip losses
(``ppo.py:146-213``) run per shuffled minibatch; per-minibatch advantage
normalization matches ``ppo.py:162-164``; ``recompute_advantage`` per repeat
(``ppo.py:156-158``) is honored by the on-policy trainer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.algos.a2c import A2C

__all__ = ["PPO"]


class PPO(A2C):
    def __init__(
        self,
        *args,
        eps_clip: float = 0.2,
        dual_clip: float | None = None,
        value_clip: bool = False,
        adv_norm: bool = True,
        recompute_advantage: bool = False,
        **kwargs,
    ):
        kwargs["adv_norm"] = adv_norm
        super().__init__(*args, **kwargs)
        assert dual_clip is None or dual_clip > 1.0
        self.eps_clip = eps_clip
        self.dual_clip = dual_clip
        self.value_clip = value_clip
        self.recompute_advantage = recompute_advantage

    def _policy_loss(self, logp, ent, mb, adv):
        ratio = jnp.exp(logp - mb["logp_old"])
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - self.eps_clip, 1.0 + self.eps_clip) * adv
        clipped = jnp.minimum(surr1, surr2)
        if self.dual_clip is not None:
            clipped = jnp.where(
                adv < 0, jnp.maximum(clipped, self.dual_clip * adv), clipped
            )
        return -clipped.mean()

    def _value_loss(self, v, mb):
        if self.value_clip:
            v_clip = mb["v_s"] + jnp.clip(
                v - mb["v_s"], -self.eps_clip, self.eps_clip
            )
            return jnp.maximum(
                (mb["ret"] - v) ** 2, (mb["ret"] - v_clip) ** 2
            ).mean()
        return ((mb["ret"] - v) ** 2).mean()
