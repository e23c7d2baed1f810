"""Pallas TPU kernel: fused replay-row gather + uint8 -> bfloat16 decode.

The presample path of a pixel DQN pipeline gathers `updates x batch`
random uint8 frame rows from the HBM replay ring and converts them to the
conv compute dtype.  XLA lowers this as gather -> relayout copy ->
convert (measured ~121 GB/s effective on the round-4 rig); this kernel
fuses the three into one pass — each grid step DMAs ONE sampled row
HBM->VMEM via a scalar-prefetched index (``PrefetchScalarGridSpec``: the
index array is available before the body runs, so the block ``index_map``
itself performs the gather) and writes the bf16 row out.

Measured (TPU v5e, 13312 rows x 28224 B, under parity-fleet contention):
8.61 ms vs XLA's 9.29 ms — ~8% faster, and both within ~10% of what this
platform sustains for random row gather+decode, i.e. XLA is already near
the memory-path ceiling here (full accounting in docs/PERFORMANCE.md
round-4 MFU investigation).  Exposed as an opt-in op; the default
pipeline keeps the XLA path.

TPU tiling constraint: a block's last two dims must be 8/128-divisible or
span the array, so rows are viewed as ``[R, 8, F/8]`` (F must divide by
8 — pad the feature dim upstream otherwise).  The in-kernel cast routes
u8 -> i32 -> bf16 (direct u8->bf16 is not lowered on this backend).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gather_rows_cast"]


def _kernel(idx_ref, in_ref, out_ref):
    del idx_ref  # consumed by the index_map (the gather itself)
    out_ref[...] = in_ref[...].astype(jnp.int32).astype(jnp.bfloat16)


def gather_rows_cast(
    storage: jax.Array, idx: jax.Array, interpret: bool = False
) -> jax.Array:
    """``storage [R, F] uint8, idx [B] int32 -> [B, F] bfloat16``.

    Pallas on TPU (``interpret=True`` runs the same kernel in interpreter
    mode for CPU tests); plain jnp on platforms without Pallas TPU
    support.
    """
    R, F = storage.shape
    B = idx.shape[0]
    use_pallas = interpret or jax.devices()[0].platform == "tpu"
    if not use_pallas or F % 8 != 0:
        return storage[idx].astype(jnp.bfloat16)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F8 = F // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, F8), lambda i, idx_ref: (idx_ref[i], 0, 0))
        ],
        out_specs=pl.BlockSpec((1, 8, F8), lambda i, idx_ref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, F8), jnp.bfloat16),
        interpret=interpret,
    )(idx.astype(jnp.int32), storage.reshape(R, 8, F8))
    return out.reshape(B, F)
