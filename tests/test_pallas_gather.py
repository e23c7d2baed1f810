"""Pallas gather+decode kernel (ops/pallas_gather.py): interpreter-mode
correctness on CPU (the same kernel lowers natively on TPU; see the
module docstring for measured TPU numbers)."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.ops.pallas_gather import gather_rows_cast


def test_gather_rows_cast_interpret_matches_xla():
    R, F, B = 64, 16 * 8, 40
    storage = (
        jnp.arange(R * F, dtype=jnp.int32) % 251
    ).astype(jnp.uint8).reshape(R, F)
    idx = jax.random.randint(jax.random.key(0), (B,), 0, R, dtype=jnp.int32)
    ref = np.asarray(storage[idx].astype(jnp.bfloat16), np.float32)
    got = np.asarray(
        gather_rows_cast(storage, idx, interpret=True), np.float32
    )
    np.testing.assert_array_equal(ref, got)


def test_gather_rows_cast_fallback_on_unaligned():
    # F not divisible by 8 -> jnp fallback, still correct
    R, F, B = 16, 13, 9
    storage = (
        jnp.arange(R * F, dtype=jnp.int32) % 251
    ).astype(jnp.uint8).reshape(R, F)
    idx = jnp.asarray([0, 5, 2, 15, 7, 1, 1, 3, 8], jnp.int32)
    got = np.asarray(gather_rows_cast(storage, idx), np.float32)
    ref = np.asarray(storage[idx].astype(jnp.bfloat16), np.float32)
    np.testing.assert_array_equal(ref, got)
