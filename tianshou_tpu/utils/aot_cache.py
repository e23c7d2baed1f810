"""Framework-side cache for AOT-compiled XLA executables.

Why this exists: XLA's persistent compilation cache cannot round-trip
AUTO-layout executables on the axon TPU backend (cache reads fail with
``INVALID_ARGUMENT`` and can poison same-named entries — round-4
measurement, docs/PERFORMANCE.md), which blocked shipping the +14%
AUTO-layout superstep by default.  ``jax.experimental.serialize_executable``
*does* round-trip those executables (verified on the same backend), so this
module keeps its own content-addressed store of serialized executables:

- key = sha256(lowered StableHLO text, jax version, device kind), so any
  change to the traced program, library, or hardware misses cleanly;
- entries live under ``$TIANSHOU_TPU_AOT_CACHE`` (default
  ``/tmp/jax_cache_auto``), one pickle of ``(payload, in_tree, out_tree)``
  per key;
- a failed load (backend restart, version skew, truncated file) deletes
  the entry and reports a miss — callers fall back to compiling.

The XLA persistent cache is temporarily disabled around compiles routed
through :func:`compile_uncached` so the poisoned-entry failure mode cannot
occur at all.
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax

__all__ = ["aot_cache_key", "load_compiled", "store_compiled", "compile_uncached"]


def _cache_dir() -> str:
    d = os.environ.get("TIANSHOU_TPU_AOT_CACHE", "/tmp/jax_cache_auto")
    os.makedirs(d, exist_ok=True)
    return d


def aot_cache_key(lowered, extra: str = "") -> str:
    """Content hash of a ``jax.stages.Lowered`` program + environment."""
    dev = jax.devices()[0]
    blob = "\x00".join(
        [
            lowered.as_text(),
            jax.__version__,
            getattr(dev, "device_kind", dev.platform),
            extra,
        ]
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:32]


def load_compiled(key: str):
    """Deserialize a cached executable; None on miss or failed load."""
    path = os.path.join(_cache_dir(), key + ".pkl")
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental.serialize_executable import deserialize_and_load

        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        return deserialize_and_load(payload, in_tree, out_tree)
    except Exception:
        try:
            os.remove(path)  # stale/corrupt entry: self-heal to a miss
        except OSError:
            pass
        return None


def store_compiled(key: str, compiled) -> bool:
    """Serialize an executable into the cache (atomic rename)."""
    path = os.path.join(_cache_dir(), key + ".pkl")
    try:
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        return True
    except Exception:
        return False


def compile_uncached(lowered):
    """Compile with the XLA persistent cache disabled (see module doc)."""
    try:
        prev = jax.config.jax_enable_compilation_cache
        jax.config.update("jax_enable_compilation_cache", False)
    except Exception:
        prev = None
    try:
        return lowered.compile()
    finally:
        if prev is not None:
            jax.config.update("jax_enable_compilation_cache", prev)
