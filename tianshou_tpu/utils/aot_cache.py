"""Framework-side cache for AOT-compiled XLA executables.

Why this exists: XLA's persistent compilation cache cannot round-trip
AUTO-layout executables on the axon TPU backend (cache reads fail with
``INVALID_ARGUMENT`` and can poison same-named entries — round-4
measurement, docs/PERFORMANCE.md).  This module provides (a)
:func:`compile_uncached`, which quarantines the persistent cache around a
compile so AUTO executables can never poison real entries (the config
flag ``jax_enable_compilation_cache=False`` is NOT honored on this
backend — entries still get written; redirecting the cache *directory*
is), and (b) a content-addressed store of ``serialize_executable``
payloads:

- key = sha256(lowered StableHLO text, jax version, device kind), so any
  change to the traced program, library, or hardware misses cleanly;
- entries live under ``$TIANSHOU_TPU_AOT_CACHE`` (default
  ``/tmp/jax_cache_auto``), one pickle of ``(payload, in_tree, out_tree)``
  per key;
- a failed load (backend restart, version skew, truncated file) deletes
  the entry and reports a miss — callers fall back to compiling.

CAVEAT (why the trainer does NOT load AUTO executables from this store on
the axon backend): serialization round-trips fine, but a DESERIALIZED
executable demands arguments already laid out in its non-default
parameter layouts, and nothing outside an executable can construct those
on this backend — ``device_put`` (device->device or host->device, with an
explicit tiled ``Format``) and a jitted identity with pinned
``out_shardings`` all produce a *different* physical layout than
requested (measured: asked ``(3,1,2,0)/(8,128)``-tiled, got
``(1,2,3,0)/(4,128)``).  Only the process that compiled an AUTO
executable can feed it, so cross-process reuse is limited to programs
whose parameter layouts are default (which the plain XLA cache already
handles).  See ``OffPolicyTrainer._compile_superstep``.
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
            payload, in_tree, out_tree, num_devices = pickle.load(f)
        # reload onto the SAME device count it was compiled for: the
        # default is every addressable device, which breaks single-device
        # executables under a forced multi-device (virtual mesh) runtime
        return deserialize_and_load(
            payload, in_tree, out_tree,
            execution_devices=jax.devices()[:num_devices],
        )
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
        fmts = jax.tree.leaves(
            compiled.input_formats,
            is_leaf=lambda x: type(x).__name__ == "Format",
        )
        num_devices = (
            len(fmts[0].sharding.device_set) if fmts else 1
        )
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree, num_devices), f)
        os.replace(tmp, path)
        return True
    except Exception:
        return False


def compile_uncached(lowered):
    """Compile WITHOUT touching the real XLA persistent cache.

    ``jax_enable_compilation_cache=False`` is NOT honored on the axon
    backend (measured: entries still get written — the plugin drives the
    cache below the config check), and an AUTO-layout executable written
    under a plain entry's key is exactly the poisoning this module exists
    to avoid.  So instead the cache *directory* is redirected to a
    throwaway quarantine dir for the duration of the compile; colliding
    writes land there and never shadow real entries."""
    import tempfile

    quarantine = tempfile.mkdtemp(prefix="jax_cache_quarantine_")
    # The quarantine dir is NOT restored afterwards: cache writes on this
    # backend can land asynchronously AFTER compile() returns (observed: a
    # superstep entry appearing in the real cache seconds after a
    # dir-scoped redirect was reverted), so restoring would re-expose the
    # real cache to the late write.  A process that opts into an
    # uncached compile accepts that ITS later compiles are not
    # persistently cached either; the tiny quarantine dir is garbage in
    # /tmp, reaped by the OS.
    jax.config.update("jax_compilation_cache_dir", quarantine)
    return lowered.compile()
