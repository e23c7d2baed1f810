"""Readable-representation and pickle-migration mixins.

This is the TPU-native equivalent of the reference's cosmetic object-
representation cluster — ``ToStringMixin`` (``tianshou/utils/string.py``,
a 536-line vendored copy of ``sensai.util.string``),
``DataclassPPrintMixin`` (``tianshou/utils/print.py:7``) and the pickle
state-migration helpers ``setstate``/``getstate``
(``tianshou/utils/pickle.py:8,56``).  We implement the same *capability*
in a compact, original form rather than vendoring sensAI:

- :class:`ToStringMixin` derives an informative ``repr`` from the
  instance state with recursion protection and field exclusion hooks.
- Array-valued fields (numpy / JAX) are summarized as
  ``f32[8,4]``-style shape/dtype signatures instead of dumping device
  buffers — reading a config object must never force a device->host
  transfer, which naive ``repr`` of a jax.Array would.
- :class:`DataclassPPrintMixin` pretty-prints dataclasses as dicts with
  optional field exclusion (used by the stats/config dataclasses).
- :func:`setstate` / :func:`getstate` let persisted objects (pickled
  :class:`~tianshou_tpu.highlevel.experiment.Experiment` configs) evolve
  across framework versions: renamed / newly-added / removed attributes
  are migrated at unpickle time.
"""

from __future__ import annotations

import pprint
import threading
from collections.abc import Mapping, Sequence
from dataclasses import asdict, fields, is_dataclass
from typing import Any

__all__ = [
    "ToStringMixin",
    "DataclassPPrintMixin",
    "to_string",
    "setstate",
    "getstate",
]

_MAX_SEQ_ITEMS = 8
_local = threading.local()


def _array_signature(x: Any) -> str | None:
    """``f32[8,4]``-style signature for numpy/JAX arrays, else None."""
    shape = getattr(x, "shape", None)
    dtype = getattr(x, "dtype", None)
    if shape is None or dtype is None or not hasattr(x, "__array__"):
        return None
    kind = str(dtype)
    kind = (
        kind.replace("float", "f").replace("uint", "u").replace("int", "i")
        .replace("bool", "b1").replace("complex", "c")
    )
    return f"{kind}[{','.join(map(str, shape))}]"


def to_string(x: Any, max_items: int = _MAX_SEQ_ITEMS) -> str:
    """Readable, recursion-safe, array-summarizing string conversion."""
    sig = _array_signature(x)
    if sig is not None:
        if getattr(x, "ndim", 1) == 0:  # scalars print their value
            return repr(x.item() if hasattr(x, "item") else x)
        return sig
    if isinstance(x, ToStringMixin):
        return repr(x)
    if isinstance(x, Mapping):
        items = list(x.items())
        body = ", ".join(f"{k}={to_string(v)}" for k, v in items[:max_items])
        if len(items) > max_items:
            body += f", ... <{len(items) - max_items} more>"
        return "{" + body + "}"
    if isinstance(x, (list, tuple)):
        seq = list(x)
        body = ", ".join(to_string(v) for v in seq[:max_items])
        if len(seq) > max_items:
            body += f", ... <{len(seq) - max_items} more>"
        return ("[" + body + "]") if isinstance(x, list) else "(" + body + ")"
    if isinstance(x, type):
        return x.__name__
    if callable(x) and hasattr(x, "__name__"):
        return x.__name__
    return repr(x)


class ToStringMixin:
    """Derive ``repr``/``str`` from instance state.

    Equivalent surface to the reference's ``ToStringMixin``
    (``tianshou/utils/string.py``): automatic ``ClassName(field=value,
    ...)`` rendering with per-class exclusion hooks and protection
    against infinite recursion on cyclic object graphs (a cycle renders
    as ``ClassName<...>``).
    """

    def _tostring_excludes(self) -> Sequence[str]:
        """Names of fields to omit (override in subclasses)."""
        return ()

    def _tostring_includes(self) -> Mapping[str, Any]:
        """Extra key/value pairs to render (override in subclasses)."""
        return {}

    def __repr__(self) -> str:
        stack: set[int] = getattr(_local, "stack", None) or set()
        _local.stack = stack
        if id(self) in stack:
            return f"{type(self).__name__}<...>"
        stack.add(id(self))
        try:
            if is_dataclass(self):
                state = {f.name: getattr(self, f.name) for f in fields(self) if f.repr}
            else:
                state = {
                    k: v
                    for k, v in vars(self).items()
                    if not k.startswith("_")
                }
            for k in self._tostring_excludes():
                state.pop(k, None)
            state.update(self._tostring_includes())
            body = ", ".join(f"{k}={to_string(v)}" for k, v in state.items())
            return f"{type(self).__name__}({body})"
        finally:
            stack.discard(id(self))

    __str__ = __repr__


class DataclassPPrintMixin:
    """Pretty-print a dataclass as a dict (reference
    ``tianshou/utils/print.py:7-29``)."""

    def pprints_asdict(
        self, exclude_fields: Sequence[str] | None = None, indent: int = 4
    ) -> str:
        d = asdict(self)  # type: ignore[call-overload]
        for f in exclude_fields or ():
            d.pop(f, None)
        header = f"{type(self).__name__}\n" + "-" * 40 + "\n"
        return header + pprint.pformat(d, indent=indent)

    def pprint_asdict(
        self, exclude_fields: Sequence[str] | None = None, indent: int = 4
    ) -> None:
        print(self.pprints_asdict(exclude_fields=exclude_fields, indent=indent))


def setstate(
    cls: type,
    obj: Any,
    state: dict[str, Any],
    renamed_properties: dict[str, str] | None = None,
    new_optional_properties: Sequence[str] | None = None,
    new_default_properties: dict[str, Any] | None = None,
    removed_properties: Sequence[str] | None = None,
) -> None:
    """Forward-compatible ``__setstate__`` helper (reference
    ``tianshou/utils/pickle.py:8-55``): migrate a pickled state dict from
    an older framework version, then delegate to the superclass
    ``__setstate__`` if one exists."""
    for old, new in (renamed_properties or {}).items():
        if old in state:
            state[new] = state.pop(old)
    for name in new_optional_properties or ():
        state.setdefault(name, None)
    for name, value in (new_default_properties or {}).items():
        state.setdefault(name, value)
    for name in removed_properties or ():
        state.pop(name, None)
    sup = super(cls, obj)
    if hasattr(sup, "__setstate__"):
        sup.__setstate__(state)
    else:
        obj.__dict__ = state


def getstate(
    cls: type,
    obj: Any,
    transient_properties: Sequence[str] | None = None,
    excluded_properties: Sequence[str] | None = None,
    excluded_default_properties: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """``__getstate__`` helper (reference ``tianshou/utils/pickle.py:56+``):
    drop transient/excluded attributes before pickling; attributes whose
    value equals a given default are omitted (re-added by
    :func:`setstate` defaults on load)."""
    sup = super(cls, obj)
    if hasattr(sup, "__getstate__") and sup.__getstate__() is not None:
        state = dict(sup.__getstate__())
    else:
        state = dict(obj.__dict__)
    for name in tuple(transient_properties or ()) + tuple(excluded_properties or ()):
        state.pop(name, None)
    for name, default in (excluded_default_properties or {}).items():
        if name in state and state[name] == default:
            del state[name]
    return state
