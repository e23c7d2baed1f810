"""Tests for the repr/pprint/pickle-migration mixins
(`tianshou_tpu/utils/repr.py`) — the compact equivalent of the
reference's ToStringMixin / DataclassPPrintMixin / pickle helpers
(`tianshou/utils/{string,print,pickle}.py`)."""

import pickle
from dataclasses import dataclass, field

import numpy as np

from tianshou_tpu.utils.repr import (
    DataclassPPrintMixin,
    ToStringMixin,
    getstate,
    setstate,
    to_string,
)


def test_to_string_summarizes_arrays_without_dumping():
    s = to_string(np.zeros((8, 4), np.float32))
    assert s == "f32[8,4]"
    assert to_string(np.uint8(3)) == "3"  # scalars print values
    long = to_string(list(range(100)))
    assert "<92 more>" in long and "99" not in long


class _Cfg(ToStringMixin):
    def __init__(self):
        self.lr = 3e-4
        self.obs = np.zeros((64, 17), np.float32)
        self._private = "hidden"
        self.secret = "x"

    def _tostring_excludes(self):
        return ("secret",)


def test_tostring_mixin_excludes_and_summarizes():
    r = repr(_Cfg())
    assert r.startswith("_Cfg(") and "lr=0.0003" in r
    assert "f32[64,17]" in r
    assert "_private" not in r and "secret" not in r


def test_tostring_mixin_cycle_safe():
    class Node(ToStringMixin):
        def __init__(self):
            self.child = None

    a = Node()
    a.child = a
    assert "Node<...>" in repr(a)


@dataclass
class _Stats(DataclassPPrintMixin):
    returns_mean: float = 1.0
    secret: int = 7
    nested: dict = field(default_factory=lambda: {"a": 1})


def test_pprint_asdict_excludes_fields():
    s = _Stats().pprints_asdict(exclude_fields=["secret"])
    assert s.startswith("_Stats") and "returns_mean" in s and "secret" not in s


class _V2:
    """Simulates loading a pickle written by an older class version."""

    def __init__(self):
        self.new_name = 1.0
        self.added = "default"
        self._cache = object()  # transient, not pickled

    def __getstate__(self):
        return getstate(_V2, self, transient_properties=["_cache"])

    def __setstate__(self, state):
        setstate(
            _V2,
            self,
            state,
            renamed_properties={"old_name": "new_name"},
            new_default_properties={"added": "default"},
            removed_properties=["gone"],
        )


def test_pickle_migration_roundtrip():
    obj = _V2()
    blob = pickle.dumps(obj)
    re = pickle.loads(blob)
    assert re.new_name == 1.0 and re.added == "default"
    assert not hasattr(re, "_cache")
    # old-version state dict migrates
    stale = _V2.__new__(_V2)
    stale.__setstate__({"old_name": 5.0, "gone": 9})
    assert stale.new_name == 5.0 and stale.added == "default"
    assert not hasattr(stale, "gone") and not hasattr(stale, "old_name")
