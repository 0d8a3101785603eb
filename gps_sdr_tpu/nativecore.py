"""Lazy gate for the native host evaluator core (_evalcore bindings).

`native_evalcore()` returns the binding module, or False when the
shared library is unavailable or GSDR_EVALCORE=0 (the equivalence-test
switch, mirroring GSDR_NAVSCAN).  Callers keep their numpy paths as
the semantic source of truth and consult this gate per call — cheap
(module-global memo) and late enough that tests can flip the env var
between calls."""

from __future__ import annotations

import os

_core = None


def native_evalcore():
    """The _evalcore binding module, or False."""
    global _core
    if os.environ.get("GSDR_EVALCORE", "1") == "0":
        return False
    if _core is None:
        try:
            from gps_sdr_tpu import _evalcore
            _core = _evalcore
        except ImportError as e:
            import warnings
            warnings.warn(f"native evalcore unavailable, using the "
                          f"numpy host path ({e})", RuntimeWarning,
                          stacklevel=2)
            _core = False
    return _core
