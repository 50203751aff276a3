"""Protobuf availability gate for transformWithStateInPandas.

This container ships no ``protobuf`` distribution and has no network, so
PySpark 4's Python state-server client (which executes the generated
``StateMessage_pb2`` module) could previously never run -- both live
StatefulProcessor faces were import-gated skips. ``ensure_protobuf``
closes that gap with the repo's minimal clean-room runtime shim
(``vendor/pbshim`` -- wire format + descriptor parsing only, written
against the public protobuf encoding spec):

- a REAL protobuf installation always wins (the shim is only added to
  ``sys.path`` when ``google.protobuf`` is absent);
- the DRIVER gets the shim via ``sys.path``;
- Python WORKERS (where the state client actually runs) get it via
  ``SparkContext.addPyFile`` on a zip of the shim, which reaches workers
  mid-session without restarting the JVM.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile

_VENDOR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "vendor", "pbshim")
_zip_path: str | None = None


def _shim_zip() -> str:
    """Zip the shim package once per process (addPyFile needs a file)."""
    global _zip_path
    if _zip_path is None or not os.path.exists(_zip_path):
        fd, path = tempfile.mkstemp(prefix="pbshim_", suffix=".zip")
        os.close(fd)
        with zipfile.ZipFile(path, "w") as z:
            for root, _dirs, files in os.walk(_VENDOR):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, _VENDOR))
        _zip_path = path
    return _zip_path


def ensure_protobuf(spark=None) -> str:
    """Make ``google.protobuf`` importable on the driver (and on workers
    when ``spark`` is given). Returns 'real' when a genuine installation
    is present, else 'shim' after installing the shim path. Raises
    ImportError only if even the shim cannot import."""
    try:
        import google.protobuf  # noqa: F401
        kind = ("shim" if "pbshim" in getattr(
            google.protobuf, "__file__", "") else "real")
    except ImportError:
        if _VENDOR not in sys.path:
            sys.path.insert(0, _VENDOR)
        # Purge only the namespace package root and the protobuf subtree:
        # a bare startswith("google") would also evict unrelated modules
        # (googleapis_common_protos, other google.* packages), leaving
        # stale duplicates on re-import (ADVICE r4).
        for m in [m for m in sys.modules
                  if m == "google" or m.startswith("google.protobuf")]:
            del sys.modules[m]
        import google.protobuf  # noqa: F401  (raises if shim broken)
        kind = "shim"
    if kind == "shim" and spark is not None:
        spark.sparkContext.addPyFile(_shim_zip())
    return kind
