"""Make a system pure-Python ``google.protobuf`` visible to THIS process.

transformWithStateInPandas's Python worker drives the JVM state server
over a protobuf socket protocol (`pyspark/sql/streaming/
stateful_processor_api_client.py`), so executing the operator needs the
``google.protobuf`` runtime in BOTH the driver and every Python worker.
The container has no pip-installed protobuf, but the google-cloud-sdk
tree ships the pure-Python runtime 6.32.0 under a plain
``google.protobuf`` namespace. pyspark 4.1.2's generated
``StateMessage_pb2`` was built by protoc 6.33.0, one MINOR ahead — the
wire format and generated-code API are identical across that gap; only
the runtime's version validator refuses to load it. So: put the system
copy on ``sys.path`` and relax the validator by exactly that one minor
version (6.32 -> accept 6.33 gencode), nothing broader.

This file is a ``sitecustomize`` so that Spark's forked Python workers
(which inherit ``PYTHONPATH`` containing this directory) apply the same
shim at interpreter startup, before ``pyspark.worker`` lazily imports
the pb2 module. ``tests/conftest.py`` runs `_activate()` directly for
the already-started driver process and exports the PYTHONPATH for
workers. Everything is try/except-gated: on boxes without the cloud-sdk
copy (or with a real protobuf installed) this is a no-op and the
transformWithState test keeps its skipif.
"""

import os
import sys

_SYSTEM_PROTOBUF_HOME = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _activate() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True  # a real protobuf is installed; don't touch anything
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_SYSTEM_PROTOBUF_HOME, "google", "protobuf")):
        return False
    if _SYSTEM_PROTOBUF_HOME not in sys.path:
        sys.path.append(_SYSTEM_PROTOBUF_HOME)
    # The probe above may have cached ``google``/``google.protobuf`` as
    # NAMESPACE packages: spark-core's jar sits on the worker's
    # PYTHONPATH and contains bare ``google/protobuf/*.proto`` entries,
    # a namespace portion with no ``__init__``. A cached namespace
    # package never upgrades to the regular package that just became
    # visible (``_NamespacePath._recalculate`` collects only namespace
    # portions), so drop the stale modules and re-resolve.
    # Purge ONLY the 'google' namespace root and 'google.protobuf*'
    # entries — dropping every google.* module here could invalidate
    # already-imported unrelated namespace packages (google.auth pulled
    # in by a pytest plugin), leaving stale class identities in other
    # modules (ADVICE r4). Re-importing 'google' after the protobuf
    # portion appears is enough for the namespace path to pick it up.
    import importlib

    for _mod in [
        m
        for m in sys.modules
        if m == "google" or m == "google.protobuf" or m.startswith("google.protobuf.")
    ]:
        del sys.modules[_mod]
    importlib.invalidate_caches()
    try:
        from google.protobuf import runtime_version as rv

        # validator reads module globals at call time; widen by ONE minor
        if (rv.MAJOR, rv.MINOR, rv.PATCH) == (6, 32, 0):
            rv.MINOR, rv.PATCH, rv.SUFFIX = 33, 99, ""
        return True
    except Exception:
        return False


_activate()
