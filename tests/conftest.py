import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

# transformWithState needs google.protobuf in driver AND workers; the
# container has the pure-Python runtime only inside the cloud-sdk tree.
# Activate the shim here (driver side) and export it via PYTHONPATH so
# Spark's forked Python workers run the same sitecustomize — this must
# happen before the session fixture starts the JVM, which snapshots env.
_PBSHIM = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "pbshim"
)
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "_pbshim_sitecustomize", os.path.join(_PBSHIM, "sitecustomize.py")
)
_pbshim_sitecustomize = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_pbshim_sitecustomize)
if _pbshim_sitecustomize._activate():
    os.environ["PYTHONPATH"] = (
        _PBSHIM + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)


@pytest.fixture(scope="session")
def spark():
    from frontpage_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("tests", master="local[4]")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
    s.stop()
