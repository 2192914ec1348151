"""Python-worker daemon with pre-forked library preloading.

`spark.python.daemon.module=frontpage_spark.daemon_preload` makes every
forked Python worker inherit ALREADY-IMPORTED numpy / pandas / pyarrow
via copy-on-write, instead of each worker paying the ~0.5-1 s import at
first use. The engine's Arrow-batched stages (HTML extraction,
multimodal codecs, blocked GEMM) are seconds long but their REAL
per-row CPU is small — on a 32-core executor a 64-task pandas stage
otherwise spends 64 x import >> actual work. This is the standard
pre-fork server trick (mod_wsgi, gunicorn --preload) applied to
pyspark.daemon; on a 1000-executor cluster it removes the import tax
from every Python stage with zero semantic change.

The preload is best-effort: a worker environment without these
libraries just falls back to normal lazy imports.
"""

for _mod in ("numpy", "pandas", "pyarrow", "pyarrow.pandas_compat"):
    try:  # pragma: no cover - trivial import loop
        __import__(_mod)
    except Exception:
        pass

# Hand control to the stock daemon: same protocol, same socket handshake.
from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
