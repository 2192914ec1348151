"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed with Arrow-batched pandas
iterators (``mapInPandas``).

The decode step itself is STUBBED — the image/audio libraries are not
in this container — behind ``decode_image_stub``, which produces a
deterministic fake (header-derived metadata) with the *real* Spark
plumbing: schema contracts, Arrow batch iteration, partition-level
parallelism, and a binary-safe frame-sampling API. Swapping the stub
for Pillow/ffmpeg changes one inner function, not the operator.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` modest for large blobs
and repartition by a content hash so hot keys don't pin one executor.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from any string column: payload is
    the utf-8 bytes, kind cycles by id. Lets the whole pipeline run
    end-to-end in this container."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.create_map(F.lit("src"), F.lit("synthetic")).alias("meta"),
    )


def _decode_one(payload: bytes, kind: str) -> dict[str, Any]:
    """STUB decode. A real build calls Pillow / soundfile / pyav here.
    Deterministic fake: dimensions derived from payload length/content."""
    import hashlib

    n = len(payload)
    if kind == "image":
        width, height = (n % 640) + 1, (n % 480) + 1
    elif kind == "audio":
        width, height = n, 1  # samples × channels
    else:
        width, height = (n % 1920) + 1, (n % 1080) + 1
    return {
        "n_bytes": n,
        "width": width,
        "height": height,
        "checksum": hashlib.md5(payload).hexdigest(),
    }


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over a media DataFrame.

    Real plumbing, stubbed codec: `mapInPandas` streams Arrow batches
    through Python once — no per-row Python round trips.
    """

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                d = _decode_one(bytes(payload), kind)
                d["media_id"] = media_id
                d["kind"] = kind
                out.append(d)
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "n_bytes", "width", "height", "checksum"]
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing (stub codec): payload-in → payload-out through one
    Arrow pass, the shape of a real thumbnail/model-input resize stage.

    A real build decodes with Pillow, resizes, re-encodes; the stub
    derives a deterministic fixed-size payload (md5-keyed repetition of
    the source bytes truncated/padded to width*height/64) so tests can
    assert the contract: output payload size is a pure function of the
    target dims, input order is preserved within a partition, and the
    binary column round-trips through Arrow unharmed. Only images are
    resized; other kinds pass through with width/height = -1.
    """
    target = max(1, width * height // 64)

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                if kind == "image":
                    seed = hashlib.md5(b).digest()
                    body = (seed * (target // len(seed) + 1))[:target]
                    out.append((media_id, kind, body, width, height))
                else:
                    out.append((media_id, kind, b, -1, -1))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "payload", "width", "height"]
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled "frame" offset.
    For real video this is the keyframe index; here offsets stride the
    payload. Demonstrates the explode-shaped (UDTF-like) media op."""
    return (
        df.withColumn("n", F.length("payload"))
        .withColumn(
            "frame_offset",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(every_n_bytes))),
        )
        .select("media_id", "kind", "frame_offset")
    )
