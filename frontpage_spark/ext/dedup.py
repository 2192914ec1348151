"""Deduplication operators over a document corpus.

Exact dedup, MinHash+LSH banding, SimHash, and exact n-gram Jaccard —
each expressed as DataFrame compositions of built-in functions (no
Python UDFs), so the whole pipeline stays inside whole-stage codegen
and scales by shuffle on content-derived keys.

Scale notes (100 TB):
- All shingle/minhash work is per-row array math (`transform`/
  `array_min`) — zero shuffle until the candidate-pair join.
- The candidate join shuffles on (band, minhash) — a content hash, so
  it distributes uniformly *except* for monster clusters (boilerplate
  docs). ``max_bucket`` caps those: LSH buckets larger than the cap are
  dropped (standard practice — a bucket of k docs implies k²/2 pairs).
- Portable hashing: md5 (identical in Spark and DuckDB) so every
  operator here is oracle-checkable; swap for xxhash64 when oracle
  parity is not needed (faster, same structure).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_BANDS = 4
DEFAULT_MAX_BUCKET = 100


def tokens_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles_col(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles; docs shorter than n shingle to the
    whole text. 1-based element_at matches the DuckDB oracle exactly."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(F.when(F.size(toks) >= n, grams).otherwise(F.array(c)))


def minhash_col(shingles: Column, band: int) -> Column:
    """One MinHash value: min over shingles of md5('b{band}:' || shingle).
    Lexicographic min over a keyed cryptographic hash ≈ an independent
    random permutation per band."""
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"b{band}:"), s))))


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bands: int = DEFAULT_BANDS
) -> DataFrame:
    """(id, band, minhash) — one row per band per doc. Narrow (no shuffle)."""
    sh = shingles_col(text_col)
    sigs = df.select(F.col(id_col), sh.alias("shingles"))
    banded = sigs.select(
        id_col,
        F.posexplode(F.array(*[minhash_col(F.col("shingles"), b) for b in range(bands)])).alias(
            "band", "minhash"
        ),
    )
    return banded


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = DEFAULT_BANDS,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Distinct candidate near-dup pairs (a < b) sharing any band bucket.

    Shuffles once on (band, minhash); buckets larger than ``max_bucket``
    are dropped before the self-join so a boilerplate cluster cannot
    produce a quadratic pair explosion.
    """
    sigs = minhash_signatures(df, id_col, text_col, bands)
    ok_buckets = (
        sigs.groupBy("band", "minhash")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") <= max_bucket)
        .drop("bucket_n")
    )
    bounded = sigs.join(ok_buckets, ["band", "minhash"])
    a = bounded.select(F.col("band"), F.col("minhash"), F.col(id_col).alias("a"))
    b = bounded.select(F.col("band"), F.col("minhash"), F.col(id_col).alias("b"))
    return (
        a.join(b, ["band", "minhash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def exact_dup_stats(df: DataFrame, text_col: str = "text", group_col: str = "source") -> DataFrame:
    """Exact-dup profile per group: docs, distinct texts (by md5), dups."""
    return (
        df.groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct(F.md5(F.col(text_col))).alias("n_distinct_texts"),
        )
        .withColumn("n_dup_docs", F.col("n_docs") - F.col("n_distinct_texts"))
    )


def simhash16(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash over distinct tokens: bit j of the signature is the
    majority vote over tokens of parity(md5(token || ':' || j)).

    Plan shape: two narrow explodes then two keyed aggregations — the
    shuffles are on (id, j) and (id), both fine-grained keys.
    """
    toks = df.select(F.col(id_col), F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"))
    bits = toks.select(
        id_col, "tok", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j")
    ).withColumn(
        "bit",
        (F.ascii(F.substring(F.md5(F.concat(F.col("tok"), F.lit(":"), F.col("j").cast("string"))), 1, 1)) % 2),
    )
    maj = (
        bits.groupBy(id_col, "j")
        .agg(F.sum(F.col("bit") * 2 - 1).alias("s"))
        .withColumn("maj", (F.col("s") > 0).cast("long"))
    )
    return maj.groupBy(id_col).agg(
        F.sum(F.col("maj") * F.expr("shiftleft(1L, j)")).alias("simhash")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    The inverted-index self-join shuffles on the shingle value; intended
    for a sampled/blocked subset — for full-corpus near-dup at scale use
    ``lsh_candidate_pairs`` first, then verify candidates with this.
    Jaccard emitted as a single exact double division (deterministic)."""
    sh = df.select(F.col(id_col), F.explode(shingles_col(text_col)).alias("shingle"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sza") + F.col("szb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
