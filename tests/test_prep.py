"""End-to-end training-data prep pipeline (ext/prep.py): funnel
monotonicity, stage semantics on planted rows, split write, and
bit-level rerun determinism."""

import os

import pytest
from pyspark.sql import functions as F

from frontpage_spark.ext import prep

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    first = docs.orderBy("doc_id").first()
    planted = spark.createDataFrame(
        [
            (900001, first.text),                  # exact dup of doc 0 (higher id loses)
            (900002, "tiny doc"),                  # fails min_tokens
            (900003, "spam " * 40),                # fails distinct_ratio + entropy
            (900004, "the secret benchmark answer is forty two exactly here now ok"),
        ],
        ["doc_id", "text"],
    )
    return docs.unionByName(planted)


@pytest.fixture(scope="module")
def bench_df(spark):
    return spark.createDataFrame(
        [("the secret benchmark answer is forty two exactly",)], ["text"]
    )


def test_prep_corpus_funnel_and_stages(spark, corpus, bench_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("prep") / "corpus")
    prepared, funnel = prep.prep_corpus(corpus, bench_df, out_path=out)
    stages = {r.stage: r.n for r in funnel.collect()}
    n_in = corpus.count()
    assert stages["input"] == n_in
    # monotone funnel
    order = ["input", "quality", "exact_dedup", "near_dedup", "decontaminated"]
    for a, b in zip(order, order[1:]):
        assert stages[a] >= stages[b]

    kept = {r.doc_id for r in prepared.select("doc_id").collect()}
    assert 900001 not in kept  # exact dup dropped (lower id kept)
    assert 900002 not in kept  # too short
    assert 900003 not in kept  # degenerate repetition
    assert 900004 not in kept  # contaminated by benchmark 8-gram
    assert 0 in kept

    # written split partitions are disjoint+exhaustive and readable
    back = spark.read.parquet(out)
    assert back.count() == prepared.count()
    assert set(r.split for r in back.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }
    # ids column actually encodes: no nulls, OOV marked 0
    assert back.filter(F.col("ids").isNull()).count() == 0

    # rerun determinism, any partitioning: same rows, same ids
    prepared2, _ = prep.prep_corpus(corpus.repartition(7), bench_df)
    a = sorted((r.doc_id, tuple(r.ids), r.split) for r in prepared.collect())
    b = sorted((r.doc_id, tuple(r.ids), r.split) for r in prepared2.collect())
    assert a == b


def test_bpe_train_hand_corpus(spark):
    """Learned merges on a hand-checkable corpus: 'low low low lower
    newest newest' — classic BPE example. Pair counts: (l,o)x4, (o,w)x4,
    (w,e)x2(lower,newest)... argmax ties break on (lhs, rhs) binary order."""
    from frontpage_spark.ext.prep import bpe_train

    docs = spark.createDataFrame(
        [(1, "low low low lower newest newest")], ["doc_id", "text"]
    )
    merges, state = bpe_train(docs, "text", n_merges=3)
    state.unpersist()
    # (l,o):4 and (o,w):4 tie -> 'l'<'o' wins; then (lo,w):4 unique max;
    # then ties at 2: (e,s),(e,w),(s,t),(n,e),(w,e) -> 'e','s' first
    assert merges == [(1, "l", "o"), (2, "lo", "w"), (3, "e", "s")]


def test_bpe_encode_counts(spark):
    """After merging 'low' into one symbol, each 'low' word is 1 BPE
    token; chars are preserved."""
    from frontpage_spark.ext.prep import bpe_train

    docs = spark.createDataFrame([(1, "low low low")], ["doc_id", "text"])
    merges, state = bpe_train(docs, "text", n_merges=2)
    row = state.first()
    assert merges == [(1, "l", "o"), (2, "lo", "w")]
    assert row["word"] == "low" and row["st"] == "•low•" and row["wc"] == 3
    state.unpersist()


def test_chunk_documents_overlap_and_tail(spark):
    """chunk_documents: stride-48/size-64 windows cover every word,
    adjacent chunks overlap by size-stride words, the tail is ragged,
    and gap configurations (stride > size) are rejected."""
    import pytest

    from frontpage_spark.ext.prep import chunk_documents

    words = [f"w{i}" for i in range(130)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_words"])
        for r in chunk_documents(docs).collect()
    }
    # doc 1: starts 0,48,96 -> 3 chunks; full coverage with 16-word overlap
    assert [k[1] for k in sorted(rows) if k[0] == 1] == [0, 1, 2]
    assert rows[(1, 0)][0].split() == words[0:64]
    assert rows[(1, 1)][0].split() == words[48:112]
    assert rows[(1, 2)] == (" ".join(words[96:130]), 34)  # ragged tail
    assert rows[(1, 0)][0].split()[48:] == rows[(1, 1)][0].split()[:16]
    # short doc: one chunk, n_words = all of them
    assert rows[(2, 0)] == ("a b c", 3)
    # empty text: split('') is [''] — one empty chunk, consistent with
    # the DuckDB oracle's string_split semantics
    assert rows[(3, 0)][1] == 1
    # NULL text folds into the empty-doc contract (ADVICE r7): one empty
    # chunk, never a garbage (n_words=64/-1) row
    assert rows[(4, 0)] == ("", 1)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, size=8, stride=9)
