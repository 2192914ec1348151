"""Organic sf1 testdata generator (VERDICT r6 item 7).

The 10x/20x scale probes replicate sf0.1 with key offsets — fine for
plan-shape timing, but mirrored replicas inherit the small scale's
exact value distribution. This generates a TRUE sf1 directory with
fresh, organically-drawn data: same schema and distribution FAMILY as
the driver's sf0.1 tables (profiled in-session: uniform TPC-H-ish
domains, Poisson order/line fan-outs, exponential event values, a 5%
near-dup document family, unit-Gaussian embeddings with uniform
labels), 10x the rows, new RNG draws throughout — no row is a copy of
an sf0.1 row. region/nation are fixed dimensions and are copied
verbatim from sf0.1.

Output: ./testdata_sf1/ (gitignored, ~0.5 GB). Seed 777 so the
directory is reproducible but NOT correlated with the driver's seed-42
tables. Run: python tools/gen_sf1.py [out_dir]

Used by: SPARK_GRAFT_SF_DIR=$PWD/testdata_sf1 python bench.py
(published as BENCH_sf1_r07.json — validates that the bench suite's
fixed per-query costs amortize on organic 10x data, not just on
mirrored replicas).
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = 10  # vs sf0.1
N_CUST = 15_000 * SF
N_SUPP = 1_000 * SF
N_PART = 20_000 * SF
N_ORD = 150_000 * SF
N_LINE = 600_000 * SF
N_EVT = 100_000 * SF
N_USERS = 1_500 * SF
N_DOC = 5_000 * SF
N_EMB = 2_000 * SF

DAY = np.timedelta64(1, "D")
ORD_LO = np.datetime64("1995-01-01")
ORD_HI = np.datetime64("2001-08-01")
ORD_DAYS = int((ORD_HI - ORD_LO) / DAY) + 1

_WORDS = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_ADJ = ["large", "hot", "blue", "old", "cold", "dark", "light", "new", "tiny", "deep"]
_NOUN = ["ring", "bolt", "plate", "cap", "wheel", "pin", "rod", "cup", "gear", "nut"]
_PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "DELUXE"]
_ETYPES = ["click", "error", "purchase", "signup", "view"]
_LANGS = ["en", "de", "zh", "fr", "es"]
_LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _dates(rng, n):
    return ORD_LO + rng.integers(0, ORD_DAYS, n) * DAY


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(777)

    # fixed dims: copy verbatim (they do not scale with sf)
    for dim in ("region", "nation"):
        shutil.copyfile(
            f"/root/testdata/sf0.1/{dim}.parquet", os.path.join(out, f"{dim}.parquet")
        )
        print(f"  {dim}: copied (fixed dimension)")

    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
        "c_mktsegment": pa.array(np.array(_SEGMENTS)[rng.integers(0, 5, N_CUST)]),
    }))

    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
    }))

    adj = np.array(_ADJ)[rng.integers(0, len(_ADJ), N_PART)]
    noun = np.array(_NOUN)[rng.integers(0, len(_NOUN), N_PART)]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(N_PART), pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, N_PART)]),
        "p_type": pa.array(np.array(_PTYPES)[rng.integers(0, len(_PTYPES), N_PART)]),
        "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, N_PART), 2),
    }))

    odates = _dates(rng, N_ORD).astype("datetime64[us]")
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(N_ORD), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, N_ORD)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(_PRIORITIES)[rng.integers(0, 5, N_ORD)]),
    }))

    # lineitem in chunks (6M rows): uniform order fan-in (=> Poisson(4)
    # lines per order, ~2% orders lineless — matches the sf0.1 profile)
    chunk = 1_000_000
    writer = None
    for lo in range(0, N_LINE, chunk):
        n = min(chunk, N_LINE - lo)
        ship = (_dates(rng, n) + rng.integers(1, 96, n) * DAY).astype("datetime64[us]")
        t = pa.table({
            "l_orderkey": pa.array(rng.integers(0, N_ORD, n), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, N_PART, n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, N_SUPP, n), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, n), pa.int32()),
            "l_quantity": rng.integers(1, 51, n).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n), 2),
            "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
            "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n)]),
            "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n)]),
            "l_shipdate": pa.array(ship, pa.timestamp("us")),
        })
        if writer is None:
            writer = pq.ParquetWriter(os.path.join(out, "lineitem.parquet"), t.schema)
        writer.write_table(t)
    writer.close()
    print(f"  lineitem: {N_LINE} rows")

    evt_lo = np.datetime64("2024-01-01T00:00:00")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = evt_lo + rng.integers(0, span_us, N_EVT).astype("timedelta64[us]")
    ts = np.sort(ts)  # event logs arrive in time order
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(N_EVT), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVT), pa.int64()),
        "event_type": pa.array(np.array(_ETYPES)[rng.integers(0, 5, N_EVT)]),
        "value": np.round(rng.exponential(50.0, N_EVT), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVT)]),
    }))

    # documents: uniform 30-word vocab, 10-100 words, 5% 'dup' family
    # (copy an earlier doc, mutate 0-3 words, tag one position 'dup')
    texts: list[str] = []
    langs = rng.choice(_LANGS, N_DOC, p=_LANG_P)
    sources = [f"src{i}" for i in rng.integers(0, 20, N_DOC)]
    for i in range(N_DOC):
        if i > 50 and rng.random() < 0.05:
            w = texts[int(rng.integers(0, i))].split()
            for _ in range(int(rng.integers(0, 4))):
                w[int(rng.integers(0, len(w)))] = _WORDS[int(rng.integers(0, 30))]
            w[int(rng.integers(0, len(w)))] = "dup"
            texts.append(" ".join(w))
        else:
            nw = int(rng.integers(10, 101))
            texts.append(" ".join(np.array(_WORDS)[rng.integers(0, 30, nw)]))
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(N_DOC), pa.int64()),
        "text": texts,
        "lang": pa.array(langs),
        "source": pa.array(sources),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    # embeddings: unit-norm Gaussian rows, uniform labels (the sf0.1
    # profile shows no label cluster structure: within == cross cosine)
    V = rng.standard_normal((N_EMB, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
        "embedding": pa.array(list(V), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32()),
    }))
    print(f"wrote organic sf1 to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
