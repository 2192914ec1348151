"""Property-based differential tests (SURVEY.md §5.5): the flagship
phone pipeline checked against an independent pure-Python model of the
documented semantics (SURVEY.md §2.5 F6) over hypothesis-generated
corpora."""

import re
import string

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from frontpage_spark import functions as FF

PUNCT = "".join(c for c in string.punctuation if c != "$")
TEXT = st.text(
    alphabet=string.ascii_lowercase + string.digits + " $-.()zeroonetwfuivsxgh",
    max_size=60,
)


def model_phone(text: str) -> list[str]:
    """Pure-Python model of F6: lower → strip punct (keep $) → drop
    spaces → spell out digits (zero..nine order) → digit runs → 7..11
    length filter → dedupe → sorted."""
    post = text.lower()
    post = "".join(c for c in post if c not in PUNCT)
    post = post.replace(" ", "")
    for word, digit in FF.WORD_DIGITS:
        post = post.replace(word, digit)
    runs = re.findall(r"\d+", post)
    return sorted({r for r in runs if 7 <= len(r) <= 11})


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=1, max_size=25))
def test_phone_candidates_matches_model(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: list(r["p"])
        for r in df.select("i", FF.phone_candidates("t").alias("p")).collect()
    }
    expected = {i: model_phone(t) for i, t in enumerate(texts)}
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=1, max_size=25))
def test_phone_candidates_invariants(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    for r in df.select(FF.phone_candidates("t").alias("p")).collect():
        vals = list(r["p"])
        assert vals == sorted(set(vals))  # deduped + deterministic order
        for v in vals:
            assert v.isdigit() and 7 <= len(v) <= 11


# ---- multimodal codec roundtrips (pure Python, no Spark session) ----------

@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=300),
    st.binary(min_size=16, max_size=16),
)
def test_bmp_roundtrip_property(w, h, seed):
    from frontpage_spark.ext import multimodal as mm

    b = mm.make_bmp(w, h, seed)
    assert mm.decode_bmp(b) == (w, h, 1)
    # spec-valid: declared file size matches actual length
    import struct

    assert struct.unpack_from("<I", b, 2)[0] == len(b)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=5000),
    st.integers(min_value=1, max_value=2),
    st.binary(min_size=16, max_size=16),
)
def test_wav_roundtrip_property(n_samples, channels, seed):
    from frontpage_spark.ext import multimodal as mm

    b = mm.make_wav(n_samples, seed, channels=channels)
    assert mm.decode_wav(b) == (n_samples, channels, 1)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=64).map(lambda x: x * 2),
    st.integers(min_value=1, max_value=32).map(lambda x: x * 2),
    st.integers(min_value=1, max_value=8),
    st.binary(min_size=16, max_size=16),
)
def test_y4m_roundtrip_property(w, h, frames, seed):
    from frontpage_spark.ext import multimodal as mm

    b = mm.make_y4m(w, h, frames, seed)
    assert mm.decode_y4m(b) == (w, h, frames)


# ---- balanced HTML scan vs stdlib html.parser reference -------------------

def _reference_div_text(html_src, cls):
    """Oracle extractor built on the stdlib event parser: text content of
    the first div whose class attribute contains `cls`, including nested
    markup, with the same whitespace/ascii cleanup."""
    from html.parser import HTMLParser

    class P(HTMLParser):
        def __init__(self):
            super().__init__()
            self.depth = 0
            self.buf = []
            self.done = False

        def handle_starttag(self, tag, attrs):
            if tag != "div":
                return
            if self.depth > 0:
                self.depth += 1
            elif not self.done and cls in dict(attrs).get("class", "").split():
                self.depth = 1

        def handle_endtag(self, tag):
            if tag == "div" and self.depth > 0:
                self.depth -= 1
                if self.depth == 0:
                    self.done = True

        def handle_data(self, data):
            if self.depth > 0 and not self.done:
                self.buf.append(data)

    p = P()
    p.feed(html_src)
    if not p.buf and not p.done and p.depth == 0:
        return None
    # round-8 contract: exact getText() — text nodes concatenate with
    # NO separator, \r\n dropped, ascii-ignore, trim; no ws collapsing
    txt = "".join(p.buf).replace("\r", "").replace("\n", "")
    txt = txt.encode("ascii", "ignore").decode()
    return txt.strip()


WORDS = st.lists(
    st.text(alphabet="abcdefg 123", min_size=1, max_size=8), min_size=1, max_size=4
).map(" ".join)


@st.composite
def nested_div_html(draw, depth=0):
    """Random well-formed HTML with nested divs and text."""
    parts = [draw(WORDS)]
    if depth < 3:
        for _ in range(draw(st.integers(min_value=0, max_value=2))):
            cls = draw(st.sampled_from(["x", "y", "postingBody q", ""]))
            inner = draw(nested_div_html(depth=depth + 1))
            parts.append(f'<div class="{cls}">{inner}</div>')
            parts.append(draw(WORDS))
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(nested_div_html(), WORDS)
def test_balanced_scan_matches_stdlib_parser(inner, filler):
    from frontpage_spark.html import _extract

    html_src = f'<html>{filler}<div class="postingBody">{inner}</div>{filler}</html>'
    got = _extract(html_src, "post_body")
    want = _reference_div_text(html_src, "postingBody")
    assert got == want


def model_entropy(text: str) -> float:
    import math
    from collections import Counter

    if not text:
        return 0.0
    n = len(text)
    s = sum(k * math.log2(k) for k in Counter(text).values())
    return math.log2(n) - s / n


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(alphabet="abcde €ß\n", max_size=40), min_size=1, max_size=12))
def test_char_entropy_matches_model(spark, texts):
    from frontpage_spark.ext.textstats import char_entropy, with_char_entropy

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    fold = {r["i"]: r["e"] for r in df.select("i", char_entropy("t").alias("e")).collect()}
    prof = {r["i"]: r["e"] for r in with_char_entropy(df, "t", "e").select("i", "e").collect()}
    for i, t in enumerate(texts):
        want = model_entropy(t)
        assert abs(fold[i] - want) < 1e-9, (t, fold[i], want)
        assert abs(prof[i] - want) < 1e-9, (t, prof[i], want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=300),
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=50),
)
def test_bloom_prune_property(spark, big_keys, small_keys):
    from frontpage_spark.plans import bloom_prune

    big = spark.createDataFrame([(k,) for k in big_keys], "k long")
    small = spark.createDataFrame([(k,) for k in small_keys] or [(0,)], "sk long")
    if not small_keys:
        small = small.filter("sk != 0")
    kept = {r.k for r in bloom_prune(big, small, "k", "sk", num_bits=1 << 12).collect()}
    # no false negatives, ever
    assert (set(big_keys) & set(small_keys)) <= kept
    if not small_keys:
        assert kept == set()


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=120),
    st.integers(min_value=1, max_value=80),
    st.binary(min_size=16, max_size=16),
)
def test_bmp_dhash_matches_closed_form(w, h, seed):
    """The honest BMP pixel walk (header data-offset, bottom-up padded
    rows) agrees with the closed form the DuckDB oracle uses (seed
    tiled over the pixel area) for arbitrary dimensions."""
    from frontpage_spark.ext import multimodal as mm

    hi, lo, ww, hh = mm._bmp_dhash(mm.make_bmp(w, h, seed))
    assert (ww, hh) == (w, h)
    rw = mm._bmp_row_size(w)

    def g(px, py):
        o = (h - 1 - py) * rw + px * 3
        return (seed[o % 16] + seed[(o + 1) % 16] + seed[(o + 2) % 16]) // 3

    ehi = elo = 0
    for j in range(8):
        py = j * h // 8
        row = [g(i * w // 9, py) for i in range(9)]
        bits = sum((1 << i) for i in range(8) if row[i + 1] > row[i])
        if j < 4:
            elo |= bits << (8 * j)
        else:
            ehi |= bits << (8 * (j - 4))
    assert (hi, lo) == (ehi, elo)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**64 - 1),
        min_size=2,
        max_size=24,
        unique=True,
    )
)
def test_hamming_near_dup_matches_bruteforce(spark, sigs):
    """Banded-join recall == 1 at radius 3 for ARBITRARY signatures:
    the operator's pair set equals the all-pairs popcount filter."""
    from frontpage_spark.ext import dedup

    rows = [(i, s >> 32, s & 0xFFFFFFFF) for i, s in enumerate(sigs)]
    df = spark.createDataFrame(rows, "media_id long, dhash_hi long, dhash_lo long")
    got = {(r["a"], r["b"], r["hamming"]) for r in dedup.hamming_near_dup(df).collect()}
    want = set()
    for i, si in enumerate(sigs):
        for j in range(i + 1, len(sigs)):
            d = bin(si ^ sigs[j]).count("1")
            if d <= 3:
                want.add((i, j, d))
    assert got == want


def test_cusum_reflection_identity(spark):
    """The window form s_i = P_i - min(0, min_{j<=i} P_j) used by
    cusum_revenue_alarms must equal the literal max-0 recurrence
    s_i = max(0, s_{i-1} + dev_i) on an adversarial series (sign
    flips, long negative runs, zero plateaus)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    devs = [3, -7, 5, 5, -1, -9, 0, 2, -2, 8, -20, 4, 4, 4]
    # ground truth: the recurrence
    s, truth = 0, []
    for d in devs:
        s = max(0, s + d)
        truth.append(s)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(devs)], ["i", "dev"]
    )
    w = Window.orderBy("i")
    out = (
        df.select("i", (F.sum("dev").over(w)).alias("p"))
        .select("i", (F.col("p") - F.least(F.lit(0), F.min("p").over(w))).alias("s"))
        .orderBy("i")
        .collect()
    )
    assert [r["s"] for r in out] == truth


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=0, max_value=10_000),
)
def test_random_ad_doc_engine_matches_independent_walker(seed, i):
    """Differential fuzz of the two independent HTML parsers: the
    engine's positional regex extractor vs the stdlib html.parser
    event walker, over the corpus GENERATOR's whole randomness space
    (the committed golden fixture pins one seed; this explores
    arbitrary seeds x doc indices — quoting styles, comment/CDATA
    decoys, unterminated tails, no-separator joins, whitespace runs,
    literal '<', post-section leaks)."""
    import random

    import tools.html_golden_gen as gen
    from frontpage_spark.html import _Doc, _extract

    h = gen.gen_doc(random.Random(seed), i)
    g = gen.golden_extract(h)
    d = _Doc(h)
    for f in gen.FIELDS:
        assert _extract(d, f) == g[f], (f, h)
