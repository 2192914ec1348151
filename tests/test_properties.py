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
