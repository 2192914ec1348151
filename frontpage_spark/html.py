"""HTML field extraction — the one pandas-UDF family in the engine
(SURVEY.md §2.7).

The reference parses ad HTML with BeautifulSoup selectors
(etl_process.py:31,71,132,144,155,166,177 — F4, F5, F7–F11). HTML
parsing is the single part of the scalar library not expressible as
native column expressions, so it rides in Arrow-batched pandas UDFs —
one vectorized regex pass per batch, never a per-row Python round trip.

The extraction targets the same selector semantics on the fixture
corpus (FIXTURES.md §A1): class/id-anchored elements with text
payloads. Selector matching is regex-anchored, but the *extent* of a
matched element is found with a depth-counting balanced scan — nested
same-tag markup inside ``postingBody``/``locations`` is included in
full, matching BeautifulSoup's ``getText()`` semantics on real-world
(non-fixture) HTML instead of truncating at the first close tag.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

# quote-aware tag interior: a real parser allows '>' INSIDE quoted
# attribute values (title="a>b"); [^>]* would end the tag there and
# corrupt both selector matches and element extents (round-7 golden
# corpus hardening)
_TI = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*?"
_TAG_RE = re.compile(rf"<{_TI}>")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
# script/style content is CDATA to a real parser — selector-shaped
# strings inside it must never match (bs4 parity)
_CDATA_RE = re.compile(
    rf"<(script|style)\b{_TI}>.*?</\1\s*>", re.S | re.I
)


def _prepare(html: str) -> str:
    """Selector-visibility preprocessing, once per document: drop
    comments and script/style CDATA blocks — regions where a real HTML
    parser (the reference's BeautifulSoup) never matches elements but a
    raw regex scan would."""
    return _CDATA_RE.sub(" ", _COMMENT_RE.sub(" ", html))


def _strip_tags(html: str) -> str:
    return _TAG_RE.sub(" ", html)


def _balanced_inner(html: str, open_end: int, tag: str) -> str:
    """Inner content of the element whose opening ``<tag ...>`` ends at
    ``open_end``, scanning forward and counting same-tag open/close pairs
    so nested elements are included in full. Unclosed elements extend to
    end-of-document (bs4-style leniency)."""
    pat = re.compile(rf"<{tag}\b{_TI}>|</{tag}\s*>", re.I | re.S)
    depth = 1
    for m in pat.finditer(html, open_end):
        if m.group(0).startswith("</"):
            depth -= 1
            if depth == 0:
                return html[open_end : m.start()]
        else:
            depth += 1
    return html[open_end:]


def _class_re(cls: str) -> str:
    """Regex fragment matching a class attribute that CONTAINS ``cls``
    under all three HTML attribute syntaxes bs4 accepts (reference
    parses with BeautifulSoup, etl_process.py:31): double-quoted,
    single-quoted, and unquoted (where the value is one token)."""
    c = re.escape(cls)
    return (
        rf'class\s*=\s*(?:"[^"]*\b{c}\b[^"]*"'
        rf"|'[^']*\b{c}\b[^']*'"
        rf"|{c}(?=[\s/>]))"
    )


def _id_re(elem_id: str) -> str:
    """Regex fragment matching an id attribute EQUAL to ``elem_id`` in
    double-quoted, single-quoted, or unquoted form."""
    i = re.escape(elem_id)
    return rf"id\s*=\s*(?:\"{i}\"|'{i}'|{i}(?=[\s/>]))"


def _div_by_class(html: str, cls: str) -> str | None:
    m = re.search(rf"<div\b{_TI}{_class_re(cls)}{_TI}>", html, re.S | re.I)
    return _balanced_inner(html, m.end(), "div") if m else None


def _elem_by_id(html: str, elem_id: str) -> str | None:
    m = re.search(rf"<([a-z0-9]+)\b{_TI}{_id_re(elem_id)}{_TI}>", html, re.S | re.I)
    return _balanced_inner(html, m.end(), m.group(1)) if m else None


def _clean_text(s: str | None) -> str | None:
    if s is None:
        return None
    # match reference: strip tags, \r\n removal, ascii-ignore, trim
    txt = _strip_tags(s)
    txt = txt.replace("\r", "").replace("\n", "")
    txt = txt.encode("ascii", "ignore").decode()
    txt = re.sub(r"\s+", " ", txt).strip()
    return txt


def _extract(html: str | None, field: str, prepared: bool = False) -> str | None:
    if html is None:
        return None
    if not prepared:
        html = _prepare(html)
    try:
        if field == "post_date_raw":  # F4: div.adInfo text minus 'Posted:'
            t = _clean_text(_div_by_class(html, "adInfo"))
            return t.replace("Posted:", "").strip() if t is not None else None
        if field == "post_title":  # F11: #postingTitle minus 'Report Ad'
            t = _clean_text(_elem_by_id(html, "postingTitle"))
            return t.replace("Report Ad", "").strip() if t is not None else None
        if field == "post_body":  # F9: div.postingBody text
            return _clean_text(_div_by_class(html, "postingBody"))
        if field == "poster_age":  # F10: p.metaInfoDisplay minus label
            m = re.search(
                rf"<p\b{_TI}{_class_re('metaInfoDisplay')}{_TI}>", html, re.S | re.I
            )
            t = _clean_text(_balanced_inner(html, m.end(), "p") if m else None)
            return t.replace("Poster's age:", "").strip() if t is not None else None
        if field == "locations":  # F8: div whose direct text starts 'Location:'
            t = None
            for m in re.finditer(rf"<div\b{_TI}>(?=[^<]*Location:)", html, re.S | re.I):
                t = _clean_text(_balanced_inner(html, m.end(), "div"))
                break
            return t.replace("Location:", "").strip() if t is not None else None
        if field == "other_ads":  # F5: hrefs of div.cat under #OtherAdsByThisUser
            m = re.search(
                rf"{_id_re('OtherAdsByThisUser')}{_TI}>(.*)", html, re.S | re.I
            )
            if not m:
                return None
            hrefs = [
                next(g for g in hm.groups() if g is not None)
                for hm in re.finditer(
                    rf"<div\b{_TI}{_class_re('cat')}{_TI}>.*?"
                    rf"<a\b{_TI}href\s*=\s*(?:\"([^\"]+)\"|'([^']+)'|([^\s>'\"][^\s>]*))",
                    m.group(1),
                    re.S | re.I,
                )
            ]
            return ";".join(hrefs) if hrefs else None
    except Exception:
        return None
    return None


FIELDS = ("post_date_raw", "post_title", "post_body", "poster_age", "locations", "other_ads")

_extract_all_udf = None  # built lazily: pandas_udf with a DDL schema
# string needs an active SparkSession, which module import (esp. on
# executors unpickling this module) must not assume


def _get_extract_all():
    global _extract_all_udf
    if _extract_all_udf is None:
        from pyspark.sql.types import StringType, StructField, StructType

        schema = StructType([StructField(f, StringType()) for f in FIELDS])

        @pandas_udf(schema)
        def _extract_all(html: pd.Series) -> pd.DataFrame:
            # all six HTML fields in ONE Arrow round trip — the HTML
            # column (by far the widest) crosses to Python once per
            # batch, not once per field; comment/CDATA preprocessing
            # runs once per DOCUMENT, shared by the six extracts
            def row(h):
                if h is None:
                    return (None,) * len(FIELDS)
                p = _prepare(h)
                return tuple(_extract(p, f, prepared=True) for f in FIELDS)

            return pd.DataFrame(
                html.map(row).tolist(), columns=list(FIELDS), index=html.index
            )

        _extract_all_udf = _extract_all
    return _extract_all_udf


def extract_fields(html: Column | str) -> Column:
    """struct(post_date_raw, post_title, post_body, poster_age,
    locations, other_ads) extracted from an HTML column."""
    return _get_extract_all()(F.col(html) if isinstance(html, str) else html)


def make_extractor(field: str):
    """Build a pandas UDF extracting one field from an HTML column.
    (Single-field convenience; multi-field consumers should use
    ``extract_fields`` — one Arrow pass for all six.)"""

    @pandas_udf("string")
    def extract(html: pd.Series) -> pd.Series:
        return html.map(lambda h: _extract(h, field))

    return extract


# Public column builders (F4 outer part lives in functions.parse_verbose_date)
def post_date_raw(html: Column | str) -> Column:
    return make_extractor("post_date_raw")(F.col(html) if isinstance(html, str) else html)


def post_title(html: Column | str) -> Column:
    return make_extractor("post_title")(F.col(html) if isinstance(html, str) else html)


def post_body(html: Column | str) -> Column:
    return make_extractor("post_body")(F.col(html) if isinstance(html, str) else html)


def poster_age(html: Column | str) -> Column:
    return make_extractor("poster_age")(F.col(html) if isinstance(html, str) else html)


def locations(html: Column | str) -> Column:
    return make_extractor("locations")(F.col(html) if isinstance(html, str) else html)


def other_ads(html: Column | str) -> Column:
    """';'-joined hrefs (compat form, etl_process.py:72)."""
    return make_extractor("other_ads")(F.col(html) if isinstance(html, str) else html)
