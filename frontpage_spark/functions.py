"""Reference scalar-function library (SURVEY.md §2.5, F1–F16) as pure
Column-expression builders — no Python UDFs anywhere in this module, so
every function stays inside whole-stage codegen.

Reference citations are to /root/reference/frontpage/:
- F1 get_ad_id          etl_process.py:42-49
- F2 get_category       etl_process.py:52-59
- F3 get_site_id        etl_process.py:62-65
- F4 get_post_date      etl_process.py:28-39
- F6 phone_extract      etl_process.py:79-126  (flagship)
- F12 create_uniq_id    scraper.py:105-119
- F13 ascii sanitize    etl_process.py:31 et al.
- F14 normalize params  scraper.py:159-160
- F15 timestamp now     scraper.py:97
- F16 json encode/decode scraper.py:208 / etl_process.py:305

Null policy (SURVEY.md §1.4): the reference returns '' on any failure;
we compute NULL internally and expose ``empty_on_null`` for the
compatibility boundary.
"""

from __future__ import annotations

import string
from collections.abc import Callable

from pyspark.sql import Column, functions as F

# --------------------------------------------------------------------------
# Shared constants (also consumed by oracles.py so Spark and DuckDB agree)
# --------------------------------------------------------------------------

# string.punctuation minus '$' — the reference deliberately keeps '$' so
# prices don't fuse into adjacent digit runs (etl_process.py:84-85).
PUNCT_NO_DOLLAR = "".join(c for c in string.punctuation if c != "$")

# Spelled-out digit replacements, applied in this order (etl_process.py:97-111).
WORD_DIGITS: list[tuple[str, str]] = [
    ("zero", "0"),
    ("one", "1"),
    ("two", "2"),
    ("three", "3"),
    ("four", "4"),
    ("five", "5"),
    ("six", "6"),
    ("seven", "7"),
    ("eight", "8"),
    ("nine", "9"),
]

PHONE_MIN_LEN = 7
PHONE_MAX_LEN = 11

VERBOSE_DATE_FMT_SPARK = "EEEE, MMMM d, yyyy h:mm a"  # "%A, %B %d, %Y %I:%M %p"
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------------------
# F1–F3: URL token extraction  (split on '/', positional tokens)
# --------------------------------------------------------------------------

def url_token(url: Column | str, idx: int) -> Column:
    """0-based '/'-separated token of a URL (reference: url.split('/')[idx]).
    NULL when the URL has too few tokens — ``F.get`` instead of indexing,
    which under ANSI mode (Spark 4 default) would *throw* on short URLs;
    the reference's try/except maps IndexError to the ''-boundary, i.e.
    NULL here (SURVEY.md §1.4)."""
    return F.get(F.split(_c(url), "/"), idx)


def ad_id_from_url(url: Column | str) -> Column:
    """F1 — 6th token: the numeric ad id (etl_process.py:42-49)."""
    return url_token(url, 5)


def category_from_url(url: Column | str) -> Column:
    """F2 — 4th token: category slug (etl_process.py:52-59)."""
    return url_token(url, 3)


def site_id_from_url(url: Column | str) -> Column:
    """F3 — subdomain: token 2 split on '.', first element (etl_process.py:62-65)."""
    return F.get(F.split(url_token(url, 2), "\\."), 0)


# --------------------------------------------------------------------------
# F6: phone_extract — the flagship scalar pipeline (etl_process.py:79-126)
# lower → strip punctuation (keep $) → remove spaces → spell out digits →
# mine digit runs → keep 7..11 length → dedupe → (sort for determinism)
# --------------------------------------------------------------------------

def phone_normalize(text: Column | str) -> Column:
    """The normalization prefix of F6 (before digit-run mining)."""
    x = F.lower(_c(text))
    x = F.translate(x, PUNCT_NO_DOLLAR, "")
    x = F.replace(x, F.lit(" "), F.lit(""))
    for word, digit in WORD_DIGITS:
        x = F.replace(x, F.lit(word), F.lit(digit))
    return x


def phone_candidates(text: Column | str) -> Column:
    """F6 as an array<string> of deduped candidate numbers, sorted for
    determinism (the reference used an unordered Python set,
    etl_process.py:117 — order was never meaningful)."""
    x = phone_normalize(text)
    runs = F.regexp_extract_all(x, F.lit(r"\d+"), 0)
    kept = F.filter(runs, lambda e: F.length(e).between(PHONE_MIN_LEN, PHONE_MAX_LEN))
    return F.array_sort(F.array_distinct(kept))


def phone_extract(text: Column | str) -> Column:
    """F6 compat form: ';'-joined candidates (etl_process.py:121)."""
    return F.array_join(phone_candidates(text), ";")


# --------------------------------------------------------------------------
# F4: verbose date parse + reformat
# --------------------------------------------------------------------------

def parse_verbose_date(s: Column | str) -> Column:
    """F4 — parse 'Tuesday, May 2, 2017 11:28 PM' shaped strings; NULL on
    mismatch (matches the reference's try/except '' after the NULL→''
    boundary).

    Spark's java.time parser rejects day-of-week fields in *parse*
    patterns (EEEE is format-only), so we strip the redundant leading
    day name and parse the remainder — semantics identical to the
    reference's strptime('%A, %B %d, %Y %I:%M %p')."""
    stripped = F.regexp_replace(_c(s), r"^[A-Za-z]+, ", "")
    return F.try_to_timestamp(stripped, F.lit("MMMM d, yyyy h:mm a"))


def format_ts(ts: Column | str) -> Column:
    """'%Y-%m-%d %H:%M:%S' reformat (etl_process.py:34)."""
    return F.date_format(_c(ts), TS_FMT_SPARK)


def strip_crlf(s: Column | str) -> Column:
    """Remove \\r\\n (etl_process.py:31,155) + trim."""
    return F.trim(F.regexp_replace(_c(s), "[\\r\\n]", ""))


# --------------------------------------------------------------------------
# F12: composite unique key  (scraper.py:105-119)
# --------------------------------------------------------------------------

def uniq_id(post_date: Column | str, ad_id: Column | str, site_id: Column | str, category: Column | str) -> Column:
    return F.concat_ws("-", _c(post_date), _c(ad_id), _c(site_id), _c(category))


# --------------------------------------------------------------------------
# F13–F15: sanitize / normalize / now
# --------------------------------------------------------------------------

def ascii_sanitize(s: Column | str) -> Column:
    """F13 — drop non-ASCII (reference: .encode('ascii','ignore'))."""
    return F.regexp_replace(_c(s), "[^\\x00-\\x7F]", "")


def normalize_param(s: Column | str) -> Column:
    """F14 — line.lower().strip() (scraper.py:159-160). Python's strip()
    removes all whitespace; Spark's trim() only removes spaces, so use
    btrim with an explicit whitespace set."""
    return F.lower(F.btrim(_c(s), F.lit(" \t\r\n\f\v")))


def scrape_now() -> Column:
    """F15 — wall-clock scrape_date string (scraper.py:97). Non-deterministic
    by nature; excluded from oracle comparisons (SURVEY.md §7.4.6)."""
    return F.date_format(F.current_timestamp(), TS_FMT_SPARK)


# --------------------------------------------------------------------------
# F16: JSON encode/decode
# --------------------------------------------------------------------------

def json_get(col: Column | str, field: str) -> Column:
    """Schema-on-read field access on a JSON string column."""
    return F.get_json_object(_c(col), f"$.{field}")


def json_encode(*cols: Column) -> Column:
    return F.to_json(F.struct(*cols))


# --------------------------------------------------------------------------
# Null-compat boundary (SURVEY.md §1.4)
# --------------------------------------------------------------------------

def empty_on_null(col: Column | str) -> Column:
    return F.coalesce(_c(col), F.lit(""))


def compat_join_array(col: Column | str) -> Column:
    """Array → ';'-joined string at the reference-compat boundary
    (etl_process.py:72,121); NULL array → ''."""
    return F.coalesce(F.array_join(_c(col), ";"), F.lit(""))


def canonical_url(url: Column | str) -> Column:
    """Crawl-frontier URL canonicalization — the dedup key a crawler
    uses BEFORE fetching (the reference crawls raw listing URLs,
    scraper.py:43-83; at corpus scale the frontier must collapse
    aliases first): drop the fragment, lowercase scheme AND host,
    strip the scheme's OWN default port (http:80 / https:443 — never
    cross-scheme, http on :443 is a different resource), trim trailing
    path slashes, drop tracking params (utm_*), and SORT the surviving
    query params so param order never splits one logical URL into
    many. This is the shared implementation behind the
    ``url_canonicalize_dedup`` query (its DuckDB oracle retraces the
    identical steps); pure Column chain, no UDF."""
    u = _c(url)
    nf = F.split_part(u, F.lit("#"), F.lit(1))
    scheme = F.lower(F.split_part(nf, F.lit("://"), F.lit(1)))
    rest = F.split_part(nf, F.lit("://"), F.lit(2))
    hostport = F.lower(F.split_part(rest, F.lit("/"), F.lit(1)))
    pathq = F.when(
        rest.contains("/"), rest.substr(F.length(hostport) + F.lit(1), F.length(rest))
    ).otherwise(F.lit(""))
    # Strip ONLY the trailing ':80'/':443' suffix, never split at the
    # first ':': split_part would collapse an IPv6 bracket host
    # ('http://[::1]:80/x' → 'http://[') and mangle userinfo
    # ('user@host:80' → 'user@host' must survive intact).
    host = (
        F.when(
            (scheme == "http") & hostport.endswith(":80"),
            hostport.substr(F.lit(1), F.length(hostport) - F.lit(3)),
        )
        .when(
            (scheme == "https") & hostport.endswith(":443"),
            hostport.substr(F.lit(1), F.length(hostport) - F.lit(4)),
        )
        .otherwise(hostport)
    )
    path = F.regexp_replace(F.split_part(pathq, F.lit("?"), F.lit(1)), "/+$", "")
    query = F.when(pathq.contains("?"), F.split_part(pathq, F.lit("?"), F.lit(2))).otherwise(
        F.lit("")
    )
    params = F.array_sort(
        F.filter(F.split(query, "&"), lambda p: (p != "") & ~p.startswith("utm_"))
    )
    qs = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qs)


# Registry used by tests to assert every §2.5 function exists.
SCALAR_FUNCTIONS: dict[str, Callable[..., Column]] = {
    "F1_ad_id": ad_id_from_url,
    "F2_category": category_from_url,
    "F3_site_id": site_id_from_url,
    "F4_parse_verbose_date": parse_verbose_date,
    "F6_phone_extract": phone_extract,
    "F12_uniq_id": uniq_id,
    "F13_ascii_sanitize": ascii_sanitize,
    "F14_normalize_param": normalize_param,
    "F15_scrape_now": scrape_now,
    "F16_json_get": json_get,
}
