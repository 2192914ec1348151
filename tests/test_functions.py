"""Unit tests for the scalar library (SURVEY.md §2.5) against golden
pairs derived from the reference semantics (etl_process.py:28-126,
scraper.py:105-119)."""

import pytest
from pyspark.sql import functions as F

from frontpage_spark import functions as FF


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


@pytest.mark.parametrize(
    "text,expected",
    [
        # plain punctuated number
        ("Call 555-123-4567 now", ["5551234567"]),
        # spelled-out digits collapse into the run (etl_process.py:97-111)
        ("five five five 123 four five 67", ["5551234567"]),
        # $ kept as separator: trailing price does not fuse (etl_process.py:84-85)
        ("5551234567 $300", ["5551234567"]),
        # but a LEADING price fuses once spaces are removed ("$2005551234567"
        # → 13-digit run → length filter drops it) — reference behavior
        ("$200 5551234567", []),
        # bounds: 6 too short, 12 too long (etl_process.py:117)
        ("123456 too short", []),
        ("123456789012 too long", []),
        # dedupe across formats
        ("call me at 555.123.4567 or 555 123 4567", ["5551234567"]),
        ("no numbers here", []),
        # all ten words → one 10-digit run
        ("zero one two three four five six seven eight nine", ["0123456789"]),
        # 7 and 11 inclusive bounds
        ("1234567", ["1234567"]),
        ("12345678901", ["12345678901"]),
    ],
)
def test_phone_candidates(spark, text, expected):
    got = one(spark, FF.phone_candidates(F.lit(text)))
    assert got == expected


def test_phone_extract_compat_join(spark):
    got = one(spark, FF.phone_extract(F.lit("a 1234567 b 7654321")))
    assert got == "1234567;7654321"  # sorted, ';'-joined


def test_url_tokens(spark):
    url = F.lit("http://sitex.example.com/catz/slug-here/12345")
    assert one(spark, FF.ad_id_from_url(url)) == "12345"
    assert one(spark, FF.category_from_url(url)) == "catz"
    assert one(spark, FF.site_id_from_url(url)) == "sitex"


def test_uniq_id(spark):
    got = one(
        spark,
        FF.uniq_id(F.lit("2017-05-02 23:28:00"), F.lit("123"), F.lit("nyc"), F.lit("cats")),
    )
    assert got == "2017-05-02 23:28:00-123-nyc-cats"


def test_parse_verbose_date(spark):
    got = one(spark, FF.format_ts(FF.parse_verbose_date(F.lit("Tuesday, May 2, 2017 11:28 PM"))))
    assert got == "2017-05-02 23:28:00"
    # malformed → NULL (reference: except → '')
    assert one(spark, FF.parse_verbose_date(F.lit("not a date"))) is None
    assert one(spark, FF.empty_on_null(FF.parse_verbose_date(F.lit("nope")).cast("string"))) == ""


def test_ascii_sanitize(spark):
    assert one(spark, FF.ascii_sanitize(F.lit("héllo wörld"))) == "hllo wrld"


def test_normalize_param(spark):
    assert one(spark, FF.normalize_param(F.lit("  New York \n"))) == "new york"


def test_json_get(spark):
    assert one(spark, FF.json_get(F.lit('{"k": 87}'), "k")) == "87"


def test_html_nested_div_extraction():
    """Depth-counting scan: nested same-tag markup inside a target element
    is included in full (bs4 getText() semantics), not truncated at the
    first close tag."""
    from frontpage_spark.html import _extract

    html = (
        '<html><div class="postingBody">intro <div class="quote">nested '
        "<div>deep</div></div> outro</div>"
        '<div>Location: <div class="hl">midtown</div>, uptown</div>'
        '<div id="postingTitle"><h1>Deal <span>hot</span> Report Ad</h1></div></html>'
    )
    assert _extract(html, "post_body") == "intro nested deep outro"
    # getText() concatenates text nodes with NO separator (bs4 parity,
    # round 8): the tag between 'midtown' and ',' contributes nothing
    assert _extract(html, "locations") == "midtown, uptown"
    assert _extract(html, "post_title") == "Deal hot"


def test_html_gettext_contract():
    """Round-8 parity contract (ADVICE r7): exact bs4 getText()
    semantics — no-separator concat, no whitespace collapsing, script/
    style TEXT inside a selected element included while markup inside
    CDATA neither matches selectors nor perturbs depth counting."""
    from frontpage_spark.html import _extract

    # no separator between adjacent text nodes
    assert _extract('<div class="postingBody">abc<b>def</b>ghi</div>', "post_body") == "abcdefghi"
    # interior whitespace runs survive verbatim
    assert (
        _extract('<div class="postingBody">a  b   c</div>', "post_body") == "a  b   c"
    )
    # script text inside the element is part of its text; the <div>
    # inside the JS string must not close/open anything
    body = '<div class="postingBody">pre <script>f("<div>x</div>");</script> post</div>'
    assert _extract(body, "post_body") == 'pre f("<div>x</div>"); post'
    # selector-shaped strings inside script/style never match
    decoy = '<script>var t = "<div class=\\"postingBody\\">no</div>";</script>'
    assert _extract(f"<html>{decoy}</html>", "post_body") is None
    # an UNTERMINATED script is CDATA to end-of-document — selectors
    # must not match in it, and (round 9, html.parser parity) its text
    # is NOT delivered at all: the EOF flush skips cdata content
    # (`if end and i < n and not self.cdata_elem` in goahead)
    open_decoy = '<script>var t = "<div class=\\"postingBody\\">no</div>";'
    assert _extract(f"<html>{open_decoy}", "post_body") is None
    assert (
        _extract('<div class="postingBody">pre <script>tail text', "post_body")
        == "pre"
    )
    # comments contribute no text and no structure
    assert (
        _extract('<div class="postingBody">a<!-- <div> hidden -->b</div>', "post_body")
        == "ab"
    )
    # a '<' that opens no tag is literal text (html.parser parity)
    assert (
        _extract('<div class="postingBody">5 < 6 > 3 i<3 u</div>', "post_body")
        == "5 < 6 > 3 i<3 u"
    )


def test_html_round9_contract():
    """Round-9 parity contract (ADVICE r8 + VERDICT item 4): entity
    decoding is IN contract (html.parser convert_charrefs semantics,
    CDATA raw, attributes always decoded), constructs consume
    left-to-right (comment inside script is data; a close tag inside
    such a comment still ends the content), and an unterminated
    '<!--' is data-through-first-'>' — all pinned against stdlib
    html.parser behavior, verified by the golden walker."""
    from frontpage_spark.html import _extract

    # entities decode in text: named, numeric, hex, semicolon-less
    assert (
        _extract('<div class="postingBody">a &amp; b &#36;5 &#x21; &amp c</div>', "post_body")
        == "a & b $5 ! & c"
    )
    # decoded chars then flow through the reference cleanup: &nbsp; ->
    # \xa0 -> ascii-ignore; &#13; -> \r -> dropped
    assert (
        _extract('<div class="postingBody">x&nbsp;y&#13;z</div>', "post_body") == "xyz"
    )
    # a reference interrupted by a tag never reassembles (&am<b>p; is
    # two runs, neither an entity)
    assert (
        _extract('<div class="postingBody">&am<b>p;</b></div>', "post_body") == "&amp;"
    )
    # entities inside script CDATA stay RAW
    assert (
        _extract('<div class="postingBody">q <script>a &amp;&amp; b</script></div>', "post_body")
        == "q a &amp;&amp; b"
    )
    # hrefs entity-decode (parse_starttag unescapes every attr value)
    h = (
        '<div id="OtherAdsByThisUser"><div class="cat">'
        '<a href="/o/1?a=1&amp;b=2">x</a></div></div>'
    )
    assert _extract(h, "other_ads") == "/o/1?a=1&b=2"
    # comment inside script content is plain CDATA data (the classic
    # <!-- //--> hiding idiom) — its text survives, selectors inside
    # never match
    assert (
        _extract(
            '<div class="postingBody">p <script><!-- f(); //--></script> q</div>',
            "post_body",
        )
        == "p <!-- f(); //--> q"
    )
    decoy = '<script><!-- var t = "<div class=\'postingBody\'>no</div>"; //--></script>'
    assert _extract(f"<html>{decoy}</html>", "post_body") is None
    # a close tag inside a comment-in-script still ends the content at
    # its FIRST literal occurrence (html.parser cdata 'interesting')
    assert (
        _extract(
            '<div class="postingBody">a<script>s(); <!-- </script> -->b</div>',
            "post_body",
        )
        == "as(); <!--  -->b"
    )
    # a <script> inside a COMMENT never opens CDATA (comment wins —
    # it starts first)
    assert (
        _extract('<div class="postingBody">a<!-- <script> -->b</div>', "post_body")
        == "ab"
    )
    # unterminated '<!--' with no later '-->': data through the first
    # '>' — here that '>' belongs to the inner <i> tag, which is
    # therefore swallowed (never a tag), then parsing resumes
    assert (
        _extract('<div class="postingBody">a <!-- oops <i>b</i></div>', "post_body")
        == "a <!-- oops <i>b"
    )
    # ...and with no '>' at all: everything to EOF is data
    assert (
        _extract('<div class="postingBody">a <!-- tail no close', "post_body")
        == "a <!-- tail no close"
    )


def test_html_unquoted_attr_quote_no_overscan():
    """ADVICE r7: a quote INSIDE an unquoted attribute value must not
    open a quoted section that scans past the real '>' — html.parser
    ends the value at whitespace/'>'."""
    from frontpage_spark.html import _extract

    h = (
        "<div title=don't class=q1>decoy</div>"
        '<span onclick=go("x")>js</span>'
        '<div class="postingBody">kept body</div>'
    )
    assert _extract(h, "post_body") == "kept body"
    # quote-in-unquoted-value ON the selector element itself
    assert (
        _extract("<div data-x=don't class=postingBody>own attr</div>", "post_body")
        == "own attr"
    )
    # quoted value containing '>' still protected
    assert (
        _extract('<div title="a>b" class="postingBody">angle</div>', "post_body")
        == "angle"
    )


def test_html_other_ads_bounded_to_section():
    """bs4 findAll walks DESCENDANTS of the section only — a div.cat
    after #OtherAdsByThisUser closes must not contribute (round 8)."""
    from frontpage_spark.html import _extract

    h = (
        '<div id="OtherAdsByThisUser"><div class="cat"><a href="/in/1">a</a></div></div>'
        '<div class="cat"><a href="/leak/2">b</a></div>'
    )
    assert _extract(h, "other_ads") == "/in/1"


def test_html_unclosed_div_lenient():
    from frontpage_spark.html import _extract

    assert _extract('<div class="postingBody">no close tag here', "post_body") == (
        "no close tag here"
    )


def test_html_attr_quote_styles():
    """VERDICT r2 item 5: bs4 (the reference's parser, etl_process.py:31)
    accepts double-quoted, single-quoted, and unquoted attribute values;
    the selector regexes must too."""
    from frontpage_spark.html import _extract

    for body_div in (
        '<div class="postingBody">hello world</div>',
        "<div class='postingBody'>hello world</div>",
        "<div class=postingBody>hello world</div>",
        "<div class = 'extra postingBody more'>hello world</div>",
    ):
        assert _extract(f"<html>{body_div}</html>", "post_body") == "hello world", body_div
    # class token must still match exactly (no substring hits)
    assert _extract('<div class="postingBodyX">x</div>', "post_body") is None
    assert _extract("<div class=postingBodyX>x</div>", "post_body") is None

    for title in (
        '<div id="postingTitle">Big Sale Report Ad</div>',
        "<div id='postingTitle'>Big Sale Report Ad</div>",
        "<div id=postingTitle>Big Sale Report Ad</div>",
    ):
        assert _extract(f"<html>{title}</html>", "post_title") == "Big Sale", title
    assert _extract("<div id=postingTitleX>x</div>", "post_title") is None

    for age in (
        '<p class="metaInfoDisplay">Poster\'s age: 25</p>',
        "<p class='metaInfoDisplay'>Poster's age: 25</p>",
        "<p class=metaInfoDisplay>Poster's age: 25</p>",
    ):
        assert _extract(f"<html>{age}</html>", "poster_age") == "25", age

    for section in (
        '<div id="OtherAdsByThisUser"><div class="cat"><a href="/ad/1">x</a></div>'
        '<div class=cat><a href=/ad/2>y</a></div>'
        "<div class='cat'><a href='/ad/3'>z</a></div></div>",
        "<div id=OtherAdsByThisUser><div class=cat><a href=/ad/1>x</a></div>"
        '<div class="cat"><a href="/ad/2">y</a></div>'
        "<div class='cat'><a href='/ad/3'>z</a></div></div>",
    ):
        assert _extract(f"<html>{section}</html>", "other_ads") == "/ad/1;/ad/2;/ad/3", section


@pytest.mark.parametrize(
    "raw, want",
    [
        # fragment dropped, host lowercased, default port stripped,
        # utm_* dropped, params sorted
        (
            "https://Ads.Example.com:443/cat/7?b=2&utm_source=x&a=1#frag",
            "https://ads.example.com/cat/7?a=1&b=2",
        ),
        # http default port; no surviving params -> no '?'
        ("http://HOST.com:80/p?utm_campaign=x", "http://host.com/p"),
        # no query, no fragment: unchanged modulo host case
        ("https://A.b/path/x", "https://a.b/path/x"),
        # non-default port kept; empty path
        ("https://a.b:8080", "https://a.b:8080"),
        # already canonical -> idempotent
        ("https://a.b/p?a=1&b=2", "https://a.b/p?a=1&b=2"),
        # scheme is case-insensitive (RFC 3986) -> lowered
        ("HTTP://h/x", "http://h/x"),
        # default-port strip is SCHEME-AWARE: http on :443 is a
        # different resource, keep it
        ("http://h:443/x", "http://h:443/x"),
        ("https://h:80/x", "https://h:80/x"),
        # trailing path slashes trimmed
        ("https://h/p///", "https://h/p"),
        # IPv6 bracket host: suffix strip, never split at first ':'
        ("http://[::1]:80/x", "http://[::1]/x"),
        ("https://[2001:DB8::1]:443/x", "https://[2001:db8::1]/x"),
        ("http://[::1]:8080/x", "http://[::1]:8080/x"),
        # userinfo survives the default-port strip
        ("http://user@h.com:80/x", "http://user@h.com/x"),
    ],
)
def test_canonical_url(spark, raw, want):
    got = one(spark, FF.canonical_url(F.lit(raw)))
    assert got == want
    # idempotence: canonicalizing the canonical form is a fixpoint
    assert one(spark, FF.canonical_url(F.lit(got))) == got


def test_html_golden_fixture_agreement():
    """The committed golden fixture (fixtures/html_golden.parquet) was
    produced by an INDEPENDENT stdlib-HTMLParser walker; the engine's
    regex extractor must agree byte-for-byte on every doc and field,
    and the committed parquet must match a fresh regeneration (seed
    stability) — the pure-Python half of the html_extraction_golden
    cross-engine oracle (VERDICT r6 item 5)."""
    import os

    import pyarrow.parquet as pq

    import tools.html_golden_gen as gen
    from frontpage_spark.html import _extract

    corpus = gen.gen_corpus()
    assert len(corpus) == 500
    golden = [gen.golden_extract(h) for _, h in corpus]
    for (k, h), g in zip(corpus, golden):
        for f in gen.FIELDS:
            assert _extract(h, f) == g[f], (k, f)
    # some docs must be missing each field (null path exercised)
    for f in gen.FIELDS:
        assert any(g[f] is None for g in golden), f
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t = pq.read_table(os.path.join(root, "fixtures", "html_golden.parquet"))
    assert t.column("k").to_pylist() == [k for k, _ in corpus]
    for f in gen.FIELDS:
        assert t.column(f).to_pylist() == [g[f] for g in golden], f
    tc = pq.read_table(os.path.join(root, "fixtures", "html_corpus.parquet"))
    assert tc.column("html").to_pylist() == [h for _, h in corpus]
