"""Golden fixture generator for the HTML extraction layer (VERDICT r6
item 5 — give F5/F7-F11 a hash-grade cross-engine signal).

Produces two committed parquet files under fixtures/:

- ``html_corpus.parquet`` (k BIGINT, html STRING) — 500 deterministic
  (seed 42) ad documents exercising the selector surface the reference
  parses with BeautifulSoup (etl_process.py:31,71,132,144,155,166,177):
  double/single/unquoted attributes, multi-token class lists, nested
  same-tag markup, CRLF + unicode noise, MISSING elements (null
  extractions), attribute-order shuffles, and an unclosed-div tail
  (bs4-style leniency: the element extends to end-of-document).
- ``html_golden.parquet`` (k + the six extraction fields) — expected
  outputs computed by an INDEPENDENT parser: a stdlib
  ``html.parser.HTMLParser`` event-stream walker (no regexes over raw
  HTML), implementing the reference's selector semantics. The engine's
  Arrow-batched regex extractor (frontpage_spark/html.py) must agree
  byte-for-byte; the ``html_extraction_golden`` registry query turns
  that agreement into per-field match counts + an order-stable md5
  that DuckDB recomputes from the same fixture.

Parity contract (round 8 — exact ``getText()`` semantics): text nodes
concatenate with NO separator, then the reference's exact cleanup
(etl_process.py:31-33): drop ``\r``/``\n``, ascii-ignore, strip — no
whitespace collapsing, no tags-as-spaces. Script/style text INSIDE a
selected element is INCLUDED (bs4's getText() and html.parser's
handle_data both deliver CDATA content), while selectors never MATCH
inside script/style/comments and markup inside CDATA never perturbs
depth counting. Comments contribute no text (html.parser routes them
to handle_comment, and the engine drops comment spans).

Round 9 (closing the r8 entity carve-out + ADVICE comment/CDATA
findings): entity handling is now IN the parity contract — text runs
and attribute values decode per HTML5 rules exactly as html.parser's
``convert_charrefs`` / ``parse_starttag`` do, CDATA content stays raw
— and the corpus exercises it (named/numeric/hex/semicolon-less refs,
refs the cleanup then strips, entities in hrefs, entities in script).
The corpus also covers comment-inside-CDATA (the ``<!-- //-->`` hiding
idiom), a close tag inside such a comment, and unterminated comments
(html.parser's flush-as-data-through-first-'>' semantics).

Run: ``python tools/html_golden_gen.py`` (idempotent — rewrites both
files; byte-stable given the seed).
"""

from __future__ import annotations

import os
import random
import re
from html.parser import HTMLParser

FIELDS = ("post_date_raw", "post_title", "post_body", "poster_age", "locations", "other_ads")


def _clean(chunks: list[str]) -> str | None:
    """The reference's exact text cleaning over collected text nodes
    (etl_process.py:31-33): getText() concatenates with no separator,
    then \r\n dropped, non-ascii dropped, trimmed. No whitespace
    collapsing — interior space runs survive verbatim."""
    txt = "".join(chunks)
    txt = txt.replace("\r", "").replace("\n", "")
    txt = txt.encode("ascii", "ignore").decode()
    return txt.strip()


class _Walker(HTMLParser):
    """Event-stream extractor: finds the FIRST match in document order
    for each selector and collects all descendant text of that element,
    counting same-tag open/close pairs so nested markup is included in
    full (unclosed elements extend to end-of-document)."""

    def __init__(self):
        # convert_charrefs=True: text runs arrive entity-DECODED (the
        # bs4 default treebuilder setting), CDATA content arrives raw,
        # attribute values unescape in parse_starttag — the round-9
        # parity contract the engine mirrors (frontpage_spark/html.py
        # module docstring, last bullet)
        super().__init__(convert_charrefs=True)
        # capture state per target: None = not seen, (tag, depth, chunks)
        self.cap: dict[str, list] = {}
        self.done: dict[str, list[str]] = {}
        self.hrefs: list[str] = []
        self.in_other: bool = False
        self.other_seen: bool = False
        self.other_elem: list | None = None  # [tag, depth] of the section
        self.other_div_depth = 0
        self.pending_loc_div: int | None = None  # depth marker
        self.last_was_div_open = False

    @staticmethod
    def _classes(attrs) -> list[str]:
        for name, val in attrs:
            if name == "class":
                return (val or "").split()
        return []

    @staticmethod
    def _id(attrs) -> str | None:
        for name, val in attrs:
            if name == "id":
                return val
        return None

    def _start_capture(self, key: str, tag: str):
        if key not in self.done and key not in self.cap:
            self.cap[key] = [tag, 1, []]
            return True
        return False

    def handle_starttag(self, tag, attrs):
        for key, state in list(self.cap.items()):
            if tag == state[0]:
                state[1] += 1
        if self.in_other and self.other_elem is not None and tag == self.other_elem[0]:
            self.other_elem[1] += 1
        classes = self._classes(attrs)
        eid = self._id(attrs)
        if tag == "div" and "adInfo" in classes:
            self._start_capture("post_date_raw", "div")
        if eid == "postingTitle":
            self._start_capture("post_title", tag)
        if tag == "div" and "postingBody" in classes:
            self._start_capture("post_body", "div")
        if tag == "p" and "metaInfoDisplay" in classes:
            self._start_capture("poster_age", "p")
        if eid == "OtherAdsByThisUser" and not self.other_seen:
            # bs4 findAll walks DESCENDANTS of the (first) section only —
            # close the capture when the section element closes
            self.in_other = True
            self.other_seen = True
            self.other_elem = [tag, 1]
        if self.in_other and tag == "div" and "cat" in classes:
            self.other_div_depth += 1
        if self.in_other and tag == "a" and self.other_div_depth > 0:
            for name, val in attrs:
                if name == "href" and val:
                    self.hrefs.append(val)
                    break
        # 'locations': first div whose DIRECT text (before any child
        # tag) contains 'Location:' — arm a marker cleared by any tag
        self.last_was_div_open = tag == "div"

    def handle_data(self, data):
        if (
            self.last_was_div_open
            and "locations" not in self.done
            and "locations" not in self.cap
            and "Location:" in data
        ):
            self.cap["locations"] = ["div", 1, [data]]
            self.last_was_div_open = False
            for key, state in self.cap.items():
                if key != "locations":
                    state[2].append(data)
            return
        self.last_was_div_open = False
        for state in self.cap.values():
            state[2].append(data)

    def handle_endtag(self, tag):
        self.last_was_div_open = False
        if self.in_other and tag == "div" and self.other_div_depth > 0:
            self.other_div_depth -= 1
        if self.in_other and self.other_elem is not None and tag == self.other_elem[0]:
            self.other_elem[1] -= 1
            if self.other_elem[1] == 0:
                self.in_other = False
                self.other_elem = None
        for key, state in list(self.cap.items()):
            if tag == state[0]:
                state[1] -= 1
                if state[1] == 0:
                    self.done[key] = state[2]
                    del self.cap[key]

    def close(self):
        super().close()
        for key, state in list(self.cap.items()):
            self.done[key] = state[2]  # unclosed: extend to EOF
            del self.cap[key]


def golden_extract(html: str) -> dict[str, str | None]:
    w = _Walker()
    w.feed(html)
    w.close()
    out: dict[str, str | None] = {}
    t = _clean(w.done["post_date_raw"]) if "post_date_raw" in w.done else None
    out["post_date_raw"] = t.replace("Posted:", "").strip() if t is not None else None
    t = _clean(w.done["post_title"]) if "post_title" in w.done else None
    out["post_title"] = t.replace("Report Ad", "").strip() if t is not None else None
    out["post_body"] = _clean(w.done["post_body"]) if "post_body" in w.done else None
    t = _clean(w.done["poster_age"]) if "poster_age" in w.done else None
    out["poster_age"] = t.replace("Poster's age:", "").strip() if t is not None else None
    t = _clean(w.done["locations"]) if "locations" in w.done else None
    out["locations"] = t.replace("Location:", "").strip() if t is not None else None
    out["other_ads"] = ";".join(w.hrefs) if w.hrefs else None
    return out


# --------------------------------------------------------------------------
# corpus generator


def _attr(rng: random.Random, name: str, val: str) -> str:
    """Attribute in a random legal quoting style (unquoted only when
    the value is a single token)."""
    style = rng.choice(["dq", "sq", "uq"] if " " not in val else ["dq", "sq"])
    if style == "dq":
        return f'{name}="{val}"'
    if style == "sq":
        return f"{name}='{val}'"
    return f"{name}={val}"


def _cls(rng: random.Random, cls: str) -> str:
    pad = rng.choice([[], ["x1"], ["left", "wide"]])
    toks = pad[: rng.randint(0, len(pad))] + [cls] + pad[rng.randint(0, len(pad)) :]
    return _attr(rng, "class", " ".join(dict.fromkeys(toks)))


_BODIES = [
    "call 555-000-{i4} or 555 111 2222 anytime",
    "rates start at $200, ring five55one23four567 now",
    "new in town {city} — 100% real pics, no blocked calls",
    "text 55512345{i2} today\r\nor visit my site",
    "outcall only. leave a msg at 555.321.7{i3}",
    "tonight only!! ❤ ask for Lexi — (555) 444-{i4}",
]

_CITIES = ["midtown", "uptown", "riverside", "old town", "harbor"]


def gen_doc(rng: random.Random, i: int) -> str:
    nl = rng.choice(["", "\n", "\r\n", "\n  "])
    parts = [f"<html{' lang=en' if rng.random() < 0.3 else ''}><body>{nl}"]
    # decoy elements that must NOT match the selectors
    if rng.random() < 0.5:
        parts.append('<div class="adInfoBox">decoy not a date</div>')
    if rng.random() < 0.4:
        parts.append("<div>advert header</div>")
    # a real HTML parser must not match selectors inside COMMENTS or
    # SCRIPT/STYLE CDATA (the reference's BeautifulSoup does not; a
    # naive regex extractor would) — round-7 hardening cases
    if rng.random() < 0.25:
        parts.append('<!-- <div class="adInfo"> Posted: Friday, May 5, 2017 1:11 AM </div> -->')
    if rng.random() < 0.25:
        parts.append(
            '<script>var tpl = "<div class=\\"postingBody\\">decoy body</div>";</script>'
        )
    if rng.random() < 0.15:
        parts.append('<style>.postingBody { color: red } /* <p class="metaInfoDisplay"> */</style>')
    # round-9 classes (ADVICE r8): a comment inside script/style CDATA
    # is plain data to html.parser (the classic <!-- //--> hiding
    # idiom), and a close tag inside such a comment still ends the
    # content at its FIRST literal occurrence
    if rng.random() < 0.2:
        parts.append(
            f'<script><!-- var h{i} = "<div class=\\"adInfo\\">no</div>"; //--></script>'
        )
    if rng.random() < 0.12:
        parts.append(f"<script>var a{i}=1; <!-- </script> -->stray tail {i}</div>")
    # attribute values containing '>' — legal HTML that breaks
    # [^>]*-style tag matching
    if rng.random() < 0.2:
        parts.append(f'<div class="note" title="a>b {i}">angle attr decoy</div>')
    # quotes inside UNQUOTED attribute values — html.parser ends the
    # value at whitespace/'>'; a quote here must not open a quoted
    # section that scans past the real '>' (round-8 hardening)
    if rng.random() < 0.2:
        parts.append(f"<div title=don't class=q{i % 9}>unquoted quote decoy</div>")
    if rng.random() < 0.15:
        parts.append(f'<span onclick=go("x{i % 4}")>js-attr decoy</span>')
    # post date (5% missing)
    if rng.random() >= 0.05:
        wd = rng.choice(["Monday", "Tuesday", "Friday", "Sunday"])
        mo = rng.choice(["January", "May", "July", "October"])
        date_txt = f"Posted: {wd}, {mo} {1 + i % 28}, 201{4 + i % 4} {1 + i % 12}:{i % 60:02d} {'AM' if i % 2 else 'PM'}"
        angle = f' title="v>{i}"' if rng.random() < 0.15 else ""
        if rng.random() < 0.1:
            angle += " data-x=don't"  # quote in unquoted value ON a selector tag
        parts.append(f"<div {_cls(rng, 'adInfo')}{angle}>{nl} {date_txt} {nl}</div>")
    # title (3% missing), sometimes on a span, sometimes nested markup
    if rng.random() >= 0.03:
        ttag = rng.choice(["div", "div", "span"])
        inner = rng.choice(
            [
                "{t} Report Ad",
                "<h1>{t} Report Ad</h1>",
                "<h1><b>{t}</b> Report Ad</h1>",
                # round-9: entities decode in title text too
                "{t} &amp; co Report Ad",
                "<h1>{t} 4&#x55; Report Ad</h1>",
            ]
        ).format(t=f"title {i} {rng.choice(['hot', 'new', 'best'])}")
        parts.append(f"<{ttag} {_attr(rng, 'id', 'postingTitle')}>{inner}</{ttag}>")
    # body (4% missing), nested same-tag divs included in full
    if rng.random() >= 0.04:
        body = _BODIES[i % len(_BODIES)].format(
            i4=f"{1000 + i}", i3=f"{100 + i % 900}", i2=f"{i % 100:02d}", city=rng.choice(_CITIES)
        )
        if rng.random() < 0.3:
            body += f'<div class="inner">extra {rng.choice(["line", "deal", "info"])}</div> tail {i}'
        # script INSIDE a captured element: its TEXT is part of
        # getText() (bs4 + html.parser deliver CDATA via data events)
        # while markup inside the string must not match selectors or
        # perturb depth counting (ADVICE r7 medium — contract pinned)
        if rng.random() < 0.25:
            body += f'<script>track({i}, "x{i % 7}", "<div>no</div>");</script>'
        # no-separator concatenation: getText() joins text nodes with
        # nothing — abc<b>def is abcdef
        if rng.random() < 0.2:
            body += f" deal{i}<b>now</b>call"
        # interior whitespace runs survive (no collapsing)
        if rng.random() < 0.15:
            body += f"  double  spaced   {i}"
        # a '<' that opens no tag is literal text to a real parser
        if rng.random() < 0.15:
            body += " sizes 5 < 6 > 3 and i<3 u"
        # a comment INSIDE the captured element: no text, no structure,
        # and selector decoys inside it never match
        if rng.random() < 0.15:
            body += f"<!-- hidden {i} <div class='postingBody'>x</div> -->visible{i}"
        # round-9: entity references in text DECODE per HTML5 rules
        # (html.parser convert_charrefs / bs4 default) — named, numeric,
        # hex, semicolon-less, and refs whose decoded char the reference
        # cleanup then strips (&nbsp; -> \xa0 -> ascii-ignore; &#13; ->
        # \r -> dropped)
        if rng.random() < 0.3:
            body += rng.choice(
                [
                    f" rates &amp; fees {i}",
                    f" cost &#36;{100 + i % 900} tonight",
                    f" call now&#x21; {i}",
                    f" you &amp me {i}",
                    f" wide&nbsp;gap {i}",
                    f" line one&#13;line two {i}",
                    f" sizes 5 &lt; 6 &gt; 3 {i}",
                ]
            )
        # round-9: entities inside script CDATA stay RAW (a real parser
        # never unescapes CDATA content), and a comment inside the
        # script is part of that raw text
        if rng.random() < 0.15:
            body += f"<script>if (a{i} &amp;&amp; b) go();</script>"
        if rng.random() < 0.12:
            body += f'<script><!-- hide{i}("<div class=\\"postingBody\\">x</div>"); //--></script>'
        if rng.random() < 0.1:
            body += f"<script>s{i}(); <!-- </script> -->after{i}"
        # round-9: an UNTERMINATED '<!--' is NOT a comment — when no
        # '-->' follows anywhere, html.parser's EOF flush emits it as
        # DATA through the first '>' (or to end-of-document); when a
        # later '-->' does exist the comment legitimately swallows
        # everything between (both parsers agree either way)
        if rng.random() < 0.1:
            body += f"<!-- not closed {i} > seen{i}"
        if rng.random() < 0.06:
            # unclosed body div ending in an unterminated comment —
            # bs4-leniency extent to EOF meets the flush-as-data path
            parts.append(f"<div {_cls(rng, 'postingBody')}>{body} <!-- eof {i}")
        else:
            parts.append(f"<div {_cls(rng, 'postingBody')}>{body}</div>")
    # age (10% missing)
    if rng.random() >= 0.10:
        parts.append(
            f"<p {_cls(rng, 'metaInfoDisplay')}>{nl}Poster's age: {18 + i % 42}{nl}</p>"
        )
    # locations (8% missing): direct text starts with Location:
    if rng.random() >= 0.08:
        locs = ", ".join(rng.sample(_CITIES, rng.randint(1, 3)))
        parts.append(f"<div> Location: {locs} </div>")
    # other ads (12% missing), 1-4 cat anchors, varied href quoting
    if rng.random() >= 0.12:
        cats = []
        for j in range(rng.randint(1, 4)):
            href = f"/o/{i}/{j}"
            # round-9: attribute values entity-decode unconditionally
            # (html.parser parse_starttag unescapes every attr value)
            if rng.random() < 0.25:
                href += f"?a={j}&amp;b={i % 7}"
            h = rng.choice([f'href="{href}"', f"href='{href}'", f"href={href}"])
            extra = rng.choice(["", " rel=nofollow", ' target="_blank"'])
            cats.append(f"<div {_cls(rng, 'cat')}><a {h}{extra}>ad {j}</a></div>")
        parts.append(
            f"<div {_attr(rng, 'id', 'OtherAdsByThisUser')}>{nl}{''.join(cats)}</div>"
        )
        # a div.cat AFTER the section closes is NOT a descendant —
        # bs4's findAll must not pick it up (round-8 hardening)
        if rng.random() < 0.2:
            parts.append(f'<div class="cat"><a href="/leak/{i}">not ours</a></div>')
    # UNTERMINATED script tail: CDATA to end-of-document for a real
    # parser — selector-shaped strings inside must never match
    tail = rng.choice(
        [
            "</body></html>",
            "</body></html>",
            "<div>footer",
            '</body><script>var t = "<div class=\\"postingBody\\">eof decoy</div>";',
        ]
    )
    parts.append(tail)
    return "".join(parts)


def gen_corpus(n: int = 500, seed: int = 42) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    return [(i, gen_doc(rng, i)) for i in range(n)]


def main() -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fix = os.path.join(here, "fixtures")
    os.makedirs(fix, exist_ok=True)
    corpus = gen_corpus()
    golden = [golden_extract(h) for _, h in corpus]
    pq.write_table(
        pa.table(
            {"k": [k for k, _ in corpus], "html": [h for _, h in corpus]},
            schema=pa.schema([("k", pa.int64()), ("html", pa.string())]),
        ),
        os.path.join(fix, "html_corpus.parquet"),
    )
    cols: dict = {"k": [k for k, _ in corpus]}
    for f in FIELDS:
        cols[f] = [g[f] for g in golden]
    pq.write_table(
        pa.table(
            cols,
            schema=pa.schema([("k", pa.int64())] + [(f, pa.string()) for f in FIELDS]),
        ),
        os.path.join(fix, "html_golden.parquet"),
    )
    nulls = {f: sum(g[f] is None for g in golden) for f in FIELDS}
    print(f"wrote {len(corpus)} docs; nulls per field: {nulls}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
