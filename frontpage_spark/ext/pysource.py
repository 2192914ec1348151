"""Custom Spark 4 Python DataSource: the paginated listing scan as a
first-class ``spark.read.format("frontpage_listing")`` source.

The reference walks listing pages 1..49 serially and stops on the
first empty page (``/root/reference/frontpage/scraper.py:53-70``); the
engine's operator form is ``sources.paginated_scan``. This module
exposes the same contract through Spark's DataSource V2 Python API so
a listing crawl *plans* like any other table: one InputPartition per
page (pages fetch in parallel across executors — the serial reference
loop becomes embarrassingly parallel), and an ``EqualTo("page", n)``
predicate prunes partitions BEFORE any fetch happens (pushFilters),
the same contract parquet scans get from partition pruning.

The row payload here is a deterministic synthetic listing (md5-derived
ids/titles) — the injectable-fetcher stand-in for live HTTP, matching
the repo-wide harness-safe policy; a production source would issue the
fetch inside ``read`` and keep exactly this partition/pushdown shape.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LISTING_SCHEMA = "page int, slot int, ad_id string, title string"
MAX_PAGES = 49  # the reference's range(1, 50) pagination bound


class ListingDataSource(DataSource):
    """``spark.dataSource.register(ListingDataSource)`` then
    ``spark.read.format("frontpage_listing").option("n_pages", 8).load()``."""

    @classmethod
    def name(cls) -> str:
        return "frontpage_listing"

    def schema(self) -> str:
        return LISTING_SCHEMA

    def reader(self, schema) -> "ListingReader":
        return ListingReader(self.options)

    def simpleStreamReader(self, schema) -> "ListingStreamReader":
        return ListingStreamReader(self.options)


class ListingReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_pages = min(int(options.get("n_pages", MAX_PAGES)), MAX_PAGES)
        self.rows_per_page = int(options.get("rows_per_page", 50))
        self.seed = options.get("seed", "fp")
        self._pages: set[int] | None = None

    def pushFilters(self, filters):
        """Accept ``page = N`` equality predicates (partition pruning —
        pruned pages are never planned, let alone fetched); everything
        else is returned for Spark to evaluate post-scan."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("page",):
                keep = {int(f.value)}
                self._pages = keep if self._pages is None else self._pages & keep
            else:
                yield f

    def partitions(self):
        pages = range(1, self.n_pages + 1)
        if self._pages is not None:
            pages = [p for p in pages if p in self._pages]
        return [InputPartition(p) for p in pages]

    def read(self, partition: InputPartition):
        page = partition.value
        for slot in range(self.rows_per_page):
            h = hashlib.md5(f"{self.seed}:{page}:{slot}".encode()).hexdigest()
            yield (page, slot, h[:12], f"ad {h[:6]} on page {page}")


class ListingStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the listing crawl: each micro-batch reads the
    next ``pages_per_batch`` pages (offset = last page read), stopping
    at the 49-page bound — the reference's polled crawl loop
    (``scraper.py:53-70`` + the 600 s ETL poll) as a checkpointable
    Structured Streaming source. Offsets are plain dicts, so restart
    resumes exactly after the last committed page; ``readBetweenOffsets``
    replays a committed range deterministically (the payload is a pure
    function of (seed, page, slot)), which is what makes the source
    exactly-once replayable."""

    def __init__(self, options) -> None:
        self.n_pages = min(int(options.get("n_pages", MAX_PAGES)), MAX_PAGES)
        self.rows_per_page = int(options.get("rows_per_page", 50))
        self.pages_per_batch = int(options.get("pages_per_batch", 2))
        self.seed = options.get("seed", "fp")

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _rows(self, lo: int, hi: int):
        for page in range(lo + 1, hi + 1):
            for slot in range(self.rows_per_page):
                h = hashlib.md5(f"{self.seed}:{page}:{slot}".encode()).hexdigest()
                yield (page, slot, h[:12], f"ad {h[:6]} on page {page}")

    def read(self, start: dict):
        lo = int(start["page"])
        hi = min(lo + self.pages_per_batch, self.n_pages)
        # a list_iterator, not a generator: the protocol needs an
        # iterator (next() probes emptiness when the offset stalls) that
        # is ALSO picklable (the prefetch cache ships through the runner)
        return iter(list(self._rows(lo, hi))), {"page": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(int(start["page"]), int(end["page"]))))
