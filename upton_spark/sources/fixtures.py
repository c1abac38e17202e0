"""Golden fixture corpus — the reference's WebMock universe as a ``pages`` table.

Builds the Common-Crawl-style ``pages`` DataFrame (schemas.PAGES) holding the
nine reference fixture pages under ``http://www.example.com/...``, mirroring
the WebMock stubs (spec/upton_spec.rb:44-53,140-153) including the paginated
search aliases (``?p=1`` = page 1 body, ``?p=3`` = empty body — the
pagination terminator). Fixture bytes are read from the reference's spec/data
directory at build time; nothing is copied into the repo.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession

from upton_spark import schemas

FIXTURE_DIR = "/root/reference/spec/data"
BASE = "http://www.example.com"

# Deterministic capture timestamp (never wall-clock — resume/replay must be
# byte-stable).
WARC_TS = dt.datetime(2013, 7, 1, 0, 0, 0)

_FIXTURES = [
    "propublica.html",
    "propublica-relative.html",
    "propublica_search.html",
    "propublica_search_page_2.html",
    "webinar.html",
    "discussion.html",
    "prosecutor.html",
    "sixfacts.html",
    "easttimor.html",
]

# WebMock alias stubs: (url, fixture file or None for empty body)
_ALIASES = [
    (f"{BASE}/propublica_search.html?p=1", "propublica_search.html"),
    (f"{BASE}/propublica_search.html?p=2", "propublica_search_page_2.html"),
    (f"{BASE}/propublica_search.html?p=3", None),
    (f"{BASE}/", None),  # bare-host stub used by the politeness specs
]


def _read(name: str) -> bytes:
    with open(os.path.join(FIXTURE_DIR, name), "rb") as f:
        return f.read()


def fixture_rows() -> list[tuple]:
    rows = []
    for name in _FIXTURES:
        rows.append((f"{BASE}/{name}", WARC_TS, _read(name), None, "en"))
    for url, name in _ALIASES:
        rows.append((url, WARC_TS, _read(name) if name else b"", None, "en"))
    return rows


def fixture_pages(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(fixture_rows(), schema=schemas.PAGES)
