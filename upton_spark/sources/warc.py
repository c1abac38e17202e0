"""WARC ingestion — Common-Crawl-style archives → the ``pages`` table.

The engine's input contract is the Common-Crawl-shaped ``pages`` table
(BASELINE.json input_hint); the archive format those corpora actually ship
in is WARC (ISO 28500 / the public WARC 1.0-1.1 spec): a sequence of
records, each a ``WARC/1.x`` header block (WARC-Type, WARC-Target-URI,
WARC-Date, Content-Length) followed by that many payload bytes; crawl
archives gzip each record as its own member, so a ``.warc.gz`` is a
multi-member gzip stream (Python's gzip module reads those transparently).

``read_warc(spark, paths)`` turns ``response``/``resource`` records into
PAGES rows fully distributed: the driver only lists files; each task
stream-parses its archives inside an Arrow-batched ``mapInPandas`` (one
file at a time, record at a time — constant memory per task, so a 100 TB
crawl ingests at scan parallelism). Response records carry an HTTP message
as payload; the body after the first CRLFCRLF is the page html (kept as
opaque ``binary``, exactly like the corpus contract — charset decoding
happens later in the extraction UDFs).

``write_warc`` emits the same subset (uncompressed or per-record-gzip) so
tests round-trip without fixture binaries.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from upton_spark import schemas

_CRLF = b"\r\n"


def _read_headers(stream) -> dict[str, str] | None:
    """One WARC header block (leading blank lines tolerated) → dict, or
    None at end of stream."""
    line = stream.readline()
    while line in (_CRLF, b"\n"):
        line = stream.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"expected WARC version line, got {line[:40]!r}")
    headers: dict[str, str] = {}
    while True:
        line = stream.readline()
        if line in (_CRLF, b"\n", b""):
            return headers
        key, _, value = line.decode("utf-8", errors="replace").partition(":")
        headers[key.strip().lower()] = value.strip()


def iter_warc_records(stream):
    """Yield (headers, payload bytes) per record from a raw WARC stream."""
    while True:
        headers = _read_headers(stream)
        if headers is None:
            return
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError("truncated WARC record payload")
        yield headers, payload


def _http_body(payload: bytes) -> bytes:
    """Response-record payload = HTTP message; body follows the first
    CRLFCRLF (bare-LF tolerated)."""
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = payload.find(sep)
        if idx >= 0:
            return payload[idx + len(sep):]
    return payload


def _parse_warc_date(value: str | None) -> datetime | None:
    if not value:
        return None
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return None
    # pages.warc_ts is naive-UTC (TIMESTAMP_NTZ parquet convention)
    return dt.astimezone(timezone.utc).replace(tzinfo=None)


def pages_rows_from_warc(path: str):
    """Yield (url, warc_ts, html, text, lang) rows from one WARC file
    (plain or .gz)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        stream = f if path.endswith(".gz") else io.BufferedReader(f)
        for headers, payload in iter_warc_records(stream):
            rtype = headers.get("warc-type", "")
            url = headers.get("warc-target-uri")
            if rtype not in ("response", "resource") or not url:
                continue
            body = _http_body(payload) if rtype == "response" else payload
            yield (url, _parse_warc_date(headers.get("warc-date")), body, None, None)


def _read_archives(
    spark: SparkSession,
    paths: str | list[str],
    row_iter,
    schema,
    columns: list[str],
    tasks: int | None = None,
) -> DataFrame:
    """Shared distributed archive scaffold (WARC and WET): the driver holds
    only the FILE LIST (cheap even at 10^5 archives); each task opens its
    own files — posix paths here; a cluster deployment fronts object-store
    archives with a fuse/NFS mount or swaps the opener. ``tasks`` caps
    partitioning (default: one partition per file up to the session's
    parallelism). Chunked emission keeps the per-task high-water mark at
    256 records regardless of archive size (a 1 GB archive must not become
    one giant Arrow batch)."""
    files = sorted(_glob.glob(paths)) if isinstance(paths, str) else list(paths)
    if not files:
        return spark.createDataFrame([], schema=schema)
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(missing[:3])
    n = tasks or min(len(files), spark.sparkContext.defaultParallelism)
    file_df = spark.createDataFrame([(f,) for f in files], "path string").repartition(n, "path")

    def parse(batches):
        chunk = 256
        for pdf in batches:
            for path in pdf["path"]:
                rows: list[tuple] = []
                for row in row_iter(path):
                    rows.append(row)
                    if len(rows) >= chunk:
                        yield pd.DataFrame(rows, columns=columns)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=columns)

    return file_df.mapInPandas(parse, schema=schema)


def read_warc(spark: SparkSession, paths: str | list[str], tasks: int | None = None) -> DataFrame:
    """WARC file(s)/glob → PAGES DataFrame, parsed task-parallel (see
    _read_archives for the distribution/memory contract)."""
    return _read_archives(
        spark, paths, pages_rows_from_warc, schemas.PAGES,
        ["url", "warc_ts", "html", "text", "lang"], tasks,
    )


def write_warc(rows, path: str, compress: bool | None = None) -> None:
    """(url, warc_ts, html) triples → one WARC file (response records;
    ``.gz`` path or compress=True gzips each record as its own member, the
    crawl-archive convention)."""
    compress = path.endswith(".gz") if compress is None else compress

    def record(url: str, ts, html: bytes) -> bytes:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + (html or b"")
        stamp = (ts or datetime(2024, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {stamp}\r\n"
            f"Content-Length: {len(http)}\r\n"
            f"\r\n"
        ).encode()
        return head + http + _CRLF + _CRLF

    with open(path, "wb") as f:
        for url, ts, html in rows:
            data = record(url, ts, html)
            f.write(gzip.compress(data) if compress else data)


# --------------------------------------------------------------------------
# WET (Common Crawl "conversion" records, public convention over ISO 28500):
# the text-only distribution format most webtext pipelines actually consume —
# WARC-Type: conversion, Content-Type: text/plain, payload = extracted UTF-8
# text of the page named by WARC-Target-URI.
# --------------------------------------------------------------------------

WET_SCHEMA = "url string, warc_ts timestamp, text string"


def wet_rows_from_file(path: str):
    """Yield (url, warc_ts, text) rows from one WET file (plain or .gz)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        stream = f if path.endswith(".gz") else io.BufferedReader(f)
        for headers, payload in iter_warc_records(stream):
            url = headers.get("warc-target-uri")
            if headers.get("warc-type") != "conversion" or not url:
                continue
            yield (
                url,
                _parse_warc_date(headers.get("warc-date")),
                payload.decode("utf-8", errors="replace"),
            )


def read_wet(spark: SparkSession, paths: str | list[str], tasks: int | None = None) -> DataFrame:
    """WET file(s)/glob → (url, warc_ts, text) DataFrame, parsed
    task-parallel (see _read_archives) — the entry point for pipelines that
    start from Common Crawl's text distribution instead of raw html."""
    return _read_archives(
        spark, paths, wet_rows_from_file, WET_SCHEMA, ["url", "warc_ts", "text"], tasks
    )


def write_wet(rows, path: str, compress: bool | None = None) -> None:
    """(url, warc_ts, text) triples → one WET file (conversion records;
    ``.gz`` path or compress=True gzips each record as its own member, the
    crawl-archive convention). The inverse of read_wet — lets the engine's
    extraction output ship in the format downstream corpora expect."""
    compress = path.endswith(".gz") if compress is None else compress

    def record(url: str, ts, text: str) -> bytes:
        body = (text or "").encode("utf-8")
        stamp = (ts or datetime(2024, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {stamp}\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n"
            f"\r\n"
        ).encode()
        return head + body + _CRLF + _CRLF

    with open(path, "wb") as f:
        for url, ts, text in rows:
            data = record(url, ts, text)
            f.write(gzip.compress(data) if compress else data)


# --------------------------------------------------------------------------
# WAT (Common Crawl "metadata" records, public convention over ISO 28500):
# the link-graph distribution format — WARC-Type: metadata, Content-Type:
# application/json, payload = a JSON envelope whose
# Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata.Links list
# carries the page's outlinks ({"path": "A@/href", "url": ..., "text": ...}).
# Together with WARC (raw) and WET (text) this completes the format family
# Common Crawl actually publishes.
# --------------------------------------------------------------------------

WAT_SCHEMA = (
    "url string, warc_ts timestamp, "
    "links array<struct<href:string,anchor:string>>"
)


def wat_rows_from_file(path: str):
    """Yield (url, warc_ts, links) rows from one WAT file (plain or .gz);
    links = [(href, anchor), ...] from the envelope's HTML-Metadata.Links
    list. Malformed JSON payloads yield an empty link list (loud via the
    row, never a task abort — archive metadata lies like everything else)."""
    import json

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        stream = f if path.endswith(".gz") else io.BufferedReader(f)
        for headers, payload in iter_warc_records(stream):
            url = headers.get("warc-target-uri")
            if headers.get("warc-type") != "metadata" or not url:
                continue
            links: list[tuple[str | None, str | None]] = []
            try:
                env = json.loads(payload.decode("utf-8", errors="replace"))
                raw = (
                    env.get("Envelope", {})
                    .get("Payload-Metadata", {})
                    .get("HTTP-Response-Metadata", {})
                    .get("HTML-Metadata", {})
                    .get("Links", [])
                )
                # a null / non-list Links field is valid JSON but malformed
                # WAT — same empty-links contract, never a task abort
                for l in raw if isinstance(raw, list) else []:
                    if isinstance(l, dict):
                        links.append((l.get("url"), l.get("text")))
            except (ValueError, AttributeError, TypeError):
                links = []
            yield (url, _parse_warc_date(headers.get("warc-date")), links)


def read_wat(spark: SparkSession, paths: str | list[str], tasks: int | None = None) -> DataFrame:
    """WAT file(s)/glob → (url, warc_ts, links) DataFrame, parsed
    task-parallel (see _read_archives) — the entry point for link-graph
    pipelines that start from Common Crawl's metadata distribution
    instead of parsing raw html themselves."""
    return _read_archives(
        spark, paths, wat_rows_from_file, WAT_SCHEMA, ["url", "warc_ts", "links"], tasks
    )


def write_wat(rows, path: str, compress: bool | None = None) -> None:
    """(url, warc_ts, links) rows → one WAT file (metadata records; links =
    [(href, anchor), ...]). The JSON envelope is emitted with sorted keys
    and compact separators so output bytes are deterministic — shard
    manifests and round-trip tests depend on bit-stable archives."""
    import json

    compress = path.endswith(".gz") if compress is None else compress

    def record(url: str, ts, links) -> bytes:
        env = {
            "Envelope": {
                "WARC-Header-Metadata": {"WARC-Target-URI": url},
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Links": [
                                {
                                    "path": "A@/href",
                                    **({"url": h} if h is not None else {}),
                                    **({"text": a} if a is not None else {}),
                                }
                                for h, a in (links or [])
                            ]
                        }
                    }
                },
            }
        }
        body = json.dumps(env, separators=(",", ":"), sort_keys=True).encode()
        stamp = (ts or datetime(2024, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: metadata\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {stamp}\r\n"
            f"Content-Type: application/json\r\n"
            f"Content-Length: {len(body)}\r\n"
            f"\r\n"
        ).encode()
        return head + body + _CRLF + _CRLF

    with open(path, "wb") as f:
        for url, ts, links in rows:
            data = record(url, ts, links)
            f.write(gzip.compress(data) if compress else data)


def wat_from_pages(
    pages: DataFrame,
    selector: str = "a",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """PAGES → WAT metadata rows: per-page outlinks (href resolved against
    the page's own url, anchor text) extracted by the real html engine in
    ONE Arrow-batched stage — the generation side of the WAT family, so a
    crawl's link graph ships in the format downstream consumers (link
    analysis, PageRank seeds, anchor corpora) already read. Map-only, the
    html never leaves the executor."""
    from upton_spark.functions.udfs import extract_anchors_udf

    return pages.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        extract_anchors_udf(
            F.col(html_col), F.lit(selector), F.col(url_col)
        ).alias("links"),
    )
