"""Sitemap ingestion — ``sitemap.xml`` captures in the corpus → seed URLs.

Sitemaps (the public sitemaps.org 0.9 protocol) are the polite complement
to link discovery: hosts publish ``<urlset><url><loc>…</loc></url>…`` (or
a ``<sitemapindex>`` of child sitemaps). At web scale the sitemap bodies
already sit IN the crawl corpus (they're fetched like any page), so
discovery is a filter + extract over ``pages`` — never a driver loop:

- filter pushdown keeps the corpus scan to the ``sitemap.xml`` url subset
  (same shape as :func:`upton_spark.operators.robots.robots_from_pages`);
- ``<loc>`` extraction is a JVM-side ``regexp_extract_all`` + ``explode``
  (whole-stage codegen — sitemap XML is flat enough that the full HTML
  engine would be waste);
- dedup-latest per sitemap url on ``warc_ts`` mirrors page-fetch
  semantics (latest capture wins);
- one level of ``<sitemapindex>`` indirection is resolved by a self-join
  back onto the corpus (child sitemap bodies are also captures).

The result (host, url) feeds the frontier as seed candidates, gated by
robots/politeness like any other enqueue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_LOC_RE = r"<loc>\s*([^<\s][^<]*?)\s*</loc>"
_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_PRIORITY_RE = r"<priority>\s*([0-9.]+)\s*</priority>"
_LASTMOD_RE = r"<lastmod>\s*([^<\s]+)\s*</lastmod>"


def _latest_sitemap_bodies(pages: DataFrame, suffix: str) -> DataFrame:
    """Latest capture per sitemap url → (sitemap_url, host, body string)."""
    rows = pages.filter(F.col("url").endswith(suffix)).withColumn(
        "host", F.lower(F.parse_url(F.col("url"), F.lit("HOST")))
    )
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc_nulls_last())
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("url").alias("sitemap_url"),
            "host",
            F.col("html").cast("string").alias("body"),
        )
    )


def _locs(bodies: DataFrame) -> DataFrame:
    """(sitemap_url, host, body) → one row per <loc> entry."""
    return bodies.select(
        "sitemap_url",
        "host",
        F.explode(
            F.regexp_extract_all(F.col("body"), F.lit(_LOC_RE), F.lit(1))
        ).alias("loc"),
    )


def sitemap_entries(pages: DataFrame, suffix: str = "/sitemap.xml") -> DataFrame:
    """Per-URL sitemap entries WITH the sitemaps.org optional fields:
    (host, url, priority, lastmod). ``<url>…</url>`` blocks are split with
    one ``regexp_extract_all`` + ``explode`` (the ``(?s)`` flag spans
    newlines in both Java regex and RE2, so the same pattern replays in
    the DuckDB oracle); loc / priority / lastmod are per-block
    ``regexp_extract``s — all whole-stage codegen, no Python, no driver.

    ``priority`` defaults to 0.5 exactly as the protocol specifies when
    the tag is absent; ``lastmod`` stays a raw string (the protocol allows
    date-only and full W3C datetime forms — parsing is the caller's
    policy). Feed the result to :func:`sitemap_priorities` to turn
    publisher-declared priorities into crawl-admission order.
    """
    bodies = _latest_sitemap_bodies(pages, suffix)
    blocks = bodies.select(
        "host",
        F.explode(
            F.regexp_extract_all(F.col("body"), F.lit(_URL_BLOCK_RE), F.lit(1))
        ).alias("block"),
    )
    loc = F.regexp_extract(F.col("block"), _LOC_RE, 1)
    pr = F.regexp_extract(F.col("block"), _PRIORITY_RE, 1)
    lm = F.regexp_extract(F.col("block"), _LASTMOD_RE, 1)
    return blocks.select(
        "host",
        loc.alias("url"),
        F.when(pr == "", F.lit(0.5)).otherwise(pr.cast("double")).alias("priority"),
        F.when(lm == "", F.lit(None).cast("string")).otherwise(lm).alias("lastmod"),
    ).filter(F.col("url") != "")


def sitemap_priorities(entries: DataFrame) -> DataFrame:
    """sitemaps.org ``<priority>`` (0.0–1.0, higher = fetch first) → the
    Crawler's ``url_priorities`` table (url, priority:long) where LOWER
    fetches first: negated micro-quantized, the same monotone map-side
    transform as ``webgraph.pagerank_priorities`` /
    ``authority_priorities`` (no global sort at web scale). Publisher
    priorities are the third planning input next to PageRank and HITS —
    the only one the site itself declares."""
    return entries.select(
        "url",
        (-F.round(F.col("priority") * 1e6)).cast("long").alias("priority"),
    )


def sitemap_urls(pages: DataFrame, suffix: str = "/sitemap.xml") -> DataFrame:
    """Corpus ``sitemap.xml`` captures → distinct (host, url) seed
    candidates, fully distributed (rules never transit the driver).

    ``<sitemapindex>`` entries (a <loc> that itself ends in ``suffix`` or
    ``.xml`` under the sitemap path convention) are resolved ONE level by
    joining the referenced child sitemap's capture back out of the corpus;
    deeper nesting would iterate the same join (bounded by the protocol's
    practical depth of 2)."""
    bodies = _latest_sitemap_bodies(pages, suffix)
    locs = _locs(bodies)
    is_child_sitemap = F.col("loc").endswith(".xml")
    page_locs = locs.filter(~is_child_sitemap)
    child_refs = locs.filter(is_child_sitemap).select(
        F.col("loc").alias("child_url")
    )
    # child sitemaps are corpus captures too: resolve one indirection level
    all_xml = _latest_sitemap_bodies(pages, ".xml")
    child_bodies = all_xml.join(
        F.broadcast(child_refs.distinct()),
        all_xml.sitemap_url == F.col("child_url"),
        "left_semi",
    )
    child_locs = _locs(child_bodies).filter(~F.col("loc").endswith(".xml"))
    return (
        page_locs.unionByName(child_locs)
        .select("host", F.col("loc").alias("url"))
        .distinct()
    )
