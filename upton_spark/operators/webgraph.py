"""Web-graph / crawl-planning operators: PageRank, re-crawl deltas,
crawl-budget allocation, aggressive URL canonicalization.

These are the frontier-PLANNING side of a web-scale crawl (the reference
only walks one site; a 10^10-URL crawl has to decide WHAT to fetch next):
link-graph PageRank scores hosts/pages for scheduling priority, the
snapshot diff turns two crawl generations into an incremental re-crawl
list, the budget allocator turns host statistics into per-host fetch
quotas, and the canonicalizer collapses URL aliases before they enter the
frontier (the seen-set dedups the canonical form).

Everything is built-in-expression / join work — whole-stage codegen, no
Python in the hot path — and every operator is replayable in ANSI SQL, so
each carries a full DuckDB oracle in ``__spark_entry__``.

Scale shape:
- ``pagerank``: the classic join-agg iteration (contribution = rank /
  out-degree, shuffled by dst, teleport added map-side). Each iteration is
  one shuffle on the edge list; ranks are checkpointed per iteration so
  the plan stays shallow at any iteration count. AQE handles skewed
  in-degree (hub pages).
- ``snapshot_diff``: one full-outer join on the page key with content
  hashes — the standard incremental-crawl shape; at 100 TB both sides are
  bucketed by url_hash so the join is shuffle-free.
- ``allocate_budget``: pure per-row arithmetic over the (tiny) host
  aggregate; integer math so the quota is bit-stable across engines.
- ``canonical_url_col``: regexp + array expressions, fully codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# query params that never identify a distinct resource (analytics noise)
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "ref_src")


def canonical_url_col(url: Column) -> Column:
    """Aggressive canonical URL, entirely in built-in expressions:
    lower-case scheme and authority, default port stripped, fragment
    dropped, tracking params (utm_*, fbclid, gclid, ref_src) removed,
    remaining query params sorted, empty path normalized to '/'.

    This is the FRONTIER key (alias collapse before dedup); the
    conservative :func:`upton_spark.urlkit.canonicalize` remains the stash
    key, matching the reference's raw-URL MD5 stash
    (lib/upton/downloader.rb:126-128).
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    authority = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    authority = (
        F.when(scheme == "http", F.regexp_replace(authority, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(authority, ":443$", ""))
        .otherwise(authority)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("fbclid")
        & ~p.startswith("gclid")
        & ~p.startswith("ref_src"),
    )
    sorted_q = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key, entirely in
    built-in expressions: the web-archive-standard URL ordering form
    (Heritrix/OpenWayback/Common-Crawl index, public spec) — host
    lower-cased, one leading ``www.`` stripped, dot-separated labels
    REVERSED and comma-joined, then ``)`` + path (empty → ``/``) + raw
    query. ``http://www.Example.com/a/b?q=1`` →
    ``com,example)/a/b?q=1``.

    Why it matters at 100 TB: sorting or range-partitioning a URL corpus
    by SURT clusters every page of a site (and every subdomain of a
    domain) into adjacent rows/partitions — per-site processing reads
    contiguous ranges, columnar compression improves on the shared
    prefixes, and a domain's whole subtree is one range predicate
    (``surt LIKE 'com,example%'`` prunes at the file level). Plain URL
    order scatters a domain across the keyspace (www./m./cdn. subdomains
    sort apart). Ports are dropped (Spark's parse_url HOST excludes
    them); query params are carried verbatim, NOT re-sorted —
    canonical_url_col is the alias-collapse key, this is the SORT key."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.parse_url(url, F.lit("QUERY"))
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(query.isNull() | (query == ""), F.lit("")).otherwise(
            F.concat(F.lit("?"), query)
        ),
    )


def surt_keys(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """``pages`` + a ``surt`` column (see :func:`surt_key`) — the sort /
    range-partition key for site-local processing. Map-only codegen."""
    return pages.withColumn("surt", surt_key(F.col(url_col)))


def cdx_index(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> DataFrame:
    """Crawled captures → a CDX-shaped capture index (the public
    CDX / CDXJ format Heritrix, OpenWayback and Common Crawl publish
    alongside WARCs): one row per capture with ``urlkey`` (the SURT sort
    key), ``ts14`` (the 14-digit yyyyMMddHHmmss capture timestamp),
    original ``url``, ``digest`` (md5 hex of the raw payload bytes — the
    dedup/revisit key) and ``length`` (payload byte count), sorted by
    (urlkey, ts14) so a site's capture history is one contiguous range.

    Entirely built-in expressions (surt regexps, ``date_format``, ``md5``,
    ``length`` on binary) — map-only whole-stage codegen plus the final
    range-partitioned sort, which is exactly how the public CDX files are
    produced (sorted shards, merged by key range). At 100 TB the sort is a
    range exchange on ``urlkey``; everything upstream is scan-local.
    Reference scope: the reference stashes pages by MD5 of the url
    (lib/upton/downloader.rb:126-128) with no capture index at all —
    this is the web-archive-scale replacement for "is this page stashed".
    """
    return (
        pages.select(
            surt_key(F.col(url_col)).alias("urlkey"),
            F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts14"),
            F.col(url_col).alias("url"),
            F.md5(F.col(payload_col).cast("binary")).alias("digest"),
            F.length(F.col(payload_col).cast("binary")).cast("long").alias("length"),
        )
        .orderBy("urlkey", "ts14")
    )


def anchor_text_stats(
    links: DataFrame,
    target_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Inlink anchor-text aggregation per link target — the classic
    web-corpus signal (anchor text describes the TARGET page better than
    the page itself; search indexes and anchor-text training corpora, e.g.
    the public DOLMA / MS MARCO anchor sets, are built exactly this way).

    Input: one row per link (``target_col``, ``anchor_col``); anchors come
    from the crawl's own link extraction (href + anchor text, SURVEY §2
    row 12). Output per target: ``inlinks`` (total inlink count),
    ``n_anchors`` (distinct anchor strings), ``top_anchor`` /
    ``top_anchor_count`` (most frequent anchor, ties broken by the
    lexicographically smallest anchor so the result is deterministic).

    Scale shape: the raw link list never carries through a window — links
    are first collapsed to (target, anchor) counts (partial-agg shuffle on
    the composite key, so a mega-target's rows still spread across
    reducers until the collapse), then the per-target window and final
    rollup run over the collapsed counts, which are bounded by distinct
    anchor vocabulary per target, not by inlink count. No Python anywhere.
    """
    per_anchor = links.groupBy(
        F.col(target_col).alias("target"), F.col(anchor_col).alias("anchor")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("target").orderBy(F.col("cnt").desc(), F.col("anchor"))
    ranked = per_anchor.withColumn("_rn", F.row_number().over(w))
    return ranked.groupBy("target").agg(
        F.sum("cnt").alias("inlinks"),
        F.count(F.lit(1)).alias("n_anchors"),
        F.max(F.when(F.col("_rn") == 1, F.col("anchor"))).alias("top_anchor"),
        F.max(F.when(F.col("_rn") == 1, F.col("cnt"))).alias("top_anchor_count"),
    )


# --------------------------------------------------------------------------
# link-graph PageRank
# --------------------------------------------------------------------------


def synth_link_graph(docs: DataFrame, fanout: int = 3) -> DataFrame:
    """Deterministic synthetic link graph over ``documents`` (tests/bench:
    no external data allowed): doc ``d`` links to
    ``(d*d + 7kd + k + 1) mod N`` for k in 0..fanout-1, self-loops
    removed, deduped. The quadratic map is deliberately NON-bijective so
    in-degrees are skewed (hubs + orphan nodes) and PageRank has real
    structure to find; pure integer arithmetic so the oracle reproduces
    the edge list exactly. Returns (src, dst)."""
    n = docs.count()
    ks = F.explode(F.array(*[F.lit(k) for k in range(fanout)])).alias("k")
    dst = (
        F.col("src") * F.col("src") + F.lit(7) * F.col("k") * F.col("src") + F.col("k") + 1
    ) % F.lit(n)
    return (
        docs.select(F.col("doc_id").alias("src"), ks)
        .withColumn("dst", dst)
        .filter(F.col("dst") != F.col("src"))
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank as pure DataFrame joins/aggregations.

    ``nodes`` must have ``doc_id``; ``edges`` (src, dst). Ranks are
    N-scaled (mean 1.0) so cross-engine float noise sits ~1e-13 below any
    reasonable rounding. Per iteration: one shuffle (contributions grouped
    by dst) + a join back to the node list; ranks are localCheckpoint()ed
    so plan depth stays O(1) per iteration, not cumulative. Dangling mass
    is redistributed uniformly (the standard stochastic fix), so total
    rank stays N and the result matches the textbook power iteration.
    """
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # edge list with per-src degree is reused every iteration: materialize once
    ed = edges.join(outdeg, "src").localCheckpoint()
    ranks = nodes.select(F.col("doc_id").alias("node")).withColumn("rank", F.lit(1.0))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling nodes (no outlinks) donate their rank uniformly
        dangling = ranks.join(
            outdeg, ranks.node == outdeg.src, "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
        base = ranks.select("node")
        ranks = (
            base.join(contrib, base.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("d") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select(F.col("node").alias("doc_id"), "rank")


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999, public) as pure DataFrame
    joins/aggregations — PageRank's crawl-planning sibling: ``authority``
    finds content pages many hubs point AT, ``hub`` finds index/listing
    pages that point at good content (exactly the reference's index-page →
    instance-page model, scored from the link graph itself).

    Per iteration: authority = in-flow of hub scores, then hub = out-flow
    of the NEW authorities (the classic update order); each side is one
    key-partitioned join-agg shuffle + a mean-normalization (scores
    N-scaled to mean 1.0 — the same convention as :func:`pagerank`, and a
    broadcast scalar rather than a per-iteration driver action);
    localCheckpoint bounds plan depth at O(1) per iteration. Scores are
    deterministic up to float summation order (~1e-15) — round outputs
    (the oracle rounds to 6) before hashing across engines.

    Returns (doc_id, authority, hub)."""
    n = float(nodes.count())
    ed = edges.select("src", "dst").localCheckpoint()
    base = nodes.select(F.col("doc_id").alias("node"))
    hubs = base.withColumn("hub", F.lit(1.0))
    auths = base.withColumn("auth", F.lit(1.0))

    def _normalized(df: DataFrame, col: str) -> DataFrame:
        m = df.agg((F.sum(col) / F.lit(n)).alias("_m"))
        # zero-mass guard: on an edgeless graph (or one where all flow is 0)
        # the mean is 0 and a bare division would turn every score into
        # NULL/NaN silently — short-circuit to exact zero scores instead
        # (still a broadcast scalar, no extra driver action)
        return (
            df.crossJoin(F.broadcast(m))
            .select(
                "node",
                F.when(F.col("_m") == 0.0, F.lit(0.0))
                .otherwise(F.col(col) / F.col("_m"))
                .alias(col),
            )
            .localCheckpoint()
        )

    for _ in range(iters):
        a_in = (
            ed.join(hubs, ed.src == hubs.node)
            .groupBy("dst")
            .agg(F.sum("hub").alias("_s"))
        )
        auths = _normalized(
            base.join(a_in, base.node == a_in.dst, "left").select(
                "node", F.coalesce("_s", F.lit(0.0)).alias("auth")
            ),
            "auth",
        )
        h_out = (
            ed.join(auths, ed.dst == auths.node)
            .groupBy("src")
            .agg(F.sum("auth").alias("_s"))
        )
        hubs = _normalized(
            base.join(h_out, base.node == h_out.src, "left").select(
                "node", F.coalesce("_s", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
    return (
        auths.join(hubs, "node")
        .select(F.col("node").alias("doc_id"), "auth", "hub")
        .withColumnRenamed("auth", "authority")
    )


def pagerank_priorities(
    ranks: DataFrame, key_col: str = "url", rank_col: str = "rank"
) -> DataFrame:
    """PageRank scores → the Crawler's ``url_priorities`` table (key,
    priority:long) where LOWER priority fetches first: priority is the
    NEGATED micro-quantized rank (-round(rank * 10^6)) — a monotone,
    purely map-side transform, so no global sort at web scale (a dense
    row_number ordering would be a single-partition sort over the whole
    rank table). Ties at the same quantized rank keep the frontier's
    deterministic (seed_id, instance_index) tie-break."""
    return ranks.select(
        F.col(key_col).alias("url"),
        (-F.round(F.col(rank_col) * 1e6)).cast("long").alias("priority"),
    )


def authority_priorities(
    scores: DataFrame, key_col: str = "url", score_col: str = "authority"
) -> DataFrame:
    """HITS scores → the Crawler's ``url_priorities`` table, the authority
    twin of :func:`pagerank_priorities` (same negated micro-quantized,
    no-global-sort shape). Feed it ``hits()`` output keyed by url and a
    planned crawl fetches high-authority content pages first — the natural
    ranking for the reference's index-page → instance-page model, where
    hubs are the index pages the crawl already walks and authorities are
    the instance pages worth budget. Ties at the same quantized score keep
    the frontier's deterministic (seed_id, instance_index) tie-break."""
    return scores.select(
        F.col(key_col).alias("url"),
        (-F.round(F.col(score_col) * 1e6)).cast("long").alias("priority"),
    )


# --------------------------------------------------------------------------
# re-crawl snapshot diff
# --------------------------------------------------------------------------


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str = "url", content: str = "content_hash"
) -> DataFrame:
    """Two crawl generations → per-page status (added / removed / changed /
    unchanged): ONE full-outer join on the page key comparing content
    hashes — the incremental-crawl primitive (re-fetch only
    added+changed). At scale both snapshots are bucketed by the key hash,
    making this join shuffle-free; the output feeds the next frontier."""
    o = old.select(F.col(key).alias("k"), F.col(content).alias("old_hash"))
    nw = new.select(F.col(key).alias("k"), F.col(content).alias("new_hash"))
    status = (
        F.when(F.col("old_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .when(F.col("old_hash") != F.col("new_hash"), "changed")
        .otherwise("unchanged")
    )
    return o.join(nw, "k", "full_outer").select(
        F.col("k").alias(key), status.alias("status")
    )


# --------------------------------------------------------------------------
# crawl-budget allocation
# --------------------------------------------------------------------------


def allocate_budget(
    host_stats: DataFrame,
    total_budget: int,
    floor: int = 2,
    cap: int = 50,
    host_col: str = "host",
    weight_col: str = "n_docs",
) -> DataFrame:
    """Per-host fetch quota from host weights: proportional share of
    ``total_budget`` (integer floor-division — bit-stable across engines),
    clamped to [floor, cap]. The politeness scheduler consumes the quota
    as its per-round token budget; proportional-by-size with a floor is
    the standard revisit policy (big hosts get more slots, every known
    host keeps a heartbeat). Adds ``share`` (pre-clamp) for audit."""
    total_w = host_stats.agg(F.sum(weight_col).cast("long").alias("tw"))
    return (
        host_stats.crossJoin(F.broadcast(total_w))
        .select(
            host_col,
            F.col(weight_col),
            (F.col(weight_col).cast("long") * F.lit(int(total_budget)))
            .cast("long")
            .alias("_num"),
            F.col("tw"),
        )
        .withColumn("share", F.expr("div(_num, tw)"))
        .withColumn(
            "budget",
            F.greatest(
                F.lit(int(floor)).cast("long"),
                F.least(F.lit(int(cap)).cast("long"), F.col("share")),
            ),
        )
        .drop("_num", "tw")
    )


def blocklist_gate(
    frontier: DataFrame,
    blocked_hosts: DataFrame | None = None,
    url_patterns: list[str] | None = None,
    url_col: str = "url",
    host_col_name: str = "host",
) -> DataFrame:
    """Crawl-planning URL blocklist: flag frontier rows whose host is on a
    blocklist table (UT1-style domain lists) or whose url matches any of a
    bounded set of Java-regex patterns (tracking endpoints, infinite
    calendars, session-id traps). Adds ``blocked`` + ``block_reason``
    ('host' wins over 'pattern'); the caller filters or routes.

    100-TB shape: the host list (10^5-10^6 rows for real blocklists)
    broadcast-joins onto the frontier — no frontier shuffle; the pattern
    check is a codegen rlike chain, evaluated only on host-clean rows."""
    out = frontier
    if blocked_hosts is not None:
        marks = blocked_hosts.select(
            F.col(host_col_name), F.lit(True).alias("_host_blocked")
        ).dropDuplicates([host_col_name])
        out = out.join(F.broadcast(marks), host_col_name, "left")
    else:
        out = out.withColumn("_host_blocked", F.lit(None).cast("boolean"))
    pat = F.lit(False)
    for p in url_patterns or []:
        pat = pat | F.col(url_col).rlike(p)
    host_hit = F.coalesce("_host_blocked", F.lit(False))
    return (
        out.withColumn(
            "block_reason",
            F.when(host_hit, "host").when(~host_hit & pat, "pattern"),
        )
        .withColumn("blocked", F.col("block_reason").isNotNull())
        .drop("_host_blocked")
    )


def revisit_intervals(
    diff: DataFrame,
    prev: DataFrame | None = None,
    base_hours: int = 24,
    min_hours: int = 1,
    max_hours: int = 24 * 30,
    url_col: str = "url",
) -> DataFrame:
    """Adaptive revisit scheduling (Cho & Garcia-Molina-style exponential
    adjustment, public): pages that CHANGED between crawl generations halve
    their revisit interval, UNCHANGED pages double it (both clamped),
    ADDED pages start at ``base_hours``, REMOVED pages drop out. ``prev``
    optionally carries the last (url, interval_hours); absent rows start
    from base. Integer halving/doubling — bit-stable across engines.

    100-TB shape: one key-partitioned left join onto the diff (both sides
    bucket by url hash at scale) and a codegen CASE — no driver state."""
    out = diff.filter(F.col("status") != "removed")
    if prev is not None:
        out = out.join(
            prev.select(url_col, F.col("interval_hours").alias("_prev")),
            url_col,
            "left",
        )
    else:
        out = out.withColumn("_prev", F.lit(None).cast("long"))
    cur = F.coalesce(F.col("_prev"), F.lit(int(base_hours))).cast("long")
    # floor-halving keeps everything integer (double->long casts TRUNCATE
    # on Spark but ROUND on some engines — floor is unambiguous)
    interval = (
        F.when(
            F.col("status") == "changed",
            F.greatest(F.lit(int(min_hours)).cast("long"), F.floor(cur / 2)),
        )
        .when(F.col("status") == "unchanged", F.least(F.lit(int(max_hours)).cast("long"), cur * 2))
        .otherwise(F.lit(int(base_hours)))
        .cast("long")
    )
    return out.select(url_col, "status", interval.alias("interval_hours"))


# --------------------------------------------------------------------------
# redirects: meta-refresh extraction + chain resolution
# --------------------------------------------------------------------------

# <meta http-equiv="refresh" content="N; url=TARGET"> — the client-side
# redirect form visible in a body-only corpus (WARC 3xx Location headers
# live outside the pages schema). Case-insensitive; attribute order free.
_META_REFRESH_TAG_RE = r"(?i)<meta\b[^>]*http-equiv\s*=\s*[\"']?refresh[\"']?[^>]*>"
_REFRESH_URL_RE = r"(?i)content\s*=\s*[\"']?\s*[0-9.]*\s*;\s*url\s*=\s*([^\"'>\s]+)"


def meta_refresh_redirects(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Client-side ``<meta http-equiv=refresh>`` redirects extracted from
    captured html → one (src, dst) edge per redirecting page. The tag and
    its ``url=`` target are two codegen ``regexp_extract``s over the
    decoded body (first tag wins — browser behavior); relative targets
    resolve against the capture url through the same Arrow resolve UDF
    link extraction uses (urlkit.resolve_url goldens), absolute targets
    pass through. Pages without a refresh target produce no edge; a
    refresh with no url= part (a pure reload) is dropped too.

    Scale shape: map-only — scan → two regexps → one Arrow batch for the
    resolve; no shuffle, no driver. Feed the result to
    :func:`resolve_redirects` to collapse chains, or negate into a
    blocklist (redirect pages carry no extractable content).
    """
    from upton_spark.functions.udfs import resolve_url_udf

    body = F.col(html_col).cast("string")
    tag = F.regexp_extract(body, _META_REFRESH_TAG_RE, 0)
    raw = F.regexp_extract(tag, _REFRESH_URL_RE, 1)
    return (
        pages.select(
            F.col(url_col).alias("src"),
            F.when(raw == "", None).otherwise(raw).alias("_raw"),
        )
        .filter(F.col("_raw").isNotNull())
        .select("src", resolve_url_udf(F.col("_raw"), F.col("src")).alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """Redirect-CHAIN resolution by pointer doubling: each round every
    pointer jumps to its pointee's pointee, so a chain of length L
    collapses in ceil(log2(L)) self-joins instead of L sequential ones —
    at web scale (Common Crawl publishes ~1% of fetches as redirects,
    chains of 3-5 are routine) that is ~5 shuffles total, not 32.

    Input: one (src, dst) edge per redirecting url (duplicate srcs collapse
    to the MIN dst so the map is functional and deterministic). Output per
    src: ``final_url`` (the first non-redirecting url on the chain),
    ``hops`` (exact edges traversed), ``unresolved`` (true for cycles and
    for chains longer than ``max_hops`` — final_url/hops NULL there, loud
    in the data rather than silently wrong). ``max_hops`` rounds up to the
    next power of two (the doubling granularity).

    100-TB shape: log2(max_hops) key-partitioned self-joins (AQE handles
    the shrinking build side as chains resolve early) + one final
    broadcast-able semi marker join. No iteration-unbounded driver loop,
    no Python.
    """
    import math

    m = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src")
        .agg(F.min("dst").alias("next"))
    )
    cur = m.withColumn("hops", F.lit(1).cast("long"))
    rounds = max(1, math.ceil(math.log2(max(2, int(max_hops)))))
    for _ in range(rounds):
        b = cur.select(
            F.col("src").alias("_b_src"),
            F.col("next").alias("_b_next"),
            F.col("hops").alias("_b_hops"),
        )
        cur = cur.join(b, cur["next"] == b["_b_src"], "left").select(
            "src",
            F.coalesce("_b_next", "next").alias("next"),
            (F.col("hops") + F.coalesce("_b_hops", F.lit(0))).alias("hops"),
        )
    # a pointer still sitting on a url that ITSELF redirects after the
    # final round is a cycle (or an over-max_hops chain): flag, don't lie
    more = m.select(F.col("src").alias("next"), F.lit(True).alias("_more"))
    return cur.join(more, "next", "left").select(
        "src",
        F.when(F.col("_more").isNotNull(), None).otherwise(F.col("next")).alias(
            "final_url"
        ),
        F.when(F.col("_more").isNotNull(), None)
        .otherwise(F.col("hops"))
        .cast("long")
        .alias("hops"),
        F.col("_more").isNotNull().alias("unresolved"),
    )


_CANONICAL_TAG_RE = r"(?i)<link\b[^>]*rel\s*=\s*[\"']?canonical[\"']?[^>]*>"
_HREF_ATTR_RE = r"(?i)href\s*=\s*[\"']?([^\"'>\s]+)"


def canonical_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``<link rel=canonical href=...>`` declarations extracted from
    captured html — the webmaster-DECLARED duplicate signal (every CMS
    emits it; Google's dup clustering consumes it), complementing the
    content-side dedup family (minhash/simhash/semantic). One (src,
    canonical, is_self) row per declaring page: first tag wins, relative
    hrefs resolve against the capture url (same Arrow resolve UDF as link
    extraction), ``is_self`` marks the common self-canonical case.

    Scale shape: map-only — two codegen regexps + one Arrow batch, no
    shuffle. Cross-page canonical CHAINS (a→b where b itself declares c)
    collapse through :func:`resolve_redirects` on the non-self edges; the
    resolved map feeds ``Crawler(redirect_map=...)`` so a re-crawl spends
    politeness tokens only on canonical targets.
    """
    from upton_spark.functions.udfs import resolve_url_udf

    body = F.col(html_col).cast("string")
    tag = F.regexp_extract(body, _CANONICAL_TAG_RE, 0)
    raw = F.regexp_extract(tag, _HREF_ATTR_RE, 1)
    return (
        pages.select(
            F.col(url_col).alias("src"),
            F.when(raw == "", None).otherwise(raw).alias("_raw"),
        )
        .filter(F.col("_raw").isNotNull())
        .select("src", resolve_url_udf(F.col("_raw"), F.col("src")).alias("canonical"))
        .filter(F.col("canonical").isNotNull())
        .withColumn("is_self", F.col("canonical") == F.col("src"))
    )


# --------------------------------------------------------------------------
# registrable domain (eTLD+1)
# --------------------------------------------------------------------------

# Vendored snapshot of common PUBLIC SUFFIX LIST rules (publicsuffix.org —
# public data; exact rules only, no wildcard/exception forms). Hosts under
# a multi-label public suffix ('site.co.uk') or a private-section suffix
# ('user.github.io') group WRONG under naive last-two-labels logic — at
# crawl scale that merges every *.blogspot.com blog into one politeness
# bucket and leaks shared-host pages across train/test splits. Pass a
# fuller rule list via ``suffixes=`` to track the live PSL.
_PSL_SNAPSHOT = [
    # ccTLD second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.za", "org.za", "web.za", "net.za",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
    "com.ar", "com.tr", "gen.tr", "web.tr",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ac.in", "edu.in",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr",
    "com.sg", "com.hk", "com.tw", "com.my", "com.ph", "com.pk",
    "co.id", "web.id", "co.th", "in.th", "ac.th",
    "com.vn", "com.ua", "in.ua", "co.il", "org.il", "ac.il",
    "com.pl", "net.pl", "org.pl", "edu.pl", "waw.pl",
    "com.eg", "com.sa", "com.ng", "co.ke",
    # private-section hosting suffixes (each customer is its own site)
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "netlify.app", "vercel.app", "web.app",
    "cloudfront.net", "azurewebsites.net", "appspot.com", "pages.dev",
    "s3.amazonaws.com",
]


def registrable_domains(
    df: DataFrame,
    host_col: str = "host",
    suffixes: list[str] | None = None,
    out_col: str = "domain",
) -> DataFrame:
    """Registrable domain (eTLD+1) per host by longest-public-suffix match
    — the grouping key crawl politeness, per-site budgets, and
    leakage-safe splits actually need at web scale (grouping by raw host
    treats every ``*.blogspot.com`` blog as one site and every
    ``a.example.com``/``b.example.com`` pair as two).

    Scale shape: one tiny suffix dim per label depth, broadcast-joined
    longest-depth-first onto the host's last-k-label slices — NO explode,
    NO window, NO shuffle of the big side; everything else is codegen
    array ops. Unmatched hosts fall back to the PSL's implicit ``*`` rule
    (last label is the suffix → domain = last two labels); hosts that ARE
    a suffix, and single-label hosts, yield NULL (no registrable domain —
    loud, never a fake key).
    """
    rules = sorted(set(suffixes or _PSL_SNAPSHOT))
    spark = df.sparkSession
    host = F.lower(F.col(host_col))
    labels = F.split(host, r"\.")
    nl = F.size(labels)
    depths = sorted({r.count(".") + 1 for r in rules}, reverse=True)
    out = df.withColumn("_labels", labels)
    hits = []
    for k in depths:
        dim = spark.createDataFrame(
            [(r,) for r in rules if r.count(".") + 1 == k], f"_sfx_{k} string"
        )
        cand = F.when(
            nl > k, F.array_join(F.slice(F.col("_labels"), -k, k), ".")
        ).alias(f"_cand_{k}")
        out = out.withColumn(f"_cand_{k}", cand).join(
            F.broadcast(dim), F.col(f"_cand_{k}") == F.col(f"_sfx_{k}"), "left"
        )
        hits.append((k, F.col(f"_sfx_{k}")))
    domain = None
    # longest matching suffix wins; fallback: the implicit '*' rule
    fallback = F.when(
        nl >= 2, F.array_join(F.slice(F.col("_labels"), -2, 2), ".")
    )
    for k, hit in reversed(hits):
        matched = F.array_join(F.slice(F.col("_labels"), -(k + 1), k + 1), ".")
        nxt = domain if domain is not None else fallback
        domain = F.when(hit.isNotNull(), matched).otherwise(nxt)
    # a host that IS a public suffix has no registrable domain at all
    domain = F.when(host.isin(rules), F.lit(None).cast("string")).otherwise(domain)
    drop = ["_labels"] + [c for k in depths for c in (f"_cand_{k}", f"_sfx_{k}")]
    return out.withColumn(out_col, domain).drop(*drop)


def url_trap_scores(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawler-trap heuristics per url — the admission-side defense
    against infinite url spaces (calendar pages, session-id explosions,
    self-similar path loops) that no politeness budget survives: Heritrix
    ships the same class of pathological-path / too-many-hops rules.
    Features, all from the url string alone: ``depth`` (non-empty path
    segments), ``dup_segments`` (segments minus distinct segments — a
    path like /x/x/x/x is the classic loop trap), ``param_count``
    (query parameters), ``has_calendar`` (a /YYYY/MM/ date pattern —
    calendar spaces enumerate forever). ``is_trap`` composes them:
    dup_segments >= 3, depth > 8, param_count >= 6, or a calendar
    pattern at depth >= 4. Thresholds are heuristics — tune per crawl;
    feed flagged urls to ``blocklist_url_patterns`` or drop pre-admission.

    100-TB shape: pure whole-stage codegen (parse_url + array ops +
    one regexp) — map-only, inside the scan, no Python, no shuffle.
    """
    url = F.col(url_col)
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.parse_url(url, F.lit("QUERY"))
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    depth = F.size(segs)
    dups = depth - F.size(F.array_distinct(segs))
    params = F.when(
        query.isNull() | (query == ""), F.lit(0)
    ).otherwise(F.size(F.split(query, "&")))
    cal = path.rlike(r"/(19|20)\d{2}/(0?[1-9]|1[0-2])(/|$)")
    return (
        df.withColumn("depth", depth.cast("int"))
        .withColumn("dup_segments", dups.cast("int"))
        .withColumn("param_count", params.cast("int"))
        .withColumn("has_calendar", cal)
        .withColumn(
            "is_trap",
            (F.col("dup_segments") >= 3)
            | (F.col("depth") > 8)
            | (F.col("param_count") >= 6)
            | (F.col("has_calendar") & (F.col("depth") >= 4)),
        )
    )


def host_graph(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    level: str = "host",
) -> DataFrame:
    """URL-level link edges → the HOST- or DOMAIN-level webgraph — the
    aggregate artifact Common Crawl actually publishes alongside its page
    crawls (cc host/domain webgraph releases): one weighted edge per
    (src, dst) site pair. ``level='host'`` keys on the lowercased url
    host (pure codegen ``parse_url``); ``level='domain'`` collapses
    mirrors/subdomains to the registrable domain (eTLD+1) via the
    broadcast PSL match — edges whose side has no registrable domain
    (bare suffixes, single labels) drop loudly rather than grouping
    under a fake key. Self-loops (intra-site links) are kept — consumers
    filter them; dropping silently would misreport site link counts.

    Scale shape: host extraction / PSL match are map-side (codegen +
    broadcast dims), then ONE partial-aggregable groupBy on the (src,
    dst) site pair — at 10^10 edges the exchange carries site pairs, not
    URLs, and partial aggregation collapses each task's local duplicates
    before the shuffle. Nothing pairwise, no window.
    """
    if level not in ("host", "domain"):
        raise ValueError(f"level must be 'host' or 'domain', got {level!r}")
    edges = links.select(
        F.lower(F.parse_url(F.col(src_col), F.lit("HOST"))).alias("src_host"),
        F.lower(F.parse_url(F.col(dst_col), F.lit("HOST"))).alias("dst_host"),
    ).filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
    if level == "domain":
        edges = registrable_domains(edges, host_col="src_host", out_col="src_site")
        edges = registrable_domains(edges, host_col="dst_host", out_col="dst_site")
        edges = edges.filter(
            F.col("src_site").isNotNull() & F.col("dst_site").isNotNull()
        )
    else:
        edges = edges.select(
            F.col("src_host").alias("src_site"), F.col("dst_host").alias("dst_site")
        )
    return edges.groupBy("src_site", "dst_site").agg(
        F.count("*").cast("long").alias("n_links")
    )


def mirror_host_pairs(
    pages: DataFrame,
    host_col: str = "host",
    content_col: str = "content_hash",
    threshold: float = 0.5,
) -> DataFrame:
    """Mirror-site detection: host pairs whose CONTENT-HASH sets overlap
    past ``threshold`` Jaccard — cdn./www. mirrors, country mirrors, and
    scraper copies serve near-identical page sets, and a frontier that
    treats them as distinct sites spends its politeness budget fetching
    the same corpus twice (Heritrix/Common-Crawl mirror collapse).

    Scale shape: the pair join is keyed on content_hash — two hosts meet
    ONLY where they actually share a page hash, so work is proportional
    to shared content, never |hosts|²; per-host set sizes come from one
    partial-aggregable rollup, and a shared hash contributes one partial
    count per (host_a, host_b) group. Hosts sharing nothing never pair.
    Pure DataFrame ops, no Python; Jaccard from exact int64 counts.

    Returns (host_a, host_b, n_shared, n_a, n_b, jaccard) with
    host_a < host_b.
    """
    hc = pages.select(
        F.col(host_col).alias("h"), F.col(content_col).alias("c")
    ).distinct()
    sizes = hc.groupBy("h").agg(F.count("*").cast("long").alias("n"))
    a = hc.select(F.col("h").alias("host_a"), "c")
    b = hc.select(F.col("h").alias("host_b"), "c")
    shared = (
        a.join(b, "c")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    out = (
        shared.join(sizes.withColumnRenamed("h", "host_a").withColumnRenamed("n", "n_a"), "host_a")
        .join(sizes.withColumnRenamed("h", "host_b").withColumnRenamed("n", "n_b"), "host_b")
        .withColumn(
            "jaccard",
            F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "host_a", "host_b", "n_shared", "n_a", "n_b", F.round("jaccard", 6).alias("jaccard")
    )
