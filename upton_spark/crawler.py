"""The crawl engine — Upton's scrape lifecycle as a Spark round loop.

Reproduces the reference lifecycle (SURVEY.md §3: index resolution →
pagination → instance fetch → per-page block → flatten) as driver-side
iterative batch over DataFrames:

* **index phase** — one pagination page per seed per round (the chain is
  inherently sequential per seed: page k+1's URL depends on page k's body
  emptiness, lib/upton.rb:295-311), parallel across seeds/hosts; link
  projection via the vectorized extraction UDF with NULL hrefs preserved.
* **instance phase** — frontier rows `(seed, instance_index, url)`; fetch =
  join against the ``pages`` corpus (the corpus *is* the stash:
  lib/upton/downloader.rb:70-98 becomes an anti-join + join); dedup via
  broadcast Bloom + exact-confirm anti-join; robots gate; per-host
  token-bucket politeness with deferral; every round is a catalog snapshot
  commit carrying per-partition lineage → kill/resume-safe.
* **extraction phase** — the user "block" as a pandas UDF over the html
  column, in the reference's three canned shapes (text / list / table,
  lib/upton/utils.rb:20-40) plus identity (the reference's default block
  ``Proc.new{|x| x}``, lib/upton.rb:49).

Determinism: every ordering comes from explicit columns
(seed_id, page_round, pos, instance_index, pagination_index, match_index) —
never partition iteration order or monotonically_increasing_id.

Scale design (10^10 frontier): the only per-round shuffles are (a) the hash
exchange on ``host`` for politeness ranking — which is also the frontier's
storage partitioning, so it amortizes; (b) the url join frontier×pages —
sort-merge under AQE with skew-join splitting; hot hosts are additionally
capped by politeness itself (per-host tokens bound per-host work per round).
Selectors/config ride a broadcast seed dimension. Bloom membership runs
JVM-hashed + numpy-vectorized; false-positive confirmation touches only the
maybe-seen subset. Per-round decision accounting is ONE aggregation job
(groupBy decision × host-bucket), not N driver count() actions.
"""

from __future__ import annotations

import atexit
import contextlib
import os
import shutil
import tempfile
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from upton_spark import schemas
from upton_spark.functions.udfs import (
    decode_html_udf,
    extract_links_udf,
    extract_list_udf,
    extract_table_udf,
    extract_text_udf,
    host_col,
    main_content_udf,
    next_index_page_url_udf,
    resolve_url_udf,
)
from upton_spark.operators import dedup as dedup_ops
from upton_spark.operators import partitioning as part_ops
from upton_spark.operators import politeness as polite_ops
from upton_spark.operators import robots as robots_ops
from upton_spark.sources.catalog import ManifestCatalog

N_LINEAGE_BUCKETS = 32  # host-hash buckets used as lineage "partitions"
# small-crawl job-diet bounds (see Crawler.job_diet): a crawl whose seed
# list and built frontier are both under these is driver-latency-bound, not
# data-bound, so adaptive re-planning only adds per-stage driver jobs
JOB_DIET_MAX_SEEDS = 64
JOB_DIET_MAX_ROWS = 20_000
# dieted shuffle width: wide enough that JOB_DIET_MAX_ROWS rows per
# partition stay trivially in memory, narrow enough that task launches
# stop dominating tiny stages
JOB_DIET_SHUFFLE_WIDTH = 4


@dataclass
class SeedSpec:
    """One crawl job seed — the reference Scraper's constructor+attrs surface
    (lib/upton.rb:65-114). Either ``seed_url`` (+ index_selector) for
    index-page mode or ``url_list`` for the explicit-array mode."""

    seed_id: int
    seed_url: str | None = None
    url_list: list[str] | None = None
    index_selector: str = ""
    extract_selector: str | None = None
    extract_kind: str = "text"  # text | list | table | identity | content
    # 'content' = selector-free main-content extraction (boilerplate
    # removal, operators.boilerplate) — the training-data crawl kind
    paginated: bool = False
    pagination_param: str = "page"
    pagination_max_pages: int = 2
    pagination_start_index: int = 1
    pagination_interval: int = 1
    sleep_time_between_requests: float = 30.0


@dataclass
class CrawlResult:
    extracted: DataFrame
    frontier: DataFrame
    urls_seen: DataFrame
    lineage: DataFrame
    links: DataFrame


_LINKS_SCHEMA = T.StructType(
    [
        T.StructField("seed_id", T.IntegerType(), False),
        T.StructField("page_round", T.IntegerType(), False),
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("url", T.StringType(), True),
    ]
)


class KilledCrawl(RuntimeError):
    """Raised by stop_after_round to simulate a mid-crawl kill in tests."""

    def __init__(self, round_no: int):
        super().__init__(f"crawl killed after round {round_no}")
        self.round_no = round_no


# session-lifetime inverted file index per corpus (see _url_file_map),
# keyed by SparkSession identity so a map never outlives its session;
# single entry — a new corpus unpersists and replaces the previous map.
_URL_FILE_MAP_CACHE: dict[tuple, DataFrame] = {}
# per-(session, corpus) count of driver-known-IN prescans, driving the
# build-on-second-prescan policy in _prune_file_list
_PRESCAN_COUNTS: dict[tuple, int] = {}
# single-slot cache of the latest oneshot decisions pin per session (see
# _run_fetch_rounds_oneshot): the pin must outlive its crawl (the returned
# frontier/seen read it lazily), but without a slot every oneshot crawl in
# a long-lived session would leak one cached DataFrame
_ONESHOT_DECISIONS_PIN: dict[str, DataFrame] = {}


def _tokens_col(sleep_col, round_budget_s: float):
    """Live-fetch tokens per host per round — the reference's
    sleep_time_between_requests (lib/upton.rb:96) re-expressed as
    floor(budget/sleep), min 1 so chains always progress."""
    return (
        F.when(sleep_col.isNull() | (sleep_col <= 0), F.lit(polite_ops.UNLIMITED))
        .otherwise(F.greatest(F.lit(1), F.floor(F.lit(round_budget_s) / sleep_col)))
        .cast("long")
    )


def _csv_quote(col, sep: str):
    quoted = F.concat(F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"'))
    return F.when(
        col.contains(sep) | col.contains('"') | col.contains("\n"), quoted
    ).otherwise(col)


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        seeds: list[SeedSpec],
        *,
        index_cached: bool = False,  # reference @index_debug default (lib/upton.rb:92)
        instance_cached: bool = True,  # reference @debug default (lib/upton.rb:90)
        round_budget_s: float = 60.0,
        robots: DataFrame | None = None,
        user_agent: str = "upton-spark",
        catalog: ManifestCatalog | None = None,
        pages_path: str | None = None,
        next_instance_page_url_fn: Callable[[str, int], str] | None = None,
        max_instance_pages: int = 16,
        expected_url_capacity: int = 1 << 20,
        bloom_fpr: float = 1e-3,
        index_sequential: bool = False,
        extract_prune_max_urls: int = 20_000,
        assume_unique_urls: bool = False,
        broadcast_frontier: bool = True,
        fetch_failures: DataFrame | None = None,
        max_fetch_attempts: int = 3,
        index_fn: Callable[[DataFrame], DataFrame] | None = None,
        clock: str | None = None,
        compact_every: int = 8,
        frontier_rows_per_bucket: int = 100_000,
        url_priorities: DataFrame | None = None,
        host_budgets: DataFrame | None = None,
        blocklist_hosts: DataFrame | None = None,
        blocklist_url_patterns: list[str] | None = None,
        fetch_fn: Callable[[str], bytes | str | None] | None = None,
        redirect_map: DataFrame | None = None,
        block_traps: bool = False,
        host_delays: DataFrame | None = None,
    ):
        # ``compact_every``: the fetch loop keeps frontier/seen-set updates
        # DELTA-based — each round commits only that round's status map and
        # newly-seen rows (politeness-bounded size) instead of rewriting the
        # whole frontier, which at a 10^10-row frontier would make every
        # round O(frontier). Full tables are materialized/committed on entry,
        # every ``compact_every`` rounds (bounding lazy plan depth and
        # resume replay length), and when the loop ends.
        # ``clock`` pins the fetched_at stash-annotation timestamp (the
        # reference stamps Time.now into cached files, downloader.rb:100-116)
        # to a fixed 'yyyy-MM-dd HH:mm:ss' value for deterministic tests;
        # None uses current_timestamp() like a live deployment.
        # ``index_fn`` is the reference's primary customization point — the
        # get_index/parse_index subclass override (lib/upton.rb:266-288,
        # README.md:31-39) — as a pluggable DataFrame transform: it receives
        # the fetched index pages (seed_id, page_round, seed_url, url, html,
        # index_selector) and must return link rows (seed_id, page_round,
        # pos, url) where pos is the within-page DOM position. None keeps
        # the default CSS-selector link projection.
        # Bounded retry (SURVEY.md §4): the reference retries timeouts forever
        # (lib/upton/downloader.rb:63-65) and maps HTTP errors to '' bodies
        # (downloader.rb:50-68). The engine bounds retries: a failed live
        # fetch increments ``attempts`` and re-queues (re-entering admission,
        # so a retry consumes a politeness token like any live request) until
        # ``max_fetch_attempts``, then the row goes terminal status='failed'
        # with the reference's empty-body semantics. ``fetch_failures``
        # injects failures for tests/replay: rows (url, fail_times) make the
        # first ``fail_times`` live attempts of that url fail.
        known_kinds = {"text", "list", "table", "identity", "content"}
        for s in seeds:
            if s.extract_kind not in known_kinds:
                raise ValueError(
                    f"seed {s.seed_id}: unknown extract_kind {s.extract_kind!r} "
                    f"(expected one of {sorted(known_kinds)})"
                )
        self.index_sequential = index_sequential
        self.extract_prune_max_urls = extract_prune_max_urls
        # corpus contract flags:
        # - assume_unique_urls: pages has one capture per url (synthetic
        #   corpora; Iceberg tables maintained by MERGE) -> skip the
        #   dedup-latest window, which otherwise shuffles the full corpus.
        # - broadcast_frontier: frontier/candidate side is broadcastable
        #   (true until the frontier round outgrows ~a few GB; at 10^10 you
        #   flip this off and bucket both sides by url instead), letting the
        #   body join stream the pages scan with NO corpus shuffle.
        self.assume_unique_urls = assume_unique_urls
        self.broadcast_frontier = broadcast_frontier
        self.fetch_failures = fetch_failures
        self.max_fetch_attempts = max_fetch_attempts
        self.index_fn = index_fn
        self.clock = clock
        self.compact_every = max(1, compact_every)
        self.frontier_rows_per_bucket = frontier_rows_per_bucket
        # Crawl-planning inputs (operators.webgraph family), composed into
        # the loop the way the reference's `scrape` composes its pieces
        # (lib/upton.rb:47-51) — a prioritized re-crawl is one constructor
        # call, not hand-assembled operators:
        # - ``url_priorities`` (url, priority:long): admission order within a
        #   host; LOWER fetches first (pagerank_priorities converts rank
        #   scores). Unlisted urls order after every listed one, then by
        #   (seed_id, instance_index) as before. Key-partitioned left join —
        #   the table may be corpus-scale.
        # - ``host_budgets`` (host, budget:long): per-round token cap from
        #   allocate_budget, min 1 so every host keeps a heartbeat; combined
        #   with the sleep/Crawl-delay tokens via least(). Broadcast join
        #   (host dims are small by definition).
        # - ``blocklist_hosts`` (host) / ``blocklist_url_patterns``: the
        #   webgraph.blocklist_gate admission check, run beside the robots
        #   gate — hits go terminal status='blocked', never fetched.
        # All three are uniform per host / static per url, so the one-shot
        # closed-form schedule stays exact (no new _oneshot_eligible
        # disqualifiers; equivalence pinned by test_planned_crawl_*).
        # - ``redirect_map`` (src, final_url): a known redirect table (e.g.
        #   webgraph.resolve_redirects over the previous crawl's
        #   meta_refresh_redirects edges) rewrites frontier urls to their
        #   final targets BEFORE dedup/admission — the seen-set dedups on
        #   finals, politeness charges the final host, and the fetch never
        #   wastes a token on a hop page. Unresolved rows (final_url NULL)
        #   are ignored (the original url is kept). Static per url, so the
        #   one-shot schedule stays exact.
        self.url_priorities = url_priorities
        self.host_budgets = host_budgets
        self.blocklist_hosts = blocklist_hosts
        self.blocklist_url_patterns = list(blocklist_url_patterns or [])
        self.redirect_map = redirect_map
        self.block_traps = bool(block_traps)
        # - ``host_delays`` (host, crawl_delay:double seconds): an extra
        #   per-host politeness floor — typically
        #   politeness.adaptive_delays over the previous crawl's latency
        #   log (closed-loop backpressure). Merged with robots Crawl-delay
        #   via greatest(): the most conservative source wins, same rule the
        #   robots delay already applies against the seed sleep. Uniform per
        #   host, so the one-shot closed-form schedule stays exact.
        self.host_delays = (
            host_delays.select("host", F.col("crawl_delay").cast("double"))
            if host_delays is not None
            else None
        )
        # ``fetch_fn``: the LIVE-FETCH transport seam (SURVEY §2.1's
        # download_from_resource!, downloader.rb:50-68). None (default) =
        # corpus replay: ``pages`` models the web and a "live fetch" is the
        # body join. With a transport injected, ``pages`` becomes the STASH
        # (cache hits still read from it) and every row the admission loop
        # decides to fetch live — exactly the rows that consumed a
        # politeness token — acquires its body through fetch_fn inside a
        # mapInPandas stage over the frontier partitions. Contract (matches
        # downloader.rb:50-68): fetch_fn(url) -> html bytes/str; None or a
        # raised exception means a fetch error and becomes the reference's
        # EMPTY_STRING body (''); a transport that wants timeout retries
        # performs them internally (the engine's bounded-retry rounds stay
        # driven by the deterministic fetch_failures injection). Must be
        # picklable (it ships to executors). Deferred rows NEVER reach the
        # transport — only admitted live decisions do — and the one-shot
        # closed-form schedules are disqualified (a live transport must
        # fetch round-by-round under the real politeness pacing, not in one
        # speculative pass).
        self.fetch_fn = fetch_fn
        # Scratch dir for per-round state materialization: parquet
        # write+re-read truncates Catalyst lineage each round (the same thing
        # a catalog snapshot commit does). localCheckpoint is NOT used — with
        # pandas UDFs in the plan it falls off the SQL execution path and
        # loses Python-worker reuse (~40s per call vs ~1s for this).
        self._scratch = tempfile.mkdtemp(prefix="upton_spark_state_")
        self._scratch_n = 0
        # CrawlResult DataFrames read lazily from scratch parquet, so the
        # crawler must stay alive (and the dir on disk) until close() or
        # process exit — atexit's strong reference is deliberate: it keeps
        # `Crawler(...).crawl()` results valid (a weakref finalizer would
        # delete the dir at GC, under the live results). close() unregisters,
        # so long-lived services that close crawlers don't accumulate
        # registrations or leak closed instances.
        atexit.register(self.close)
        self.spark = spark
        self.pages = pages
        # pages_path: set when ``pages`` is a plain parquet/Iceberg table on
        # disk. Enables file-level pruning for small fetch sets (the index
        # phase): a url-only prescan finds the files holding any candidate,
        # and the html-bearing probe reads ONLY those — the poor man's
        # Iceberg metadata pruning. Without it the index join decompresses
        # the whole corpus html column to fetch a few thousand index pages.
        self.pages_path = pages_path
        self._pages_raw_scan_ok: bool | None = None
        self.seeds = seeds
        self.index_cached = index_cached
        self.instance_cached = instance_cached
        self.round_budget_s = round_budget_s
        self.robots = robots
        self.user_agent = user_agent
        self.catalog = catalog
        self.next_instance_page_url_fn = next_instance_page_url_fn
        self.max_instance_pages = max_instance_pages
        self._bloom = dedup_ops.BloomFilter.sized_for(expected_url_capacity, bloom_fpr)
        # The Bloom pre-filter pays for itself only once the seen-set is big
        # enough that the exact anti-join's build side hurts; below the
        # threshold every round runs the plain anti-join (strictly cheaper:
        # no bitmap build/broadcast jobs). On crossing it, the filter is
        # built ONCE from the full seen-set, then maintained incrementally.
        self._bloom_min_seen = 1 << 16
        self._bloom_active = False
        self._lineage_rows: list[tuple] = []
        self._seen_count = 0
        self._frontier_rows: int | None = None  # set by build_frontier
        self.seeds_df = spark.createDataFrame(
            [
                (
                    s.seed_id,
                    s.seed_url or "",
                    s.index_selector,
                    s.extract_selector,
                    s.extract_kind,
                    s.paginated,
                    s.pagination_param,
                    s.pagination_max_pages,
                    s.pagination_start_index,
                    s.pagination_interval,
                    s.sleep_time_between_requests,
                )
                for s in seeds
            ],
            schema=schemas.SEEDS,
        )
        self._pages_latest: DataFrame | None = None
        # robots state is built ONCE per crawl (collect+broadcast or the
        # per-host rule-array join side) and reused across every round —
        # rebuilding per round leaks one broadcast per round and puts a
        # driver collect on the round critical path (scale-killer at
        # web-scale rule tables). Released in close().
        self._robots_gate: robots_ops.RobotsGate | None = None
        self._crawl_delays: DataFrame | None = None
        self._crawl_delays_built = False

    # ------------------------------------------------------------------ util
    def close(self) -> None:
        """Remove this crawler's scratch state. Call once the CrawlResult
        DataFrames are no longer needed — they read lazily from scratch
        parquet, so closing earlier invalidates them. Unregisters the atexit
        backstop so closed crawlers are collectable; safe to call twice."""
        atexit.unregister(self.close)
        if self._robots_gate is not None:
            self._robots_gate.close()
            self._robots_gate = None
        shutil.rmtree(self._scratch, ignore_errors=True)

    def _get_robots_gate(self) -> robots_ops.RobotsGate:
        if self._robots_gate is None:
            self._robots_gate = robots_ops.RobotsGate(
                self.spark, self.robots, self.user_agent
            )
        return self._robots_gate

    def _get_crawl_delays(self) -> DataFrame | None:
        """Per-host Crawl-delay dimension, built once per crawl (lazy DF; the
        per-round cost is just the broadcast join it rides). Robots
        Crawl-delay and the injected ``host_delays`` floor merge here via a
        full-outer join + greatest() — downstream admission sees ONE
        (host, crawl_delay) dim regardless of how many sources set it."""
        if not self._crawl_delays_built:
            delays = robots_ops.crawl_delays(self.robots, self.user_agent)
            if self.host_delays is not None:
                if delays is None:
                    delays = self.host_delays
                else:
                    delays = (
                        delays.withColumnRenamed("crawl_delay", "_rd")
                        .join(
                            self.host_delays.withColumnRenamed(
                                "crawl_delay", "_ad"
                            ),
                            "host",
                            "full_outer",
                        )
                        .select(
                            "host",
                            F.greatest(
                                F.coalesce("_rd", F.lit(0.0)),
                                F.coalesce("_ad", F.lit(0.0)),
                            ).alias("crawl_delay"),
                        )
                    )
            self._crawl_delays = delays
            self._crawl_delays_built = True
        return self._crawl_delays

    def _materialize(self, df: DataFrame, label: str) -> DataFrame:
        """Pin round state as parquet + re-read. This BOTH truncates Catalyst
        lineage (the iterative loop's plan otherwise grows combinatorially —
        each round's frontier references the previous round several times)
        AND matches what a catalog snapshot commit does at scale. cache() is
        not a substitute: it keeps the logical plan, and planning time
        explodes after a few rounds."""
        self._scratch_n += 1
        path = os.path.join(self._scratch, f"{self._scratch_n:04d}_{label}")
        df.write.mode("overwrite").parquet(path)
        # the writer's schema IS the reader's schema — passing it explicitly
        # skips the read-back footer/schema-inference job (one driver job per
        # materialize; the round loop pays this once per round)
        return self.spark.read.schema(df.schema).parquet(path)

    @contextlib.contextmanager
    def job_diet(self):
        """Disable adaptive query execution around a SMALL crawl's actions.

        AQE materializes every query stage as its own driver job (~0.1-0.2s
        of scheduling each); a politeness-bounded crawl of O(10^2-10^4)
        frontier rows runs ~40 such jobs for ~1s of actual data work, so the
        fixed driver cost dominates (measured: 41 -> 23 jobs on the 12-host
        politeness bench). Shuffle width is dieted too: 32 shuffle partitions
        mean ~32 task launches per tiny stage, pure overhead at O(10^2) rows
        (one A/B window read 9.6 -> 8.2s at width 4 on the same bench;
        steady-state repeats sit inside this VM's noise band, so the claim
        is the removed task launches, not a headline number). Identical
        rows — no operator here depends on partition count or iteration
        order, see the module determinism note. Results are bit-identical — AQE only
        re-plans partitioning/join strategy, and every small-side join here
        carries an explicit broadcast hint. ``crawl()`` applies this
        automatically while seed count and built-frontier size stay under
        JOB_DIET_MAX_SEEDS / JOB_DIET_MAX_ROWS; bulk crawls keep AQE
        (skew-join + partition coalescing are the 100x-scale story) and the
        session's shuffle width. Callers consuming a small crawl's RESULT
        DataFrames (extraction aggregates) can opt in around their own
        actions. Session-conf scoped: not safe under concurrent queries on
        the same SparkSession from other threads."""
        conf = self.spark.conf
        prev = conf.get("spark.sql.adaptive.enabled", "true")
        prev_width = conf.get("spark.sql.shuffle.partitions", "200")
        conf.set("spark.sql.adaptive.enabled", "false")
        try:
            width = int(prev_width)
        except ValueError:  # "auto" (Spark 4 allows it) — leave untouched
            width = None
        if width is not None and width > JOB_DIET_SHUFFLE_WIDTH:
            conf.set("spark.sql.shuffle.partitions", str(JOB_DIET_SHUFFLE_WIDTH))
        try:
            yield
        finally:
            conf.set("spark.sql.adaptive.enabled", prev)
            conf.set("spark.sql.shuffle.partitions", prev_width)

    def _maybe_job_diet(self, small: bool):
        return self.job_diet() if small else contextlib.nullcontext()

    def _pages_is_raw_scan(self) -> bool:
        """Contract check for file-level pruning: ``pages`` must be the
        unmodified scan of ``pages_path`` (sameSemantics vs a fresh read —
        catches filters, projections, unions; memoized once per crawler)."""
        if self._pages_raw_scan_ok is None:
            try:
                self._pages_raw_scan_ok = self.pages.sameSemantics(
                    self.spark.read.parquet(self.pages_path)
                )
            except Exception:
                self._pages_raw_scan_ok = False
        return self._pages_raw_scan_ok

    def pages_latest(self) -> DataFrame:
        """Latest capture per URL (dedup-latest on warc_ts — the as-of rule
        of SURVEY.md §2.3). With assume_unique_urls the window (a full-corpus
        shuffle) is skipped; at scale the same effect comes from Iceberg
        MERGE keeping one row per url."""
        if self._pages_latest is None:
            if self.assume_unique_urls:
                self._pages_latest = self.pages.select("url", "html")
            else:
                w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc_nulls_last())
                self._pages_latest = (
                    self.pages.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .select("url", "html")
                )
        return self._pages_latest

    def _pruned_pages(
        self, keys: DataFrame, url_col: str, key_urls: list[str] | None = None
    ) -> DataFrame | None:
        """File-level pruning for a small fetch set: a url-column-only
        prescan (no html decompression) finds which corpus files contain any
        candidate url; the html-bearing probe then reads ONLY those files.
        Correct under dedup-latest — every capture of a matched url lives in
        a kept file, so the per-url latest window over the pruned subset
        equals the global one. Returns None when unavailable (no
        pages_path), not worthwhile (candidates touch most files), or when
        ``pages`` is not the raw scan of ``pages_path`` — the pruned probe
        re-reads matched files directly, which would silently bypass any
        filter/projection a caller applied to ``pages``, so a transformed
        ``pages`` falls back to the (always-correct) unpruned join."""
        files = self._prune_file_list(keys, url_col, key_urls)
        if files is None:
            return None
        return self._latest_of(self.spark.read.parquet(*files))

    def _url_file_map(self, build: bool = False) -> DataFrame | None:
        """(url, _f) inverted file index over the raw corpus scan,
        Spark-cached per (session, pages_path, file set). Built ONLY when a
        prescan must stream the full url column anyway (the semi-join
        path, ``build=True``) — caching what that scan reads costs no
        extra corpus IO, and from then on EVERY prescan (index candidates,
        extraction prune, later crawls of the same corpus) is a tiny probe
        of the map. Driver-known candidate sets keep the row-group-pruned
        IN path until a map exists, so no workload ever pays a url-column
        pass it wasn't already paying. The 100-TB analogue is table
        metadata (Iceberg manifests / file url stats) — local parquet has
        no such index, so the engine materializes one. Single entry: a new
        corpus evicts (unpersists) the old map."""
        if self.pages_path is None or not self._pages_is_raw_scan():
            return None
        # applicationId is stable for a session's lifetime and never reused,
        # unlike id(self.spark) which CPython can recycle after a stopped
        # session is GC'd (resurrecting a DataFrame bound to a dead session)
        app_id = self.spark.sparkContext.applicationId
        key = (app_id, self.pages_path, tuple(sorted(self.pages.inputFiles())))
        cached = _URL_FILE_MAP_CACHE.get(key)
        if cached is not None or not build:
            return cached
        for k, old in list(_URL_FILE_MAP_CACHE.items()):
            if k[0] != app_id:
                # never unpersist a map owned by another live session;
                # stopped sessions free their cache blocks on their own
                del _URL_FILE_MAP_CACHE[k]
                continue
            try:
                old.unpersist()
            except Exception:
                pass  # a map from a stopped session has nothing to free
            del _URL_FILE_MAP_CACHE[k]
        fmap = (
            self.spark.read.parquet(self.pages_path)
            .select("url", F.input_file_name().alias("_f"))
            .cache()
        )
        _URL_FILE_MAP_CACHE[key] = fmap
        return fmap

    def _prune_file_list(
        self, keys: DataFrame, url_col: str, key_urls: list[str] | None = None
    ) -> list[str] | None:
        """The corpus files containing any candidate url, or None when
        pruning is unavailable / not worthwhile (see _pruned_pages)."""
        if self.pages_path is None or not self.broadcast_frontier:
            return None
        if not self._pages_is_raw_scan():
            return None
        # map-build policy: the semi-join path always builds (it streams the
        # url column anyway); the driver-known IN path keeps the cheaper
        # row-group-pruned scan for a corpus's FIRST prescan, but from the
        # second prescan on (same session+corpus: the index prescan and the
        # extraction prescan of one crawl, or repeated crawls) the one-off
        # scans have already cost more than one map build, so build it and
        # turn every later prescan into a cached tiny probe
        build = key_urls is None
        if not build:
            mkey = (
                self.spark.sparkContext.applicationId,
                self.pages_path,
                tuple(sorted(self.pages.inputFiles())),
            )
            _PRESCAN_COUNTS[mkey] = _PRESCAN_COUNTS.get(mkey, 0) + 1
            build = _PRESCAN_COUNTS[mkey] >= 2
        fmap = self._url_file_map(build=build)
        if fmap is not None:
            if key_urls is not None:
                probe = fmap.filter(F.col("url").isin(key_urls))
            else:
                probe = fmap.join(
                    F.broadcast(keys.select(F.col(url_col).alias("url"))),
                    "url",
                    "left_semi",
                )
            files = [r["_f"] for r in probe.select("_f").distinct().collect()]
        elif key_urls is not None:
            # driver-known candidate set (e.g. index-chain urls, a pure
            # function of the seed list): an IN predicate pushes down to the
            # parquet scan, so row-group url stats prune the prescan itself —
            # cheaper than the semi-join prescan, which must stream the whole
            # url column
            files = [
                r["_f"]
                for r in self.pages.filter(F.col("url").isin(key_urls))
                .select(F.input_file_name().alias("_f"))
                .distinct()
                .collect()
            ]
        else:
            files = [
                r["_f"]
                for r in self.pages.select(
                    F.col("url").alias(url_col), F.input_file_name().alias("_f")
                )
                .join(F.broadcast(keys), url_col, "left_semi")
                .select("_f")
                .distinct()
                .collect()
            ]
        if not files or not all(files):
            return None
        if len(files) >= max(1, len(self.pages.inputFiles())) * 0.5:
            return None
        return files

    def _latest_of(self, pruned: DataFrame) -> DataFrame:
        """(url, html) with the dedup-latest rule applied (skipped under the
        assume_unique_urls corpus contract)."""
        if self.assume_unique_urls:
            return pruned.select("url", "html")
        w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc_nulls_last())
        return (
            pruned.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("url", "html")
        )

    def _join_bodies(
        self,
        small: DataFrame,
        url_col: str = "url",
        prune_files: bool | list[str] = False,
        pages_override: DataFrame | None = None,
    ) -> DataFrame:
        """small ⟕ pages on url, without ever shuffling the corpus.

        Spark cannot broadcast the PRESERVED side of an outer join (BuildRight
        is unsupported for RightOuter — a plain left join here would silently
        sort-merge-shuffle the whole corpus). So the outer join is decomposed:

          matched   = pages ⋈ broadcast(small)         (inner, BuildRight ok)
          unmatched = small ⟕̸ broadcast(matched urls)  (anti, NULL body)

        Both corpus scans stream column-pruned (url+html, then url-only);
        with ``prune_files`` (and pages_path set) the html-bearing scan is
        additionally restricted to the files a url-only prescan matched.
        Past broadcastable frontier sizes set broadcast_frontier=False and
        let AQE/SMJ handle it with bucketed tables."""
        pl = None
        if pages_override is not None:
            pl = pages_override
            if url_col != "url":
                pl = pl.withColumnRenamed("url", url_col)
        elif prune_files:
            pl = self._pruned_pages(
                small.select(url_col).distinct(),
                url_col,
                key_urls=prune_files if isinstance(prune_files, list) else None,
            )
            if pl is not None and url_col != "url":
                pl = pl.withColumnRenamed("url", url_col)
        if pl is None:
            pl = self.pages_latest()
            if url_col != "url":
                pl = pl.withColumnRenamed("url", url_col)
            if not self.broadcast_frontier:
                return small.join(pl, url_col, "left")
        matched = pl.join(F.broadcast(small), url_col, "inner")
        matched_keys = matched.select(url_col).distinct()
        unmatched = small.join(F.broadcast(matched_keys), url_col, "left_anti")
        for field in pl.schema.fields:
            if field.name != url_col:
                unmatched = unmatched.withColumn(
                    field.name, F.lit(None).cast(field.dataType)
                )
        return matched.unionByName(unmatched)

    def _transport_bodies(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        """Live-fetch stage: append an ``html`` binary column by calling the
        injected transport once per row, Arrow-batched inside mapInPandas —
        one fetch stage per frontier partition (the frontier is salted-host
        partitioned, so a partition's rows share few hosts and a real
        transport can pool connections per host). Rows reach here ONLY
        after politeness admission charged them a token. Error mapping is
        the reference's (downloader.rb:50-68): transport None/raise →
        NULL html → the extraction phase's '' empty body."""
        fetch_fn = self.fetch_fn
        out_schema = T.StructType(
            list(df.schema.fields) + [T.StructField("html", T.BinaryType(), True)]
        )

        def run(batches):
            for pdf in batches:
                bodies = []
                for u in pdf[url_col]:
                    try:
                        b = fetch_fn(u)
                    except Exception:
                        b = None
                    if b is not None and not isinstance(b, bytes):
                        b = str(b).encode("utf-8")
                    bodies.append(b)
                pdf = pdf.copy()
                pdf["html"] = bodies
                yield pdf

        return df.mapInPandas(run, schema=out_schema)

    @staticmethod
    def _collect_decision_counts(
        df: DataFrame, decision_col, extra: dict | None = None
    ) -> tuple[dict[tuple[str, int], int], dict[str, int]]:
        """Per-(decision, host-bucket) lineage counts from a MATERIALIZED
        round table — one tiny groupBy job over the round's parquet (the
        round table is politeness-bounded, never O(frontier)). ``extra``
        names boolean columns/exprs to count-if in the same job (e.g. the
        index chain's alive-next-round count), so accounting stays a single
        job per round."""
        pid = F.pmod(F.hash("host"), F.lit(N_LINEAGE_BUCKETS)).cast("int")
        aggs = [F.count(F.lit(1)).alias("__n")]
        for name, cond in (extra or {}).items():
            aggs.append(F.count(F.when(cond, F.lit(1))).alias(name))
        rows = (
            df.groupBy(decision_col.alias("__decision"), pid.alias("__pid"))
            .agg(*aggs)
            .collect()
        )
        counts = {(r["__decision"], r["__pid"]): r["__n"] for r in rows}
        extras = {
            name: sum(r[name] for r in rows) for name in (extra or {})
        }
        return counts, extras

    def _empty_seen(self) -> DataFrame:
        return self.spark.createDataFrame([], schema=schemas.URLS_SEEN)

    def _load_bloom_from(self, seen: DataFrame) -> int:
        """Rebuild the cumulative Bloom from a persisted seen-set on resume.

        Distributed: partition-local bitmaps OR-merged on the driver
        (dedup_ops.build_bloom) — only n_partitions × bitmap-size bytes cross
        the driver, never the seen rows themselves (a .toPandas() here would
        pull ~10^10 hash rows through the driver at frontier scale)."""
        n = seen.count()
        if n >= self._bloom_min_seen:
            self._bloom_active = True
            dedup_ops.build_bloom(
                dedup_ops.with_url_hashes(seen.select("url")), into=self._bloom
            )
        return n

    def _note_lineage(self, phase: str, round_no: int, per_pid: dict[tuple[str, int], int]) -> None:
        pids = sorted({pid for (_, pid) in per_pid})
        if not pids:
            pids = [0]
        for pid in pids:
            self._lineage_rows.append(
                (
                    phase,
                    round_no,
                    pid,
                    self._seen_count,
                    per_pid.get(("fetched", pid), 0),
                    per_pid.get(("deferred", pid), 0),
                    per_pid.get(("cache_hit", pid), 0),
                    per_pid.get(("blocked", pid), 0),
                    per_pid.get(("retry", pid), 0),
                    per_pid.get(("failed", pid), 0),
                )
            )

    def _mark_seen(
        self, seen: DataFrame, new_urls: DataFrame, round_no: int, n_new: int,
        update_bloom: bool = True, materialize: bool = True,
    ) -> tuple[DataFrame, DataFrame]:
        """seen ∪ new → (merged, new_rows); merges the round's new URLs into
        the cumulative Bloom via distributed partial bitmaps (driver
        OR-merge). update_bloom may be False ONLY when no later round will
        consult the filter — a stale Bloom would produce false negatives,
        which (unlike false positives) break the no-refetch contract.
        ``materialize=False`` returns the lazy union (delta-based rounds:
        the caller compacts every compact_every rounds); ``new_rows`` is the
        round's seen-set delta for catalog commits."""
        distinct_new = dedup_ops.with_url_hashes(new_urls.select("url").distinct())
        # frozen to a driver-side literal: with delta-based (lazy) seen
        # merges a current_timestamp() expression would re-evaluate on every
        # downstream action, stamping different times per consumer
        stamp = self.clock or datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        fetched_at = F.to_timestamp(F.lit(stamp))
        new_rows = (
            distinct_new.withColumn("first_round", F.lit(round_no))
            .withColumn("fetched_at", fetched_at)
            .select("url_hash", "url", "first_round", "fetched_at")
        )
        self._seen_count += n_new
        merged = seen.unionByName(new_rows)
        if update_bloom and self._bloom_active:
            dedup_ops.build_bloom(distinct_new, into=self._bloom)
        elif update_bloom and self._seen_count >= self._bloom_min_seen:
            self._bloom_active = True
            dedup_ops.build_bloom(
                dedup_ops.with_url_hashes(merged.select("url")), into=self._bloom
            )
        if not materialize or not update_bloom:
            return merged, new_rows
        return self._materialize(merged, "urls_seen"), new_rows

    # ----------------------------------------------------------- index phase
    def run_index_phase(self, seen: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Speculative (one distributed pass) when every index seed has an
        unlimited live-fetch budget; sequential otherwise. The speculative
        pass generates and fetches every candidate pagination page in one
        join with no token-bucket admission — fine for replay corpora, but
        it would silently break the per-round politeness contract (at most
        budget/sleep live fetches per host per round) for sleeping seeds, so
        those auto-select the sequential chain."""
        any_index_sleep = any(
            s.seed_url
            and s.index_selector is not None
            and (s.sleep_time_between_requests or 0) > 0
            for s in self.seeds
        )
        if not (self.index_sequential or any_index_sleep):
            return self.run_index_phase_speculative(seen)
        if any_index_sleep and self._index_oneshot_eligible():
            return self.run_index_phase_oneshot(seen)
        return self.run_index_phase_sequential(seen)

    def _index_page_candidates(self) -> DataFrame:
        """Every candidate index-pagination page URL, generated up front —
        the URLs of a chain are predictable (only chain TERMINATION depends
        on fetched bodies, lib/upton.rb:295-311), so both index phases can
        know the full candidate universe: the speculative phase fetches it
        in one pass, the sequential phase uses it to prescan-prune the
        corpus once for all of its rounds."""
        index_seeds = self.seeds_df.filter(
            (F.col("seed_url") != "") & F.col("index_selector").isNotNull()
        )
        cand = (
            index_seeds.withColumn(
                "page_k",
                F.explode(
                    F.when(
                        F.col("paginated"),
                        F.sequence(F.lit(0), F.col("pagination_max_pages") - 1),
                    ).otherwise(F.array(F.lit(0)))
                ),
            )
            .withColumn(
                "pagination_index",
                F.col("pagination_start_index") + F.col("page_k") * F.col("pagination_interval"),
            )
            .withColumn(
                "next_url_raw",
                next_index_page_url_udf(
                    F.col("seed_url"),
                    F.col("pagination_index"),
                    F.col("paginated"),
                    F.col("pagination_param"),
                    F.col("pagination_max_pages"),
                ),
            )
            .filter(F.col("next_url_raw") != "")
            .withColumn("fetch_url", resolve_url_udf(F.col("next_url_raw"), F.col("seed_url")))
            .withColumn("host", host_col(F.col("fetch_url")))
        )
        return dedup_ops.with_url_hashes(cand, "fetch_url")

    def _index_pruned_corpus(self) -> tuple[DataFrame | None, bool]:
        """(pruned index corpus, broadcast-it?) shared by every index phase.

        The candidate pagination URLs are predictable up front, so the
        corpus file-prune prescan runs ONCE for the whole phase — and when
        the candidate list is driver-computable (bounded seeds), as an
        IN-pushdown that lets row-group url stats prune the prescan itself
        rather than a full url-column scan. When the pruned files are small
        on disk the caller should BROADCAST the corpus side and plain-left-
        join the candidate chain: _join_bodies' matched/unmatched
        decomposition would evaluate the candidate UDF chain ~3x (broadcast
        build + anti-join probe), the dominant cost at few-seeds scale."""
        prune_files = self._prune_file_list(
            self._index_page_candidates()
            .select(F.col("fetch_url").alias("url"))
            .distinct(),
            "url",
            key_urls=self._index_candidate_urls_local(),
        )
        if prune_files is None:
            return None, False
        pl = self._latest_of(self.spark.read.parquet(*prune_files))
        try:
            total = sum(os.path.getsize(f.removeprefix("file:")) for f in prune_files)
            bcast = total <= 64 << 20
        except OSError:
            bcast = False
        return pl, bcast

    def _fetch_all_index_pages(self, seen: DataFrame) -> DataFrame:
        """ONE distributed pass over the whole candidate-page universe:
        bodies joined, chain validity (no earlier empty page per seed) via a
        window, stash hits tagged when index_cached, hrefs projected in the
        same pass (unless an index_fn override needs the two-pass shape).
        Materialized — the per-round/lineage logic of both one-pass index
        phases derives lazily from this parquet. The materialization drops
        ``html`` when hrefs were projected in-pass (nothing downstream reads
        it then — the write stays slim even for fat index pages)."""
        cand = self._index_page_candidates()
        if self.fetch_fn is not None:
            # live mode: the speculative pass is only reachable for
            # zero-sleep seeds (sleeping seeds take the sequential loop —
            # _index_oneshot_eligible is False with a transport), so
            # fetching the whole candidate universe live is politeness-safe
            # and bounded by pagination_max_pages per seed (pages past the
            # chain end return empty and are discarded by chain_valid,
            # like the reference's stop-on-empty probe fetch)
            if self.index_cached:
                seen_keys = seen.select("url_hash").distinct()
                cand = cand.join(
                    seen_keys.withColumn("cache_hit", F.lit(True)), "url_hash", "left"
                ).withColumn("cache_hit", F.coalesce("cache_hit", F.lit(False)))
            else:
                cand = cand.withColumn("cache_hit", F.lit(False))
            fetched = self._transport_bodies(
                cand.filter(~F.col("cache_hit")), "fetch_url"
            ).unionByName(
                self._join_bodies(cand.filter(F.col("cache_hit")), "fetch_url")
            )
        else:
            pl_index, bcast_pages = self._index_pruned_corpus()
            if bcast_pages:
                fetched = cand.join(
                    F.broadcast(pl_index.withColumnRenamed("url", "fetch_url")),
                    "fetch_url",
                    "left",
                )
            elif pl_index is not None:
                fetched = self._join_bodies(cand, "fetch_url", pages_override=pl_index)
            else:
                fetched = self._join_bodies(cand, "fetch_url")
        fetched = fetched.withColumn(
            "body_empty", F.col("html").isNull() | (F.length("html") == 0)
        )
        w = Window.partitionBy("seed_id").orderBy("page_k")
        fetched = fetched.withColumn(
            "empties_before",
            F.coalesce(
                F.sum(F.col("body_empty").cast("int")).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        ).withColumn("chain_valid", F.col("empties_before") == 0)
        if "cache_hit" in fetched.columns:
            pass  # live mode tagged cache hits before body acquisition
        elif self.index_cached:
            seen_keys = seen.select("url_hash").distinct()
            fetched = fetched.join(
                seen_keys.withColumn("cache_hit", F.lit(True)), "url_hash", "left"
            ).withColumn("cache_hit", F.coalesce("cache_hit", F.lit(False)))
        else:
            fetched = fetched.withColumn("cache_hit", F.lit(False))
        if self.index_fn is None:
            # default link projection: run the extraction UDF in the SAME
            # pass that materializes the fetched index pages — link rows then
            # derive lazily from the materialized parquet, saving one
            # driver-blocking job per crawl (an index_fn override needs the
            # two-pass shape because it transforms the fetched DataFrame)
            fetched = fetched.withColumn(
                "hrefs",
                extract_links_udf(F.col("html"), F.col("index_selector"), F.col("seed_url")),
            ).drop("html")
        # parquet pin, not persist(): measured equal-or-better (the cost is
        # the UDF evaluation, not the write) and the scratch file backs the
        # lazy link projection beyond any cache eviction
        return self._materialize(fetched, "index_fetched")

    def _index_oneshot_eligible(self) -> bool:
        """Closed-form index phase for SLEEPING seeds: chain-page rounds are
        a deterministic per-host simulation over the speculative fetch table
        (the loop's admission ranks by (pagination_index, seed_id) with a
        constant per-host token budget, and chain death is knowable from the
        fetched bodies). Eligible when the corpus-replay speculative fetch
        is allowed (not index_sequential), rounds need no commit boundary
        (no catalog), the seen-set can't produce mid-phase stash hits (not
        index_cached — duplicate seed_urls could hit the stash mid-phase),
        and the sleep budget is uniform (constant tokens per host)."""
        if self.index_sequential or self.catalog is not None or self.index_cached:
            return False
        if self.fetch_fn is not None:
            return False  # same live-pacing rule as _oneshot_eligible
        return len({s.sleep_time_between_requests for s in self.seeds}) <= 1

    def run_index_phase_oneshot(self, seen: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Politeness-aware index phase in O(1) driver jobs (vs O(rounds) in
        the sequential loop — a 53-page chain costs 53 round-trips there):
        speculative fetch of every candidate page, then a per-host
        ``applyInPandas`` simulation replaying the sequential loop's
        round-by-round admission (rank next pages by (pagination_index,
        seed_id), admit ``tokens``, advance or die on empty body) to assign
        each valid page its fetch round and each wait a deferred row.
        Bit-identical lineage/links/extraction vs the loop is pinned by
        test_index_oneshot_matches_sequential_loop."""
        fetched = self._fetch_all_index_pages(seen)
        sleep = next(
            (
                s.sleep_time_between_requests
                for s in self.seeds
                if s.seed_url and s.index_selector is not None
            ),
            0.0,
        )
        tokens = polite_ops.tokens_for(sleep, self.round_budget_s)

        def simulate(pdf: pd.DataFrame) -> pd.DataFrame:
            chains: dict[int, list[tuple[int, int]]] = {}
            for sid, page_k, pag_idx in zip(
                pdf["seed_id"], pdf["page_k"], pdf["pagination_index"]
            ):
                chains.setdefault(int(sid), []).append((int(page_k), int(pag_idx)))
            for pages in chains.values():
                pages.sort()
            ptr = {sid: 0 for sid in chains}
            host = pdf["host"].iloc[0] if len(pdf) else ""
            out = []
            rnd = 0
            while True:
                alive = sorted(
                    (chains[sid][ptr[sid]][1], sid)
                    for sid in chains
                    if ptr[sid] < len(chains[sid])
                )
                if not alive:
                    break
                for rank, (_pag, sid) in enumerate(alive):
                    page_k = chains[sid][ptr[sid]][0]
                    admitted = rank < tokens
                    out.append((host, sid, page_k, rnd, admitted))
                    if admitted:
                        ptr[sid] += 1
                rnd += 1
            return pd.DataFrame(
                out, columns=["host", "seed_id", "page_k", "round", "admitted"]
            )

        valid = fetched.filter("chain_valid").select(
            "host", "seed_id", "page_k", "pagination_index"
        )
        # NOT materialized: the simulation is deterministic (sorted chains,
        # pure function of the already-materialized index_fetched parquet),
        # so its two consumers (lineage counts, the admitted-pages join) can
        # each re-evaluate the tiny per-host groupBy cheaper than a
        # write+read round-trip costs
        schedule = valid.groupBy("host").applyInPandas(
            lambda pdf: simulate(pdf),
            schema="host string, seed_id int, page_k int, round int, admitted boolean",
        )

        pid = F.pmod(F.hash("host"), F.lit(N_LINEAGE_BUCKETS)).cast("int")
        rows = (
            schedule.groupBy("admitted", "round", pid.alias("pid")).count().collect()
        )
        per_round: dict[int, dict[tuple[str, int], int]] = {}
        for r in rows:
            d = "fetched" if r["admitted"] else "deferred"
            per_round.setdefault(r["round"], {})[(d, r["pid"])] = r["count"]
        if per_round:
            for rnd in sorted(per_round):
                self._note_lineage("index", rnd, per_round[rnd])
        else:
            # no candidate pages at all — the loop still notes an empty
            # round 0 for its index seeds
            self._note_lineage("index", 0, {})

        sched_adm = schedule.filter("admitted").select("seed_id", "page_k", "round")
        if self.broadcast_frontier:
            # schedule rows ~ chain pages (+ waits): slim; broadcasting keeps
            # the html-bearing fetch table unshuffled. Past broadcastable
            # scale, broadcast_frontier=False falls back to a shuffle join.
            sched_adm = F.broadcast(sched_adm)
        assigned = fetched.join(sched_adm, ["seed_id", "page_k"], "inner")
        valid_pages = assigned.filter(~F.col("body_empty"))
        if self.index_fn is None:
            links = (
                valid_pages.select(
                    "seed_id",
                    F.col("round").cast("int").alias("page_round"),
                    F.posexplode_outer("hrefs").alias("pos", "url"),
                )
                .filter(F.col("pos").isNotNull())
                .select("seed_id", "page_round", "pos", "url")
            )
            return links, seen
        links = self._project_links(valid_pages, F.col("round"))
        return self._materialize(links, "links"), seen

    def run_index_phase_speculative(self, seen: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Corpus-replay index phase: ONE distributed pass, no driver loop.

        The reference's pagination chain is sequential only because page k's
        *emptiness* gates page k+1 (lib/upton.rb:295-311) — the URLs
        themselves are predictable. Against a replay corpus (where "fetch" is
        a join, so speculative over-read is free) we can therefore generate
        every candidate page URL up front with ``sequence``+``explode``, join
        ``pages`` once, and recover the chain-termination semantics with a
        window: a page belongs to the valid prefix iff no earlier page of its
        seed was empty. Lineage counts only the valid prefix, so the
        politeness sleep-count goldens hold exactly. A live-HTTP deployment
        flips ``index_sequential=True`` to avoid speculative requests."""
        fetched = self._fetch_all_index_pages(seen)

        pid = F.pmod(F.hash("host"), F.lit(N_LINEAGE_BUCKETS)).cast("int")
        decision = F.when(F.col("cache_hit"), "cache_hit").otherwise("fetched")
        counts = {
            (r["decision"], r["pid"]): r["count"]
            for r in fetched.filter("chain_valid")
            .select(decision.alias("decision"), pid.alias("pid"))
            .groupBy("decision", "pid")
            .count()
            .collect()
        }
        n_live = sum(v for (d, _), v in counts.items() if d == "fetched")
        if self.index_cached and n_live:
            seen, _ = self._mark_seen(
                seen,
                fetched.filter(F.col("chain_valid") & ~F.col("cache_hit")).select(
                    F.col("fetch_url").alias("url")
                ),
                0,
                n_live,
            )
        self._note_lineage("index", 0, counts)

        valid = fetched.filter(F.col("chain_valid") & ~F.col("body_empty"))
        if self.index_fn is None:
            links = (
                valid.select(
                    "seed_id",
                    F.col("page_k").cast("int").alias("page_round"),
                    F.posexplode_outer("hrefs").alias("pos", "url"),
                )
                .filter(F.col("pos").isNotNull())
                .select("seed_id", "page_round", "pos", "url")
            )
            # lazy: reads the materialized index_fetched parquet; the frontier
            # build materializes downstream
            return links, seen
        links = self._project_links(valid, F.col("page_k"))
        return self._materialize(links, "links"), seen

    def _project_links(self, fetched: DataFrame, page_round_col) -> DataFrame:
        """Index pages → link rows (seed_id, page_round, pos, url); the
        default CSS-selector href projection (lib/upton.rb:281-288, NULL
        hrefs preserved) or the user's ``index_fn`` override."""
        src = fetched.select(
            "seed_id",
            page_round_col.cast("int").alias("page_round"),
            "seed_url",
            F.col("fetch_url").alias("url"),
            "html",
            "index_selector",
        )
        if self.index_fn is not None:
            return self.index_fn(src).select("seed_id", "page_round", "pos", "url")
        return (
            src.withColumn(
                "hrefs",
                extract_links_udf(F.col("html"), F.col("index_selector"), F.col("seed_url")),
            )
            .select("seed_id", "page_round", F.posexplode_outer("hrefs").alias("pos", "url"))
            .filter(F.col("pos").isNotNull())
            .select("seed_id", "page_round", "pos", "url")
        )

    def _index_candidate_urls_local(self, max_urls: int = 10_000) -> list[str] | None:
        """Driver-side replica of _index_page_candidates' URL universe (the
        same pure urlkit functions the UDFs wrap) — usable as a pushdown IN
        filter for the prescan. None when the candidate set is too large to
        inline (falls back to the distributed semi-join prescan)."""
        from upton_spark import urlkit

        urls: list[str] = []
        for s in self.seeds:
            if not s.seed_url or s.index_selector is None:
                continue
            pages_n = s.pagination_max_pages if s.paginated else 1
            if len(urls) + pages_n > max_urls:
                return None
            for k in range(pages_n):
                pi = s.pagination_start_index + k * s.pagination_interval
                raw = urlkit.next_index_page_url(
                    s.seed_url,
                    pi,
                    paginated=s.paginated,
                    pagination_param=s.pagination_param,
                    pagination_max_pages=s.pagination_max_pages,
                )
                if not raw:
                    continue
                u = urlkit.resolve_url_or_none(raw, s.seed_url)
                if u:
                    urls.append(u)
        return urls

    def run_index_phase_sequential(self, seen: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Fetch paginated index chains, project links. Returns (links, seen).

        One pagination page per alive seed per round; a seed's chain stops on
        empty next-url (past max pages), next==prev (non-paginated seeds
        after round 0), or empty body (lib/upton.rb:295-311).

        Each round is TWO Spark jobs (down from five): candidates (UDF chain
        + admission), body join, and body-emptiness land in a single
        materialized round table; one tiny groupBy over that parquet then
        yields the lineage counts AND the alive-next-round count together.
        Links and the next round's chain state derive lazily from the round
        parquet. Politeness-bounded crawls are round-dominated, so per-round
        driver job count is the wall-clock at thousands of rounds."""
        index_seeds = self.seeds_df.filter(
            (F.col("seed_url") != "") & F.col("index_selector").isNotNull()
        )
        state = (
            index_seeds.withColumn("pagination_index", F.col("pagination_start_index"))
            .withColumn("prev_url", F.lit(None).cast("string"))
        )
        # initial alive count is known driver-side — no state.count() job
        alive = sum(
            1 for s in self.seeds if s.seed_url and s.index_selector is not None
        )
        links_parts: list[DataFrame] = []
        round_no = 0
        # runaway backstop only — the loop exits on empty state. Must cover
        # host CONTENTION: seeds sharing a host serialize on tokens, so the
        # worst case is every chain on one host at 1 token/round = the SUM
        # of chain caps, not the max.
        max_rounds = 2 + sum(
            (s.pagination_max_pages * max(1, s.pagination_interval) if s.paginated else 1)
            for s in self.seeds
            if s.seed_url and s.index_selector is not None
        )
        seed_cols = [f.name for f in schemas.SEEDS.fields]
        # one prescan for the whole phase; broadcast-corpus flip when small
        # (see _index_pruned_corpus for both rationales)
        pl_index, bcast_pages = self._index_pruned_corpus()
        while round_no < max_rounds and alive > 0:
            cand = state.withColumn(
                "next_url_raw",
                next_index_page_url_udf(
                    F.col("seed_url"),
                    F.col("pagination_index"),
                    F.col("paginated"),
                    F.col("pagination_param"),
                    F.col("pagination_max_pages"),
                ),
            )
            cand = cand.filter(F.col("next_url_raw") != "")
            cand = cand.withColumn(
                "fetch_url", resolve_url_udf(F.col("next_url_raw"), F.col("seed_url"))
            ).filter(F.col("prev_url").isNull() | (F.col("fetch_url") != F.col("prev_url")))
            cand = dedup_ops.with_url_hashes(
                cand.withColumn("host", host_col(F.col("fetch_url"))), "fetch_url"
            )

            # stash-hit check for index pages (reference @index_debug)
            if self.index_cached:
                seen_keys = seen.select("url_hash").distinct()
                hits = cand.join(seen_keys, "url_hash", "left_semi").withColumn(
                    "cache_hit", F.lit(True)
                )
                misses = cand.join(seen_keys, "url_hash", "left_anti").withColumn(
                    "cache_hit", F.lit(False)
                )
                cand = hits.unionByName(misses)
            else:
                cand = cand.withColumn("cache_hit", F.lit(False))

            # politeness: live index fetches consume tokens (the reference
            # sleeps after every live request incl. index pages).
            cand = cand.withColumn(
                "host_tokens",
                F.when(F.col("cache_hit"), F.lit(polite_ops.UNLIMITED)).otherwise(
                    _tokens_col(F.col("sleep_time_between_requests"), self.round_budget_s)
                ),
            )
            cand = polite_ops.admit_per_host(cand, order_cols=("pagination_index", "seed_id"))

            # fused round table: candidates + bodies in one write. The body
            # join covers deferred rows too (corpus replay: a join row is not
            # a live fetch — lineage/politeness accounting is decision-based)
            # so admitted and deferred alike read back from one parquet.
            if self.fetch_fn is not None:
                # live mode: ONLY admitted non-cache-hit rows (the token
                # consumers) reach the transport; admitted cache hits read
                # the stash; deferred rows carry a NULL body this round
                # (unread — they re-enter admission next round). Deferred
                # rows must NOT read the stash here: a stale stash body
                # would feed body_empty/chain logic with content the live
                # crawl never fetched this round.
                is_live = F.col("admitted") & ~F.col("cache_hit")
                deferred = cand.filter(~F.col("admitted")).withColumn(
                    "html", F.lit(None).cast("binary")
                )
                fused = (
                    self._transport_bodies(cand.filter(is_live), "fetch_url")
                    .unionByName(
                        self._join_bodies(
                            cand.filter(F.col("admitted") & F.col("cache_hit")),
                            "fetch_url",
                        )
                    )
                    .unionByName(deferred)
                )
            elif bcast_pages:
                fused = cand.join(
                    F.broadcast(pl_index.withColumnRenamed("url", "fetch_url")),
                    "fetch_url",
                    "left",
                )
            else:
                fused = self._join_bodies(cand, "fetch_url", pages_override=pl_index)
            fused = fused.withColumn(
                "body_empty", F.col("html").isNull() | (F.length("html") == 0)
            )
            fused = self._materialize(fused, "index_round")
            decision = (
                F.when(~F.col("admitted"), "deferred")
                .when(F.col("cache_hit"), "cache_hit")
                .otherwise("fetched")
            )
            counts, extra = self._collect_decision_counts(
                fused, decision,
                extra={"__advanced": F.col("admitted") & ~F.col("body_empty")},
            )

            n_live = sum(v for (d, _), v in counts.items() if d == "fetched")
            n_deferred = sum(v for (d, _), v in counts.items() if d == "deferred")
            if self.index_cached and n_live:
                seen, _ = self._mark_seen(
                    seen,
                    fused.filter(F.col("admitted") & ~F.col("cache_hit")).select(
                        F.col("fetch_url").alias("url")
                    ),
                    round_no,
                    n_live,
                )
            if counts or round_no == 0:  # trailing empty rounds add no lineage
                self._note_lineage("index", round_no, counts)

            fetched = fused.filter(F.col("admitted"))
            links_parts.append(
                self._project_links(fetched.filter(~F.col("body_empty")), F.lit(round_no))
            )

            # advance: admitted seeds move to the next pagination index and
            # survive only with a non-empty body; deferred seeds retry as-is.
            # Lazy over the round parquet — exactly one filter/union layer,
            # so the next round's UDF chain stays one parquet read deep.
            advanced = (
                fetched.filter(~F.col("body_empty"))
                .withColumn("pagination_index", F.col("pagination_index") + F.col("pagination_interval"))
                .withColumn("prev_url", F.col("fetch_url"))
                .select(*seed_cols, "pagination_index", "prev_url")
            )
            deferred_state = fused.filter(~F.col("admitted")).select(
                *seed_cols, "pagination_index", "prev_url"
            )
            state = advanced.unionByName(deferred_state)
            alive = extra["__advanced"] + n_deferred
            round_no += 1

        if links_parts:
            links = links_parts[0]
            for part in links_parts[1:]:
                links = links.unionByName(part)
        else:
            links = self.spark.createDataFrame([], schema=_LINKS_SCHEMA)
        return self._materialize(links, "links"), seen

    # one priority bucket past any plausible instance_index: unranked urls
    # order after every ranked one but keep their relative DOM order via the
    # (seed_id, instance_index) tie-breakers every admission window carries
    _UNRANKED_PRIORITY = 1 << 40

    def _with_redirects(self, df: DataFrame) -> DataFrame:
        """Rewrite frontier urls through the known ``redirect_map`` before
        dedup/admission. Min-per-src first (duplicate srcs in a user table
        must not fan out frontier rows, same rule as _with_priority);
        unresolved map rows (NULL final_url) drop out so cycles keep the
        original url and surface as a normal empty-body fetch."""
        if self.redirect_map is None:
            return df
        rm = (
            self.redirect_map.filter(F.col("final_url").isNotNull())
            .groupBy(F.col("src").alias("url"))
            .agg(F.min("final_url").alias("_final"))
        )
        return (
            df.join(rm, "url", "left")
            .withColumn("url", F.coalesce("_final", "url"))
            .drop("_final")
        )

    def _with_priority(self, df: DataFrame) -> DataFrame:
        """Frontier priority column: the reference's implicit DOM order
        (instance_index) unless a ``url_priorities`` table overrides it."""
        if self.url_priorities is None:
            return df.withColumn("priority", F.col("instance_index"))
        # min-per-url first: a user table with duplicate urls must not fan
        # out frontier rows through the join (the strongest — lowest —
        # priority wins, deterministically)
        pr = self.url_priorities.groupBy("url").agg(
            F.min(F.col("priority").cast("long")).alias("_prio")
        )
        return (
            df.join(pr, "url", "left")
            .withColumn(
                "priority", F.coalesce("_prio", F.lit(self._UNRANKED_PRIORITY))
            )
            .drop("_prio")
        )

    def _apply_blocklist(self, cand: DataFrame) -> DataFrame:
        """Blocklist admission check beside the robots gate: a host-list or
        url-pattern hit clears robots_allowed, so the row takes the same
        terminal 'blocked' path (and lineage count) a robots Disallow does.
        ``block_traps`` runs webgraph.url_trap_scores in the same slot —
        pathological urls (loop paths, calendar spaces, param explosions)
        go terminal 'blocked' before a fetch token is ever spent."""
        if (
            self.blocklist_hosts is None
            and not self.blocklist_url_patterns
            and not self.block_traps
        ):
            return cand
        out = cand
        if self.blocklist_hosts is not None or self.blocklist_url_patterns:
            from upton_spark.operators.webgraph import blocklist_gate

            out = blocklist_gate(
                out, self.blocklist_hosts, self.blocklist_url_patterns
            ).withColumn(
                "robots_allowed", F.col("robots_allowed") & ~F.col("blocked")
            ).drop("blocked", "block_reason")
        if self.block_traps:
            from upton_spark.operators.webgraph import url_trap_scores

            out = url_trap_scores(out).withColumn(
                "robots_allowed", F.col("robots_allowed") & ~F.col("is_trap")
            ).drop("depth", "dup_segments", "param_count", "has_calendar", "is_trap")
        return out

    def _cap_host_tokens(self, new_urls: DataFrame) -> DataFrame:
        """Apply allocate_budget output as the per-round token ceiling:
        host_tokens = least(sleep/Crawl-delay tokens, budget), clamped >= 1
        so a zero/negative budget still lets the host drain (matching
        _tokens_col's min-1 progress guarantee) instead of deferring its
        rows forever."""
        if self.host_budgets is None:
            return new_urls
        b = self.host_budgets.select(
            "host", F.greatest(F.lit(1), F.col("budget").cast("long")).alias("_budget")
        )
        return (
            new_urls.join(F.broadcast(b), "host", "left")
            .withColumn(
                "host_tokens",
                F.least(
                    F.col("host_tokens"),
                    F.coalesce(F.col("_budget"), F.lit(polite_ops.UNLIMITED)),
                ),
            )
            .drop("_budget")
        )

    # -------------------------------------------------------- instance phase
    def build_frontier(self, links: DataFrame) -> DataFrame:
        """Links + explicit url_list seeds → frontier with instance_index in
        index-DOM order (posexplode position within page, pages in chain
        order — lib/upton.rb:266-268,337-345)."""
        w = Window.partitionBy("seed_id").orderBy("page_round", "pos")
        from_index = links.withColumn(
            "instance_index", (F.row_number().over(w) - 1).cast("long")
        ).select("seed_id", "instance_index", "url")
        explicit_rows = [
            (s.seed_id, idx, url)
            for s in self.seeds
            if s.url_list is not None
            for idx, url in enumerate(s.url_list)
        ]
        explicit = self.spark.createDataFrame(
            explicit_rows, schema="seed_id int, instance_index long, url string"
        )
        frontier = (
            self._with_redirects(from_index.unionByName(explicit))
            .withColumn("pagination_index", F.lit(0))
            .withColumn("host", host_col(F.col("url")))
            .withColumn("depth", F.lit(1))
        )
        frontier = (
            self._with_priority(frontier)
            .withColumn("attempts", F.lit(0))
            .withColumn(
                "status",
                F.when(F.col("url").isNull() | (F.col("url") == ""), "empty_url").otherwise(
                    "queued"
                ),
            )
            .withColumn("url", F.coalesce(F.col("url"), F.lit("")))
        )
        hashed = dedup_ops.with_url_hashes(frontier)
        # salted host partitioning (SURVEY.md §4.1): bound any partition's
        # share of a Zipf-hot host before the frontier hits storage.
        # Partition count scales with the frontier's size (links row count is
        # a parquet-footer read — the links table is already materialized):
        # a politeness-bounded 10^2-row frontier writes 1 file instead of
        # defaultParallelism near-empty ones (shuffle+write overhead was the
        # bulk of build_frontier's fixed cost on small crawls); a bulk crawl
        # still spreads across every core.
        n_rows = links.count() + len(explicit_rows)
        self._frontier_rows = n_rows  # drives crawl()'s job-diet decision
        n_parts = max(1, min(self.spark.sparkContext.defaultParallelism, -(-n_rows // 4096)))
        salted = part_ops.salted_repartition(
            hashed,
            n_parts,
            rows_per_bucket=self.frontier_rows_per_bucket,
        )
        return self._materialize(salted, "frontier")

    def run_fetch_rounds(
        self,
        frontier: DataFrame,
        seen: DataFrame,
        *,
        phase: str = "instance",
        max_rounds: int = 64,
        stop_after_round: int | None = None,
        start_round: int = 0,
    ) -> tuple[DataFrame, DataFrame]:
        """Politeness-bounded fetch loop over queued frontier rows.

        Each round: robots gate → Bloom+anti-join dedup (cache hits free) →
        per-host token admission → mark fetched, merge seen → snapshot
        commit with per-host-bucket lineage. Deferred rows re-enter next
        round. Returns (frontier, seen) with statuses resolved."""
        if self._oneshot_eligible(stop_after_round):
            return self._run_fetch_rounds_oneshot(
                frontier, seen, phase=phase, max_rounds=max_rounds, start_round=start_round
            )
        round_no = start_round
        rounds_done = 0
        seen_layers = 0  # lazy union layers on `seen` since its last write
        while rounds_done < max_rounds:
            queued = frontier.filter(F.col("status") == "queued")
            # emptiness needs a driver check only on entry: later iterations
            # only continue when the previous round left deferred/retry rows
            if rounds_done == 0 and queued.limit(1).count() == 0:
                break
            # one fetch decision per distinct url; lowest-priority row wins
            w = Window.partitionBy("url_hash").orderBy("priority", "seed_id", "instance_index")
            cand = (
                queued.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            cand = self._apply_blocklist(self._get_robots_gate()(cand))
            blocked = cand.filter(~F.col("robots_allowed"))
            allowed_cand = cand.filter(F.col("robots_allowed"))

            if self.instance_cached and self._seen_count > 0:
                cache_hits = allowed_cand.join(
                    seen.select("url_hash").distinct(), "url_hash", "left_semi"
                )
                new_urls = dedup_ops.dedup_against_seen(
                    self.spark, allowed_cand, seen,
                    self._bloom if self._bloom_active else None,
                )
            else:
                # empty seen set (fresh crawl, round 0): the Bloom probe and
                # both joins are identities — skip the jobs entirely
                cache_hits = allowed_cand.limit(0)
                new_urls = allowed_cand

            new_urls = new_urls.join(
                F.broadcast(self.seeds_df.select("seed_id", "sleep_time_between_requests")),
                "seed_id",
                "left",
            )
            delays = self._get_crawl_delays()
            if delays is not None:
                new_urls = (
                    new_urls.join(F.broadcast(delays), "host", "left")
                    .withColumn(
                        "sleep_time_between_requests",
                        F.greatest(
                            F.col("sleep_time_between_requests"),
                            F.coalesce("crawl_delay", F.lit(0.0)),
                        ),
                    )
                    .drop("crawl_delay")
                )
            new_urls = new_urls.withColumn(
                "host_tokens", _tokens_col(F.col("sleep_time_between_requests"), self.round_budget_s)
            )
            new_urls = self._cap_host_tokens(new_urls)
            new_urls = polite_ops.admit_per_host(new_urls)

            # bounded retry: an admitted row whose url is still inside its
            # injected failure budget "times out" — it consumed a politeness
            # token but produced no body; it re-queues with attempts+1 until
            # max_fetch_attempts, then goes terminal 'failed' (empty body,
            # NOT marked seen — a later crawl retries it fresh).
            if self.fetch_failures is not None:
                new_urls = new_urls.join(
                    F.broadcast(self.fetch_failures.select("url", "fail_times")), "url", "left"
                )
            else:
                new_urls = new_urls.withColumn("fail_times", F.lit(None).cast("int"))
            attempt_fails = (
                F.col("admitted")
                & F.col("fail_times").isNotNull()
                & (F.col("attempts") < F.col("fail_times"))
            )
            terminal = attempt_fails & (
                F.col("attempts") + 1 >= F.lit(self.max_fetch_attempts)
            )

            decisions = (
                new_urls.select(
                    "url_hash",
                    "url",
                    "host",
                    F.when(~F.col("admitted"), "deferred")
                    .when(terminal, "failed")
                    .when(attempt_fails, "retry")
                    .otherwise("fetched")
                    .alias("decision"),
                )
                .unionByName(
                    cache_hits.select(
                        "url_hash", "url", "host", F.lit("cache_hit").alias("decision")
                    )
                )
                .unionByName(
                    blocked.select("url_hash", "url", "host", F.lit("blocked").alias("decision"))
                )
            )
            decisions = self._materialize(decisions, "decisions")
            counts, _ = self._collect_decision_counts(decisions, F.col("decision"))
            n_admitted = sum(v for (d, _), v in counts.items() if d == "fetched")
            n_deferred = sum(v for (d, _), v in counts.items() if d == "deferred")
            n_retry = sum(v for (d, _), v in counts.items() if d == "retry")
            n_failed = sum(v for (d, _), v in counts.items() if d == "failed")

            ending = n_deferred == 0 and n_retry == 0
            seen_delta = None
            if self.instance_cached and n_admitted:
                # a later probe of the bloom happens only if more rounds run
                # (deferred/retry rows) or instance pagination will re-enter
                will_probe_again = (
                    not ending or self.next_instance_page_url_fn is not None
                )
                seen, seen_delta = self._mark_seen(
                    seen,
                    decisions.filter(F.col("decision") == "fetched").select("url"),
                    round_no,
                    n_admitted,
                    update_bloom=will_probe_again,
                    materialize=False,
                )
            self._note_lineage(phase, round_no, counts)

            status_map = decisions.filter(F.col("decision") != "deferred").select(
                "url_hash", F.col("decision").alias("new_status")
            )
            if not self.instance_cached:
                status_map = status_map.withColumn(
                    "new_status",
                    F.when(F.col("new_status") == "cache_hit", "fetched").otherwise(
                        F.col("new_status")
                    ),
                )
            status_map = status_map.dropDuplicates(["url_hash"])
            frontier = self._merge_status(frontier, status_map)

            # delta-based rounds: the whole frontier/seen-set is rewritten
            # only on compaction (every compact_every rounds) or when the
            # loop ends; in between, state stays a bounded stack of lazy
            # broadcast-join/union layers over the last compacted parquet
            # and the catalog carries per-round deltas (politeness-bounded
            # size — never O(frontier)).
            if seen_delta is not None:
                seen_layers += 1
            compact = ending or (rounds_done + 1) % self.compact_every == 0
            if compact:
                frontier = self._materialize(frontier, "frontier_round")
                if seen_layers and not ending:
                    seen = self._materialize(seen, "urls_seen")
                    seen_layers = 0
            if self.catalog is not None:
                metrics = {
                    "phase": phase,
                    "round": round_no,
                    "fetched": n_admitted,
                    "deferred_by_politeness": n_deferred,
                    "cache_hits": sum(v for (d, _), v in counts.items() if d == "cache_hit"),
                    "blocked_by_robots": sum(v for (d, _), v in counts.items() if d == "blocked"),
                    "retried": n_retry,
                    "failed": n_failed,
                    "urls_seen": self._seen_count,
                }
                # rounds_done == 0 forces a FULL commit at the start of
                # every run_fetch_rounds invocation (main loop, each
                # instance-pagination phase): deltas in the manifest are
                # therefore always relative to a full table from the SAME
                # invocation — phases can never mix delta round keys
                if compact or rounds_done == 0:
                    self.catalog.commit(
                        round_no,
                        {"frontier": frontier, "urls_seen": seen, "lineage": self.lineage_df()},
                        metrics=metrics,
                        drop_prefixes=("frontier_delta_r", "urls_seen_delta_r"),
                    )
                else:
                    deltas = {f"frontier_delta_r{round_no}": status_map,
                              "lineage": self.lineage_df()}
                    if seen_delta is not None:
                        deltas[f"urls_seen_delta_r{round_no}"] = seen_delta
                    self.catalog.commit(round_no, deltas, metrics=metrics)
            round_no += 1
            rounds_done += 1
            if stop_after_round is not None and round_no > stop_after_round:
                raise KilledCrawl(round_no)
            if ending:
                break
        return frontier, seen

    def _oneshot_eligible(self, stop_after_round: int | None) -> bool:
        """The politeness round schedule is PREDICTABLE — a queued url with
        per-host admission rank r is fetched in round (r-1) div host_tokens —
        whenever nothing perturbs it between rounds. One distributed pass can
        then compute every round's decisions, statuses, per-round lineage,
        and the seen-set, bit-identical to the loop but with O(1) driver jobs
        instead of O(rounds): the wall-clock unlock for politeness-bounded
        crawls (round-dominated by construction). Requirements:

        * no injected fetch failures (retries re-enter admission and shift
          later rows' rounds),
        * no catalog (the per-round delta-commit contract wants a commit
          boundary per round; resumability keeps the loop),
        * no kill-simulation (stop_after_round targets the loop),
        * a uniform seed sleep budget: with one sleep across seeds, every
          row on a host shares host_tokens (robots Crawl-delay maxes in
          per-host, so it stays uniform), making the closed form exact.
          Heterogeneous budgets make admission rank interleaving
          state-dependent -> loop.
        Equivalence is pinned by test_oneshot_matches_loop_*."""
        if self.fetch_failures is not None or self.catalog is not None:
            return False
        if stop_after_round is not None:
            return False
        # a live transport must fetch round-by-round under the real
        # politeness pacing — the closed form would issue every round's
        # fetches in one wall-clock instant
        if self.fetch_fn is not None:
            return False
        return len({s.sleep_time_between_requests for s in self.seeds}) <= 1

    def _run_fetch_rounds_oneshot(
        self,
        frontier: DataFrame,
        seen: DataFrame,
        *,
        phase: str,
        max_rounds: int,
        start_round: int,
    ) -> tuple[DataFrame, DataFrame]:
        """Closed-form fetch phase (see _oneshot_eligible): one decisions
        write + one tiny counts collect, then driver-side lineage replay."""
        queued = frontier.filter(F.col("status") == "queued")
        w = Window.partitionBy("url_hash").orderBy("priority", "seed_id", "instance_index")
        cand = (
            queued.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        cand = self._apply_blocklist(self._get_robots_gate()(cand))
        blocked = cand.filter(~F.col("robots_allowed"))
        allowed_cand = cand.filter(F.col("robots_allowed"))

        if self.instance_cached and self._seen_count > 0:
            cache_hits = allowed_cand.join(
                seen.select("url_hash").distinct(), "url_hash", "left_semi"
            )
            new_urls = dedup_ops.dedup_against_seen(
                self.spark, allowed_cand, seen,
                self._bloom if self._bloom_active else None,
            )
        else:
            cache_hits = allowed_cand.limit(0)
            new_urls = allowed_cand

        new_urls = new_urls.join(
            F.broadcast(self.seeds_df.select("seed_id", "sleep_time_between_requests")),
            "seed_id",
            "left",
        )
        delays = self._get_crawl_delays()
        if delays is not None:
            new_urls = (
                new_urls.join(F.broadcast(delays), "host", "left")
                .withColumn(
                    "sleep_time_between_requests",
                    F.greatest(
                        F.col("sleep_time_between_requests"),
                        F.coalesce("crawl_delay", F.lit(0.0)),
                    ),
                )
                .drop("crawl_delay")
            )
        new_urls = new_urls.withColumn(
            "host_tokens", _tokens_col(F.col("sleep_time_between_requests"), self.round_budget_s)
        )
        new_urls = self._cap_host_tokens(new_urls)
        # the loop's admit_per_host re-ranks remaining rows each round with
        # constant per-host tokens; closed form: round = (rank-1) div tokens
        order_cols = ("priority", "seed_id", "instance_index", "pagination_index", "url")
        present = [c for c in order_cols if c in new_urls.columns]
        wh = Window.partitionBy("host").orderBy(
            *[F.col(c).asc_nulls_last() for c in present]
        )
        round_rel = F.floor((F.row_number().over(wh) - 1) / F.col("host_tokens"))
        decisions = (
            new_urls.select(
                "url_hash",
                "url",
                "host",
                F.lit("fetched").alias("decision"),
                (F.lit(start_round) + round_rel).cast("int").alias("round_assigned"),
            )
            .unionByName(
                cache_hits.select(
                    "url_hash", "url", "host",
                    F.lit("cache_hit").alias("decision"),
                    F.lit(start_round).cast("int").alias("round_assigned"),
                )
            )
            .unionByName(
                blocked.select(
                    "url_hash", "url", "host",
                    F.lit("blocked").alias("decision"),
                    F.lit(start_round).cast("int").alias("round_assigned"),
                )
            )
        )
        # persist + counts-collect fuses the oneshot's pin and its lineage
        # aggregation into ONE job (the loop's parquet write+read round trip
        # is for unbounded round iteration; the oneshot is a single pass, so
        # a cached plan never grows). Later consumers (status_map, seen)
        # read the cached rows. Single-slot per session: the previous
        # oneshot crawl's pin is released here (its result DataFrames stay
        # correct — they recompute from pinned parquet inputs if re-acted
        # on), so repeated crawls never accumulate dead cache blocks.
        app_id = self.spark.sparkContext.applicationId
        for k in list(_ONESHOT_DECISIONS_PIN):
            old = _ONESHOT_DECISIONS_PIN.pop(k)
            if k == app_id:
                try:
                    old.unpersist()
                except Exception:
                    pass  # a pin from a stopped session has nothing to free
        decisions = decisions.persist()
        _ONESHOT_DECISIONS_PIN[app_id] = decisions
        pid = F.pmod(F.hash("host"), F.lit(N_LINEAGE_BUCKETS)).cast("int")
        rows = (
            decisions.groupBy("decision", "round_assigned", pid.alias("pid"))
            .count()
            .collect()
        )
        if not rows:
            return frontier, seen  # nothing queued: loop parity = no lineage

        # rows past the round cap stay queued (the loop would stop at
        # max_rounds with them still deferred)
        cap = start_round + max_rounds
        fetched_by_round: dict[int, dict[int, int]] = {}
        overflow: dict[int, int] = {}
        first_round_counts: dict[tuple[str, int], int] = {}
        for r in rows:
            if r["decision"] == "fetched":
                if r["round_assigned"] >= cap:
                    overflow[r["pid"]] = overflow.get(r["pid"], 0) + r["count"]
                else:
                    by_pid = fetched_by_round.setdefault(r["round_assigned"], {})
                    by_pid[r["pid"]] = by_pid.get(r["pid"], 0) + r["count"]
            else:
                key = (r["decision"], r["pid"])
                first_round_counts[key] = first_round_counts.get(key, 0) + r["count"]

        if overflow:
            n_rounds = max_rounds
        else:
            rel_max = max((r - start_round for r in fetched_by_round), default=-1)
            n_rounds = max(rel_max + 1, 1 if (first_round_counts or fetched_by_round) else 0)
        n_fetched_total = sum(sum(p.values()) for p in fetched_by_round.values())

        for rel in range(n_rounds):
            r = start_round + rel
            per_pid: dict[tuple[str, int], int] = {}
            for p, v in fetched_by_round.get(r, {}).items():
                per_pid[("fetched", p)] = v
            if rel == 0:
                for (d, p), v in first_round_counts.items():
                    per_pid[(d, p)] = v
            # deferred at round r = rows admitted in a later round + overflow
            for r2, by_pid in fetched_by_round.items():
                if r2 > r:
                    for p, v in by_pid.items():
                        per_pid[("deferred", p)] = per_pid.get(("deferred", p), 0) + v
            for p, v in overflow.items():
                per_pid[("deferred", p)] = per_pid.get(("deferred", p), 0) + v
            if self.instance_cached:
                self._seen_count += sum(fetched_by_round.get(r, {}).values())
            self._note_lineage(phase, r, per_pid)

        status_map = decisions.filter(
            (F.col("decision") != "fetched") | (F.col("round_assigned") < cap)
        ).select("url_hash", F.col("decision").alias("new_status"))
        if not self.instance_cached:
            status_map = status_map.withColumn(
                "new_status",
                F.when(F.col("new_status") == "cache_hit", "fetched").otherwise(
                    F.col("new_status")
                ),
            )
        status_map = status_map.dropDuplicates(["url_hash"])
        merged = self._merge_status(frontier, status_map)
        n_decided = sum(r["count"] for r in rows)
        if (
            self.catalog is not None
            or self.next_instance_page_url_fn is not None
            or n_decided > 20_000
        ):
            # later phases (delta commits, instance-pagination rounds) will
            # re-read the frontier repeatedly, and bulk frontiers get
            # re-evaluated by the extraction-prune probes: pin those
            frontier = self._materialize(merged, "frontier_round")
        else:
            # politeness-bounded crawl with nothing re-entering the loop:
            # the merge is one broadcast join over already-pinned inputs —
            # leaving it lazy saves a write+read job on every such crawl
            frontier = merged

        if self.instance_cached and n_fetched_total:
            seen = self._mark_seen_assigned(
                seen,
                decisions.filter(
                    (F.col("decision") == "fetched") & (F.col("round_assigned") < cap)
                ),
                update_bloom=self.next_instance_page_url_fn is not None,
            )
        return frontier, seen

    def _mark_seen_assigned(
        self, seen: DataFrame, fetched: DataFrame, update_bloom: bool
    ) -> DataFrame:
        """One-shot seen merge: per-row first_round = the round the closed
        form fetched it in (loop parity). self._seen_count was already
        advanced round-by-round by the lineage replay — no double count."""
        stamp = self.clock or datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        new_rows = dedup_ops.with_url_hashes(fetched.select("url", "round_assigned")).select(
            "url_hash",
            "url",
            F.col("round_assigned").cast("int").alias("first_round"),
            F.to_timestamp(F.lit(stamp)).alias("fetched_at"),
        )
        merged = seen.unionByName(new_rows)
        if update_bloom and self._bloom_active:
            dedup_ops.build_bloom(
                dedup_ops.with_url_hashes(new_rows.select("url")), into=self._bloom
            )
        elif update_bloom and self._seen_count >= self._bloom_min_seen:
            self._bloom_active = True
            dedup_ops.build_bloom(
                dedup_ops.with_url_hashes(merged.select("url")), into=self._bloom
            )
        return merged

    def _merge_status(self, frontier: DataFrame, status_map: DataFrame) -> DataFrame:
        """Apply one round's status delta (url_hash, new_status) to the
        frontier: terminal statuses overwrite 'queued'; 'retry'/'failed'
        increment attempts; 'retry' keeps the row queued. Used both by the
        live loop and by resume-time delta replay (deltas MUST apply in
        round order — a url decided 'retry' one round may be re-decided
        later)."""
        sm = status_map.withColumnRenamed("new_status", "_new_status")
        if self.broadcast_frontier:
            # one row per decided url per round — under the same contract
            # that makes the frontier broadcastable, broadcast it so the
            # frontier is never shuffled for the status merge
            sm = F.broadcast(sm)
        return (
            frontier.join(sm, "url_hash", "left")
            .withColumn(
                "attempts",
                F.when(
                    (F.col("status") == "queued")
                    & F.col("_new_status").isin("retry", "failed"),
                    F.col("attempts") + 1,
                ).otherwise(F.col("attempts")),
            )
            .withColumn(
                "status",
                F.when(
                    (F.col("status") == "queued")
                    & F.col("_new_status").isNotNull()
                    & (F.col("_new_status") != "retry"),
                    F.col("_new_status"),
                ).otherwise(F.col("status")),
            )
            .drop("_new_status")
        )

    def _catalog_frontier(self, snap) -> DataFrame:
        """Reconstruct the frontier at a snapshot: last full 'frontier'
        table + per-round status deltas replayed in round order (full
        commits drop superseded delta tables, so every delta present is
        newer than the carried full table)."""
        frontier = self.catalog.table(snap, "frontier")
        delta_names = sorted(
            (n for n in snap.tables if n.startswith("frontier_delta_r")),
            key=lambda n: int(n.rsplit("r", 1)[1]),
        )
        for name in delta_names:
            frontier = self._merge_status(frontier, self.catalog.table(snap, name))
        if delta_names:
            frontier = self._materialize(frontier, "frontier_resume")
        return frontier

    def _catalog_seen(self, snap) -> DataFrame:
        """Reconstruct the seen-set at a snapshot: full table + newer
        per-round deltas (grow-only, so a plain union)."""
        seen = self.catalog.table(snap, "urls_seen")
        delta_names = sorted(
            (n for n in snap.tables if n.startswith("urls_seen_delta_r")),
            key=lambda n: int(n.rsplit("r", 1)[1]),
        )
        for name in delta_names:
            seen = seen.unionByName(self.catalog.table(snap, name))
        return seen

    # ------------------------------------------------------ extraction phase
    def attach_bodies(
        self, frontier: DataFrame, prune_files: bool | list[str] = False
    ) -> DataFrame:
        """Frontier rows + page bodies. Missing/blocked/empty-url rows get a
        NULL body → decoded '' — the reference's EMPTY_STRING fetch-failure
        encoding (lib/upton.rb:35, lib/upton/downloader.rb:67).

        ``prune_files``: restrict the html-bearing corpus scan to the files a
        url prescan matched — a politeness-bounded crawl extracts a tiny
        fraction of the corpus, and without pruning the extraction join
        decompresses every page's html anyway. Callers gate it on frontier
        size (the prescan costs a url-column scan; a frontier touching most
        files falls back inside _pruned_pages).

        Live mode (fetch_fn set): status='fetched' rows — exactly the rows
        the admission loop charged a politeness token — acquire bodies
        through the transport; cache_hit rows still read the stash, and
        blocked/failed rows never touch the transport. The transport stage
        is MATERIALIZED (parquet pin) before anything downstream sees it:
        extraction plans are replayed by every action over them (scrape's
        guard probe + collect, one scan per extract kind, catalog commits),
        and a lazy transport would re-fetch every URL on each replay —
        breaking the one-token-one-fetch contract the admission loop paid
        for. The pin doubles as the stash write shape a real deployment
        would persist."""
        if self.fetch_fn is not None:
            live = frontier.filter(F.col("status") == "fetched")
            rest = frontier.filter(F.col("status") != "fetched")
            joined = self._materialize(
                self._transport_bodies(live, "url"), "live_bodies"
            ).unionByName(self._join_bodies(rest, "url"))
        else:
            joined = self._join_bodies(frontier, "url", prune_files=prune_files)
        return joined.withColumn(
            "html",
            F.when(F.col("status").isin("fetched", "cache_hit"), F.col("html")).otherwise(
                F.lit(None).cast("binary")
            ),
        )

    def extract(self, frontier_with_body: DataFrame) -> DataFrame:
        """Apply the per-seed extraction block; one branch per kind, unioned
        (a CASE over Python UDFs would evaluate every UDF on every row —
        BatchEvalPython hoists them — so we split instead).

        Branches are built only for kinds actually present in the seed list:
        every branch's plan re-scans the body join (html decompressed per
        branch), so an always-4-way union would cost 4 full corpus scans
        even when every seed is kind='text'."""
        df = frontier_with_body.join(
            F.broadcast(self.seeds_df.select("seed_id", "extract_selector", "extract_kind")),
            "seed_id",
            "left",
        )
        keys = ["url", "seed_id", "instance_index", "pagination_index"]
        null_row = F.lit(None).cast(T.ArrayType(T.StringType()))
        kinds_present = {s.extract_kind for s in self.seeds} or {"text"}
        parts: list[DataFrame] = []

        if "text" in kinds_present:
            parts.append(
                df.filter(F.col("extract_kind") == "text").select(
                    *keys,
                    F.lit(0).alias("match_index"),
                    extract_text_udf(F.col("html"), F.col("extract_selector")).alias("text"),
                    null_row.alias("row"),
                )
            )
        if "identity" in kinds_present:
            parts.append(
                df.filter(F.col("extract_kind") == "identity").select(
                    *keys,
                    F.lit(0).alias("match_index"),
                    decode_html_udf(F.col("html")).alias("text"),
                    null_row.alias("row"),
                )
            )
        if "content" in kinds_present:
            # selector-free boilerplate removal (operators.boilerplate) —
            # the training-data crawl path: no per-site CSS, the
            # text/link-density classifier finds the prose itself
            parts.append(
                df.filter(F.col("extract_kind") == "content").select(
                    *keys,
                    F.lit(0).alias("match_index"),
                    main_content_udf(F.col("html")).alias("text"),
                    null_row.alias("row"),
                )
            )
        if "list" in kinds_present:
            parts.append(
                df.filter(F.col("extract_kind") == "list")
                .withColumn("items", extract_list_udf(F.col("html"), F.col("extract_selector")))
                .select(*keys, F.posexplode_outer("items").alias("match_index", "text"))
                .withColumn("row", null_row)
            )
        if "table" in kinds_present:
            parts.append(
                df.filter(F.col("extract_kind") == "table")
                .withColumn("rows", extract_table_udf(F.col("html"), F.col("extract_selector")))
                .select(*keys, F.posexplode_outer("rows").alias("match_index", "row"))
                .withColumn("text", F.lit(None).cast("string"))
                .select(*keys, "match_index", "text", "row")
            )

        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # --------------------------------------------------------------- surface
    def crawl(
        self, *, max_fetch_rounds: int = 64, stop_after_round: int | None = None
    ) -> CrawlResult:
        self._lineage_rows = []
        seen = self._empty_seen()
        if self.catalog is not None:
            snap = self.catalog.latest()
            if snap is not None and "urls_seen" in snap.tables:
                seen = self._catalog_seen(snap)
                self._seen_count = self._load_bloom_from(seen)
        # small-crawl job diet (see job_diet): a bounded seed list keeps the
        # index-candidate universe bounded too (<= seeds x pagination_max_
        # pages), so the diet can start before any counting; the fetch phase
        # re-checks against the actual built-frontier size, so a small seed
        # list that fans out wide gets AQE back for the bulk work
        small = len(self.seeds) <= JOB_DIET_MAX_SEEDS
        with self._maybe_job_diet(small):
            links, seen = self.run_index_phase(seen)
            frontier = self.build_frontier(links)
        small = small and (self._frontier_rows or 0) <= JOB_DIET_MAX_ROWS
        with self._maybe_job_diet(small):
            frontier, seen = self.run_fetch_rounds(
                frontier, seen, max_rounds=max_fetch_rounds, stop_after_round=stop_after_round
            )
            frontier = self._instance_pagination(frontier, seen)
        # project the frontier down to what extraction consumes before it
        # rides the broadcast body join — the driver-side hash relation
        # shrinks ~2x vs broadcasting all frontier columns
        slim = frontier.select("url", "seed_id", "instance_index", "pagination_index", "status")
        extracted = self.extract(self.attach_bodies(slim, prune_files=self._extract_prune(frontier)))
        result = CrawlResult(extracted, frontier, seen, self.lineage_df(), links)
        if self.catalog is not None:
            self.catalog.commit(
                -1,
                {
                    "extracted": extracted,
                    "frontier": frontier,
                    "urls_seen": seen,
                    "lineage": result.lineage,
                    "links": links,
                },
                metrics={"phase": "final", "urls_seen": self._seen_count},
                drop_prefixes=("frontier_delta_r", "urls_seen_delta_r"),
            )
        return result

    def evict(self, urls: list[str]) -> None:
        """Re-crawl eviction: forget URLs so the next crawl refetches them.

        This is the deletion case a Bloom filter can't serve (north_star's
        cuckoo-filter fallback — see operators.dedup.CuckooFilter): the
        exact seen-set drops the rows via anti-join and the snapshot is
        recommitted; the approximate layer for the next crawl is rebuilt
        from the surviving rows (Bloom) or, in a long-lived service holding
        the filter in memory, updated in place via CuckooFilter.delete."""
        assert self.catalog is not None, "evict requires a catalog"
        snap = self.catalog.latest()
        assert snap is not None and "urls_seen" in snap.tables, "nothing to evict from"
        seen = self._catalog_seen(snap)
        gone = dedup_ops.with_url_hashes(
            self.spark.createDataFrame([(u,) for u in urls], "url string")
        ).select("url_hash")
        remaining = seen.join(gone, "url_hash", "left_anti")
        self.catalog.commit(
            snap.round,
            {"urls_seen": remaining},
            metrics={"phase": "evict", "evicted": len(urls)},
            drop_prefixes=("urls_seen_delta_r",),
        )

    def resume(self, *, max_fetch_rounds: int = 64) -> CrawlResult:
        """Continue from the last committed snapshot: reload frontier/seen,
        re-run remaining fetch rounds, finish extraction. Identical ordering
        and seen-set vs an uninterrupted run (north_star resume contract)."""
        assert self.catalog is not None, "resume requires a catalog"
        snap = self.catalog.latest()
        assert snap is not None, "nothing to resume"
        frontier = self._catalog_frontier(snap)
        seen = self._catalog_seen(snap)
        links = (
            self.catalog.table(snap, "links")
            if "links" in snap.tables
            else self.spark.createDataFrame([], schema=_LINKS_SCHEMA)
        )
        self._seen_count = self._load_bloom_from(seen)
        start_round = snap.round + 1 if snap.round >= 0 else 0
        frontier, seen = self.run_fetch_rounds(
            frontier, seen, max_rounds=max_fetch_rounds, start_round=start_round
        )
        frontier = self._instance_pagination(frontier, seen)
        # project the frontier down to what extraction consumes before it
        # rides the broadcast body join — the driver-side hash relation
        # shrinks ~2x vs broadcasting all frontier columns
        slim = frontier.select("url", "seed_id", "instance_index", "pagination_index", "status")
        extracted = self.extract(self.attach_bodies(slim, prune_files=self._extract_prune(frontier)))
        result = CrawlResult(extracted, frontier, seen, self.lineage_df(), links)
        self.catalog.commit(
            -1,
            {
                "extracted": extracted,
                "frontier": frontier,
                "urls_seen": seen,
                "lineage": result.lineage,
            },
            metrics={"phase": "final", "urls_seen": self._seen_count},
            drop_prefixes=("frontier_delta_r", "urls_seen_delta_r"),
        )
        return result

    def _instance_pagination(self, frontier: DataFrame, seen: DataFrame) -> DataFrame:
        """Optional next_instance_page_url hook (lib/upton.rb:321-334):
        page k+1 of an instance enters the frontier while page k's body is
        non-empty; chains stop on empty/unchanged URL or empty body. The
        hook receives the ORIGINAL instance url each time, like the
        reference (lib/upton.rb:326)."""
        fn = self.next_instance_page_url_fn
        if fn is None:
            return frontier

        @F.pandas_udf(T.StringType())
        def next_page(url: pd.Series, k: pd.Series) -> pd.Series:
            return pd.Series([fn(u, int(i)) if u else "" for u, i in zip(url, k)])

        for k in range(1, self.max_instance_pages + 1):
            base = frontier.filter(
                (F.col("pagination_index") == k - 1)
                & F.col("status").isin("fetched", "cache_hit")
            )
            base = self.attach_bodies(base).filter(
                F.col("html").isNotNull() & (F.length("html") > 0)
            )
            orig = frontier.filter(F.col("pagination_index") == 0).select(
                "seed_id", "instance_index", F.col("url").alias("orig_url")
            )
            nxt = (
                base.join(orig, ["seed_id", "instance_index"])
                .withColumn("next_url", next_page(F.col("orig_url"), F.lit(k)))
                .filter((F.col("next_url") != "") & (F.col("next_url") != F.col("url")))
            )
            if nxt.limit(1).count() == 0:
                break
            new_rows = dedup_ops.with_url_hashes(
                self._with_priority(
                    nxt.select(
                        "seed_id", "instance_index", F.col("next_url").alias("url")
                    )
                    .withColumn("pagination_index", F.lit(k))
                    .withColumn("host", host_col(F.col("url")))
                    .withColumn("depth", F.lit(1))
                )
                .withColumn("attempts", F.lit(0))
                .withColumn("status", F.lit("queued"))
            )
            frontier = self._materialize(frontier.unionByName(new_rows), "frontier_pag")
            frontier, seen = self.run_fetch_rounds(frontier, seen, phase=f"instance_pag_{k}")
        return frontier

    def _extract_prune(self, frontier: DataFrame) -> bool | list[str]:
        """Prune the extraction corpus scan only for small frontiers: the
        count is a parquet-footer job on the materialized frontier, and the
        threshold keeps bulk crawls (whose frontier touches most corpus
        files anyway) from paying a useless url-column prescan. Tiny
        frontiers return the driver-collected url list itself — the prescan
        then pushes an IN predicate to the parquet scan (row-group url stats
        prune it) instead of streaming the whole url column through a
        semi-join."""
        if self.pages_path is None or not self.broadcast_frontier:
            return False
        # one limit-probe job covers the common small-frontier case (the
        # limit short-circuits, so a huge frontier pays ~nothing); only
        # mid-size frontiers fall through to the footer count
        rows = frontier.select("url").distinct().limit(10_001).collect()
        if len(rows) <= 10_000:
            urls = [r["url"] for r in rows if r["url"]]
            return urls if urls else True
        if frontier.count() > self.extract_prune_max_urls:
            return False
        return True

    def lineage_df(self) -> DataFrame:
        return self.spark.createDataFrame(self._lineage_rows, schema=schemas.LINEAGE)

    # ----------------------------------------------------- Upton-shaped APIs
    # scrape() mirrors the reference's list-returning API and therefore
    # COLLECTS to the driver — fine at reference scale, catastrophic on a
    # bulk crawl. The guard raises instead of silently OOM-ing the driver.
    SCRAPE_MAX_ROWS = 100_000

    def scrape(self) -> list:
        """Reference-shaped output: flat list over (instance, pagination
        page) in crawl order; text kind yields strings, list kind lists,
        table kind the [headers, *rows] nesting (lib/upton.rb:337-345).

        Driver-side by design (the reference returns a Ruby array,
        lib/upton.rb:47-51) and guarded by SCRAPE_MAX_ROWS: past the bound
        it raises, pointing at the distributed sinks (scrape_to_csv, or
        CrawlResult.extracted for DataFrame composition)."""
        result = self.crawl()
        # guard and collect in ONE action: limit(bound+1) caps what can ever
        # reach the driver, and an overflowing result shows up as bound+1
        # collected rows. A separate count() probe would evaluate the
        # UDF-heavy extraction plan twice per scrape.
        rows = (
            result.extracted.limit(self.SCRAPE_MAX_ROWS + 1)
            .orderBy("seed_id", "instance_index", "pagination_index", "match_index")
            .collect()
        )
        if len(rows) > self.SCRAPE_MAX_ROWS:
            raise ValueError(
                f"scrape() collects extracted rows to the driver and this crawl "
                f"produced more than SCRAPE_MAX_ROWS={self.SCRAPE_MAX_ROWS}; use "
                "scrape_to_csv(path, single_file=False) for a distributed sink, "
                "or work with CrawlResult.extracted directly"
            )
        kinds = {s.seed_id: s.extract_kind for s in self.seeds}
        docs: dict[tuple, object] = {}
        for r in rows:
            key = (r["seed_id"], r["instance_index"], r["pagination_index"])
            kind = kinds.get(r["seed_id"], "text")
            if kind in ("text", "identity", "content"):
                docs[key] = r["text"]
            else:
                doc = docs.setdefault(key, [])
                if kind == "list" and r["text"] is not None:
                    doc.append(r["text"])
                elif kind == "table" and r["row"] is not None:
                    doc.append(list(r["row"]))
        return [docs[k] for k in sorted(docs.keys())]

    def scrape_to_csv(self, path: str, sep: str = ",", single_file: bool = True) -> None:
        """CSV/TSV sink with the reference's duck-typed explode: table-kind
        documents write one line per row; list documents one line; text
        documents one line (lib/upton.rb:169-199). Output is a text dir
        (Spark-native sink); `sep`='\\t' gives TSV.

        ``single_file=True`` (the Upton-shaped convenience default) funnels
        the globally-ordered output through one task — fine for
        reference-sized jobs, wrong at scale. ``single_file=False`` keeps
        the write partitioned: the global order key is carried as a sortable
        line prefix instead (total order = lexicographic over files+lines),
        so a 10^10-row extract still writes with full parallelism."""
        result = self.crawl()
        ex = result.extracted
        kinds = {s.seed_id: s.extract_kind for s in self.seeds}
        table_seeds = [sid for sid, k in kinds.items() if k == "table"]
        list_seeds = [sid for sid, k in kinds.items() if k == "list"]
        text_seeds = [sid for sid, k in kinds.items() if k in ("text", "identity", "content")]
        parts = []
        if table_seeds:
            parts.append(
                ex.filter(F.col("seed_id").isin(table_seeds) & F.col("row").isNotNull()).select(
                    "seed_id",
                    "instance_index",
                    "pagination_index",
                    "match_index",
                    F.array_join(
                        F.transform("row", lambda c: _csv_quote(c, sep)), sep
                    ).alias("line"),
                )
            )
        if list_seeds:
            parts.append(
                ex.filter(F.col("seed_id").isin(list_seeds) & F.col("text").isNotNull())
                .groupBy("seed_id", "instance_index", "pagination_index")
                .agg(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct("match_index", "text"))),
                            lambda s: _csv_quote(s["text"], sep),
                        ),
                        sep,
                    ).alias("line")
                )
                .withColumn("match_index", F.lit(0))
                .select("seed_id", "instance_index", "pagination_index", "match_index", "line")
            )
        if text_seeds:
            parts.append(
                ex.filter(F.col("seed_id").isin(text_seeds)).select(
                    "seed_id",
                    "instance_index",
                    "pagination_index",
                    "match_index",
                    _csv_quote(F.col("text"), sep).alias("line"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if single_file:
            (
                out.orderBy("seed_id", "instance_index", "pagination_index", "match_index")
                .select("line")
                .coalesce(1)
                .write.mode("overwrite")
                .text(path)
            )
            return
        key = F.format_string(
            "%010d/%012d/%06d/%06d",
            F.col("seed_id"),
            F.col("instance_index"),
            F.col("pagination_index"),
            F.col("match_index"),
        )
        (
            out.select(F.concat(key, F.lit("\t"), F.col("line")).alias("line"))
            .repartitionByRange(
                self.spark.sparkContext.defaultParallelism, F.col("line")
            )
            .sortWithinPartitions("line")
            .write.mode("overwrite")
            .text(path)
        )

    def scrape_to_tsv(self, path: str) -> None:
        self.scrape_to_csv(path, sep="\t")


def _demo() -> None:  # pragma: no cover - manual verification entry
    """Run the flagship golden crawl (reference spec/upton_spec.rb:43-67)
    over the fixture corpus and print the extracted headlines."""
    from upton_spark.plans.session import get_spark
    from upton_spark.sources.fixtures import BASE, fixture_pages

    spark = get_spark("upton_spark_demo", cores=8, shuffle_partitions=8)
    seeds = [
        SeedSpec(
            0,
            seed_url=f"{BASE}/propublica.html",
            index_selector="section#river section h1 a",
            extract_selector="h1.article-title",
            extract_kind="text",
            sleep_time_between_requests=0.0,
        )
    ]
    crawler = Crawler(spark, fixture_pages(spark), seeds)
    for headline in crawler.scrape():
        print(repr(headline))
    crawler.lineage_df().show(truncate=False)


if __name__ == "__main__":  # pragma: no cover
    import sys

    if "--demo" in sys.argv:
        _demo()
