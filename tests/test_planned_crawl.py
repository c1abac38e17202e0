"""Crawl-planning inputs wired INTO the Crawler: per-URL priorities
(PageRank scores), per-host budget allocation, and the blocklist admission
gate — composed by one constructor call, the way the reference's `scrape`
composes its pieces (lib/upton.rb:47-51). Lineage/seen-set round numbers
prove the scheduler honored each input; one-shot/loop bit-equivalence is
re-pinned under planning inputs.
"""

import pytest
from pyspark.sql import functions as F

from upton_spark.crawler import Crawler, SeedSpec
from upton_spark.sources.fixtures import BASE, fixture_pages
from tests import goldens


@pytest.fixture(scope="module")
def pages(spark):
    return fixture_pages(spark).cache()


def basic_seed(**kw):
    defaults = dict(
        seed_url=f"{BASE}/propublica.html",
        index_selector="section#river section h1 a",
        extract_selector="h1.article-title",
        extract_kind="text",
        sleep_time_between_requests=0.0,
    )
    defaults.update(kw)
    return SeedSpec(0, **defaults)


def _first_rounds(result):
    return {r["url"]: r["first_round"] for r in result.urls_seen.collect()}


def test_url_priorities_reorder_admission(spark, pages):
    """1 token/host/round: the DOM-last instance given priority 0 fetches
    in round 0 while the DOM-first instances (unranked -> after every
    ranked url) defer behind it. Extraction output is ORDER-INVARIANT
    (instance_index ordering), so the goldens still hold."""
    # DOM order of the propublica fixture instances is HEADLINES order;
    # promote the webinar instance (DOM position 2) to the front
    prio = spark.createDataFrame(
        [(f"{BASE}/webinar.html", 0)], "url string, priority long"
    )
    crawler = Crawler(
        spark,
        pages,
        [basic_seed(sleep_time_between_requests=30.0)],
        round_budget_s=30.0,
        url_priorities=prio,
    )
    result = crawler.crawl()
    fr = _first_rounds(result)
    assert fr[f"{BASE}/webinar.html"] == 0
    # the three unranked instances fill rounds 1..3 in DOM order
    unranked = {u: r for u, r in fr.items() if u != f"{BASE}/webinar.html" and "propublica" not in u}
    assert sorted(unranked.values()) == [1, 2, 3]
    texts = [
        r["text"]
        for r in result.extracted.orderBy("instance_index", "match_index").collect()
    ]
    assert texts == goldens.HEADLINES


def test_host_budget_caps_tokens_per_round(spark, pages):
    """sleep=0 would fetch every instance in round 0; a host budget of 1
    (allocate_budget's per-round token quota) spreads the 4 instances
    across 4 rounds with deferred-by-politeness lineage."""
    budgets = spark.createDataFrame(
        [("www.example.com", 1)], "host string, budget long"
    )
    crawler = Crawler(spark, pages, [basic_seed()], host_budgets=budgets)
    result = crawler.crawl()
    inst = result.lineage.filter("phase = 'instance'").collect()
    assert len({r["round"] for r in inst}) == 4
    assert sum(r["deferred_by_politeness"] for r in inst) == 3 + 2 + 1
    # hosts without a budget row are uncapped: same crawl minus the table
    free = Crawler(spark, pages, [basic_seed()]).crawl()
    assert len({r["round"] for r in free.lineage.filter("phase='instance'").collect()}) == 1


def test_budget_tightens_never_loosens_sleep_tokens(spark, pages):
    """host_tokens = least(sleep tokens, budget): a generous budget cannot
    override the politeness sleep (tokens stay 1), and lineage matches the
    budget-less politeness run exactly."""
    budgets = spark.createDataFrame(
        [("www.example.com", 50)], "host string, budget long"
    )
    with_b = Crawler(
        spark, pages, [basic_seed(sleep_time_between_requests=30.0)],
        round_budget_s=30.0, host_budgets=budgets, clock="2024-03-01 12:00:00",
    ).crawl()
    without = Crawler(
        spark, pages, [basic_seed(sleep_time_between_requests=30.0)],
        round_budget_s=30.0, clock="2024-03-01 12:00:00",
    ).crawl()
    key = lambda res: sorted(tuple(r) for r in res.lineage.collect())  # noqa: E731
    assert key(with_b) == key(without)


def test_blocklist_blocks_beside_robots_gate(spark, pages):
    """A url-pattern blocklist hit goes terminal status='blocked' (same
    path and lineage count as a robots Disallow) and is never fetched or
    extracted."""
    crawler = Crawler(
        spark, pages, [basic_seed()],
        blocklist_url_patterns=[r".*prosecutor.*"],
    )
    result = crawler.crawl()
    statuses = {r["url"]: r["status"] for r in result.frontier.collect()}
    assert statuses[f"{BASE}/prosecutor.html"] == "blocked"
    # blocked rows keep the reference's empty-body encoding in extraction
    # (lib/upton.rb:35) — body never attached, text ''
    texts = {r["url"]: r["text"] for r in result.extracted.collect()}
    assert texts[f"{BASE}/prosecutor.html"] == ""
    assert texts[f"{BASE}/webinar.html"] != ""
    blocked = result.lineage.agg(F.sum("blocked_by_robots").alias("b")).first()["b"]
    assert blocked == 1


def test_blocklist_host_table_blocks_whole_host(spark, pages):
    """A host-table blocklist entry blocks every instance of the host —
    the whole frontier goes 'blocked', nothing extracts."""
    bl = spark.createDataFrame([("www.example.com",)], "host string")
    result = Crawler(
        spark, pages, [basic_seed()], blocklist_hosts=bl
    ).crawl()
    assert {r["status"] for r in result.frontier.collect()} == {"blocked"}
    # rows survive in extracted only as the reference's empty-body encoding
    assert {r["text"] for r in result.extracted.collect()} == {""}


def test_planned_crawl_oneshot_matches_loop(spark, pages, monkeypatch):
    """Bit-equivalence of the closed-form schedule and the round loop under
    ALL THREE planning inputs at once — priorities and budgets are uniform
    per host / static per url, so one-shot eligibility is preserved."""
    prio = spark.createDataFrame(
        [(f"{BASE}/webinar.html", 0), (f"{BASE}/discussion.html", 1)],
        "url string, priority long",
    )
    budgets = spark.createDataFrame(
        [("www.example.com", 2)], "host string, budget long"
    )

    def run(force_loop):
        with monkeypatch.context() as m:
            if force_loop:
                m.setattr(Crawler, "_oneshot_eligible", lambda self, s: False)
            c = Crawler(
                spark, pages, [basic_seed()],
                url_priorities=prio, host_budgets=budgets,
                blocklist_url_patterns=[r".*prosecutor.*"],
                clock="2024-03-01 12:00:00",
            )
            assert c._oneshot_eligible(None) is not force_loop
            res = c.crawl()
            return (
                sorted((r["url"], r["status"], r["attempts"]) for r in res.frontier.collect()),
                sorted((r["url"], r["first_round"], str(r["fetched_at"]))
                       for r in res.urls_seen.collect()),
                sorted(tuple(r) for r in res.lineage.collect()),
                sorted((r["url"], r["text"]) for r in res.extracted.collect()),
            )

    assert run(force_loop=False) == run(force_loop=True)


def test_pagerank_priority_and_budget_e2e(spark):
    """The VERDICT-r3 composition bar: crawl the synthetic corpus under a
    PageRank-derived priority and an allocate_budget host quota, lineage
    proving both were honored — one constructor call, no hand-assembly."""
    from upton_spark.operators.webgraph import (
        allocate_budget,
        pagerank,
        pagerank_priorities,
    )
    from upton_spark.sources.corpus import synth_pages, synth_seeds

    pages = synth_pages(spark, n_hosts=3, instances_per_host=6, page_size=50).cache()
    seeds = synth_seeds(3, 6, sleep_time=30.0)  # 1 token/host/round

    # rank instance urls by a deterministic synthetic link graph: url i on a
    # host is linked by urls (i+1..n-1) -> later instances outrank earlier
    inst = pages.filter(~F.col("url").endswith("index.html")).select("url")
    inst = inst.withColumn("host", F.parse_url("url", F.lit("HOST")))
    edges = (
        inst.alias("a")
        .join(inst.alias("b"), F.col("a.host") == F.col("b.host"))
        .filter(F.col("a.url") < F.col("b.url"))
        .select(F.col("a.url").alias("src"), F.col("b.url").alias("dst"))
    )
    nodes = inst.select(F.col("url").alias("doc_id"))
    ranks = pagerank(nodes, edges, iters=3)
    prio = pagerank_priorities(ranks, key_col="doc_id")

    budgets = allocate_budget(
        inst.groupBy("host").agg(F.count("*").alias("n_docs")),
        total_budget=6, floor=1, cap=2,
    )

    result = Crawler(
        spark, pages, seeds, round_budget_s=30.0,
        url_priorities=prio,
        host_budgets=budgets.select("host", "budget"),
    ).crawl()

    # every host's LAST instance url (most in-links -> top rank) must be
    # fetched in its host's first instance round; with sleep tokens =1 and
    # budget >=1, tokens stay 1 -> rounds spread
    fr = {r["url"]: r["first_round"] for r in result.urls_seen.collect()}
    inst_rows = [u for u in fr if not u.endswith("index.html")]
    by_host = {}
    for u in inst_rows:
        by_host.setdefault(u.rsplit("/", 1)[0], []).append(u)
    for host, urls in by_host.items():
        top = max(urls)  # lexicographically-last = most inbound links
        host_first = min(fr[u] for u in urls)
        assert fr[top] == host_first, (host, top, fr)
    # budget honored: no round fetched more rows on a host than its tokens
    # (sleep gives 1/round; budget >= 1 keeps it 1) -> per-round fetched
    # count across 3 hosts is <= 3
    inst_lineage = result.lineage.filter("phase = 'instance'").collect()
    per_round = {}
    for r in inst_lineage:
        per_round[r["round"]] = per_round.get(r["round"], 0) + r["fetched"]
    assert all(v <= 3 for v in per_round.values())
    assert len(per_round) >= 6  # 6 instances/host at 1 token -> >=6 rounds


def test_hits_authority_priority_e2e(spark):
    """HITS wired into planned crawls the way PageRank already is (VERDICT
    r4 #6): authority scores from the link graph → authority_priorities →
    Crawler(url_priorities=...), lineage proving the top-authority instance
    page on every host is fetched in that host's first instance round."""
    from upton_spark.operators.webgraph import authority_priorities, hits
    from upton_spark.sources.corpus import synth_pages, synth_seeds

    pages = synth_pages(spark, n_hosts=3, instances_per_host=6, page_size=50).cache()
    seeds = synth_seeds(3, 6, sleep_time=30.0)  # 1 token/host/round

    # same deterministic graph as the pagerank e2e: url i is linked by all
    # earlier urls on its host -> the lexicographically-last instance has
    # the most in-links -> the highest authority (in-flow of hub scores)
    inst = pages.filter(~F.col("url").endswith("index.html")).select("url")
    inst = inst.withColumn("host", F.parse_url("url", F.lit("HOST")))
    edges = (
        inst.alias("a")
        .join(inst.alias("b"), F.col("a.host") == F.col("b.host"))
        .filter(F.col("a.url") < F.col("b.url"))
        .select(F.col("a.url").alias("src"), F.col("b.url").alias("dst"))
    )
    nodes = inst.select(F.col("url").alias("doc_id"))
    scores = hits(nodes, edges, iters=3)
    prio = authority_priorities(scores, key_col="doc_id")

    result = Crawler(
        spark, pages, seeds, round_budget_s=30.0, url_priorities=prio
    ).crawl()

    fr = {r["url"]: r["first_round"] for r in result.urls_seen.collect()}
    inst_rows = [u for u in fr if not u.endswith("index.html")]
    by_host = {}
    for u in inst_rows:
        by_host.setdefault(u.rsplit("/", 1)[0], []).append(u)
    for host, urls in by_host.items():
        top = max(urls)  # most in-links -> top authority
        host_first = min(fr[u] for u in urls)
        assert fr[top] == host_first, (host, top, fr)
    # 1 token/host/round and 6 instances -> the priority actually spread
    # fetches across >=6 instance rounds (not one bulk round)
    inst_lineage = result.lineage.filter("phase = 'instance'").collect()
    assert len({r["round"] for r in inst_lineage}) >= 6


def test_planned_crawl_kill_and_resume_identical(spark, pages, tmp_path):
    """Planning inputs survive kill/resume: a prioritized, budget-capped
    crawl killed mid-rounds resumes to the identical extraction, seen-set
    (incl. per-url first_round — priority order preserved across the
    snapshot boundary), and frontier statuses as an uninterrupted run."""
    import pytest as _pytest

    from upton_spark.crawler import KilledCrawl
    from upton_spark.sources.catalog import ManifestCatalog

    prio = spark.createDataFrame(
        [(f"{BASE}/webinar.html", 0), (f"{BASE}/sixfacts.html", 1)],
        "url string, priority long",
    )
    budgets = spark.createDataFrame(
        [("www.example.com", 1)], "host string, budget long"
    )

    def mk(catalog=None):
        return Crawler(
            spark, pages, [basic_seed()],
            url_priorities=prio, host_budgets=budgets,
            catalog=catalog, clock="2024-03-01 12:00:00",
        )

    ref = mk().crawl()
    ref_key = (
        sorted((r["url"], r["text"]) for r in ref.extracted.collect()),
        sorted((r["url"], r["first_round"]) for r in ref.urls_seen.collect()),
        sorted((r["url"], r["status"]) for r in ref.frontier.collect()),
    )
    # priority honored in the reference run: webinar first, sixfacts second
    fr = dict(ref_key[1])
    assert fr[f"{BASE}/webinar.html"] == 0
    assert fr[f"{BASE}/sixfacts.html"] == 1

    cat = ManifestCatalog(spark, str(tmp_path / "cat"))
    with _pytest.raises(KilledCrawl):
        mk(cat).crawl(stop_after_round=1)
    resumed = mk(cat).resume()
    got_key = (
        sorted((r["url"], r["text"]) for r in resumed.extracted.collect()),
        sorted((r["url"], r["first_round"]) for r in resumed.urls_seen.collect()),
        sorted((r["url"], r["status"]) for r in resumed.frontier.collect()),
    )
    assert got_key == ref_key


def test_sitemap_priority_e2e(spark):
    """Publisher-declared sitemap priorities wired into planned crawls the
    way PageRank/HITS already are: per-host sitemap.xml captures →
    sitemap_entries → sitemap_priorities → Crawler(url_priorities=...),
    lineage proving the url each SITE marked priority=0.9 is fetched in
    that host's first instance round (everything else defaults to the
    protocol's 0.5 → fetches later)."""
    from datetime import datetime

    from upton_spark.sources.corpus import host_name, host_sizes, synth_pages, synth_seeds
    from upton_spark.sources.sitemap import sitemap_entries, sitemap_priorities

    sizes = host_sizes(3, 6)
    # each host's sitemap promotes its LAST instance (DOM/default order
    # would fetch it last) and leaves the rest at the 0.5 default
    t0 = datetime(2024, 1, 1)
    rows = []
    for h, n in enumerate(sizes):
        entries = "".join(
            f"<url><loc>http://{host_name(h)}/article_{i}.html</loc>"
            + (f"<priority>0.9</priority>" if i == n - 1 else "")
            + "</url>"
            for i in range(n)
        )
        rows.append(
            (
                f"http://{host_name(h)}/sitemap.xml",
                t0,
                f"<urlset>{entries}</urlset>".encode(),
                None,
                None,
            )
        )
    sitemaps = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    pages = synth_pages(spark, n_hosts=3, instances_per_host=6, page_size=50)
    pages = pages.unionByName(sitemaps).cache()

    prio = sitemap_priorities(sitemap_entries(sitemaps))
    result = Crawler(
        spark,
        pages,
        synth_seeds(3, 6, sleep_time=30.0),  # 1 token/host/round
        round_budget_s=30.0,
        url_priorities=prio,
    ).crawl()

    fr = {r["url"]: r["first_round"] for r in result.urls_seen.collect()}
    for h, n in enumerate(sizes):
        urls = [f"http://{host_name(h)}/article_{i}.html" for i in range(n)]
        top = urls[n - 1]
        host_first = min(fr[u] for u in urls)
        assert fr[top] == host_first, (h, top, {u: fr[u] for u in urls})
        # 1 token/host/round spread the remaining instances across rounds
        assert len({fr[u] for u in urls}) == n


def test_redirect_map_rewrites_before_admission(spark):
    """A known redirect table (resolve_redirects output) wired into the
    Crawler rewrites frontier urls to their final targets BEFORE the
    seen-set / admission: the hop url never enters urls_seen, the final
    page's content is what gets extracted for that instance slot, and
    unresolved (cyclic) map rows leave their url untouched."""
    from upton_spark.operators.webgraph import resolve_redirects
    from upton_spark.sources.corpus import host_name, synth_pages, synth_seeds

    pages = synth_pages(spark, n_hosts=2, instances_per_host=4, page_size=50).cache()
    h0 = host_name(0)
    hop, final = f"http://{h0}/article_1.html", f"http://{h0}/article_2.html"
    cyclic = f"http://{h0}/article_3.html"
    edges = spark.createDataFrame(
        [(hop, final), (cyclic, cyclic)], "src string, dst string"
    )
    rmap = resolve_redirects(edges).select("src", "final_url")

    result = Crawler(
        spark, pages, synth_seeds(2, 4), redirect_map=rmap
    ).crawl()
    seen = {r["url"] for r in result.urls_seen.collect()}
    assert hop not in seen  # rewritten before the seen-set
    assert final in seen
    assert cyclic in seen  # unresolved row -> original url kept

    rows = result.extracted.filter(F.col("url") == final).collect()
    # instance slots 1 AND 2 both land on the final page's content
    assert len(rows) == 2
    assert all(r["text"].startswith("Article 0-2:") for r in rows)
    assert not result.extracted.filter(F.col("url") == hop).count()


def test_block_traps_gates_pathological_urls(spark, pages):
    """block_traps=True runs the url_trap_scores heuristics in the
    blocklist admission slot: a loop-path url goes terminal
    status='blocked' (reference empty-body encoding, never fetched, no
    retry burn) while normal urls crawl untouched; flag off, the same url
    is attempted like any other frontier row."""
    trap = f"{BASE}/x/x/x/x/x/loop.html"
    seeds = [
        SeedSpec(
            0,
            url_list=[trap, f"{BASE}/webinar.html"],
            extract_selector="h1.article-title",
            extract_kind="text",
        )
    ]
    result = Crawler(spark, pages, seeds, block_traps=True).crawl()
    statuses = {r["url"]: r["status"] for r in result.frontier.collect()}
    assert statuses[trap] == "blocked"
    texts = {r["url"]: r["text"] for r in result.extracted.collect()}
    assert texts[trap] == ""
    assert texts[f"{BASE}/webinar.html"] != ""
    # flag off: the trap url is admitted (and fails on the missing body
    # like any other dead url), never silently dropped
    free = Crawler(spark, pages, seeds).crawl()
    free_statuses = {r["url"]: r["status"] for r in free.frontier.collect()}
    assert free_statuses[trap] != "blocked"
