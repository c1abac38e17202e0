"""Snapshot/resume determinism, re-crawl stash semantics, robots gating,
politeness deferral — the engine-side contracts from the north_star that the
reference has no direct specs for."""

import pytest

from upton_spark.crawler import Crawler, KilledCrawl, SeedSpec
from upton_spark.operators.robots import robots_rules_df
from upton_spark.sources.catalog import ManifestCatalog
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


def _texts(result):
    return [
        r["text"]
        for r in result.extracted.orderBy(
            "seed_id", "instance_index", "pagination_index", "match_index"
        ).collect()
    ]


def test_politeness_deferral_spreads_rounds(spark, pages):
    """sleep=30 & budget=30 → 1 token/host/round → the 4 same-host instance
    fetches spread across 4 rounds as deferred-by-politeness lineage."""
    crawler = Crawler(
        spark, pages, [basic_seed(sleep_time_between_requests=30.0)], round_budget_s=30.0
    )
    result = crawler.crawl()
    inst = result.lineage.filter("phase = 'instance'").orderBy("round")
    rows = inst.collect()
    rounds = {r["round"] for r in rows}
    assert len(rounds) == 4
    total_deferred = sum(r["deferred_by_politeness"] for r in rows)
    assert total_deferred == 3 + 2 + 1  # 3 deferred in r0, 2 in r1, 1 in r2
    assert _texts(result) == goldens.HEADLINES  # order unchanged by deferral


def test_kill_and_resume_identical(spark, pages, tmp_path):
    """Kill after the first committed fetch round; resume must produce the
    identical extraction set and URL-seen set (north_star resume rule)."""
    # uninterrupted reference run
    ref = Crawler(
        spark, pages, [basic_seed(sleep_time_between_requests=30.0)], round_budget_s=30.0
    ).crawl()
    ref_texts = _texts(ref)
    ref_seen = sorted(r["url"] for r in ref.urls_seen.collect())

    cat = ManifestCatalog(spark, str(tmp_path / "cat"))
    crawler = Crawler(
        spark,
        pages,
        [basic_seed(sleep_time_between_requests=30.0)],
        round_budget_s=30.0,
        catalog=cat,
    )
    with pytest.raises(KilledCrawl):
        crawler.crawl(stop_after_round=1)
    # fresh crawler (new process semantics), same catalog
    resumed = Crawler(
        spark,
        pages,
        [basic_seed(sleep_time_between_requests=30.0)],
        round_budget_s=30.0,
        catalog=cat,
    ).resume()
    assert _texts(resumed) == ref_texts
    assert sorted(r["url"] for r in resumed.urls_seen.collect()) == ref_seen


def test_recrawl_uses_stash(spark, pages, tmp_path):
    """Second crawl against the same catalog: all instance pages are cache
    hits (0 live fetches), mirroring the reference's stash behavior
    (lib/upton/downloader.rb:70-98)."""
    cat = ManifestCatalog(spark, str(tmp_path / "cat2"))
    first = Crawler(spark, pages, [basic_seed()], catalog=cat).crawl()
    n_live_first = (
        first.lineage.filter("phase='instance'").groupBy().sum("fetched").collect()[0][0]
    )
    assert n_live_first == 4
    second = Crawler(spark, pages, [basic_seed()], catalog=cat).crawl()
    rows = second.lineage.filter("phase='instance'").collect()
    assert sum(r["fetched"] for r in rows) == 0
    assert sum(r["cache_hits"] for r in rows) == 4
    assert _texts(second) == goldens.HEADLINES


def test_robots_gate_blocks_before_fetch(spark, pages):
    """Disallowed instance is never fetched: status=blocked, extraction sees
    an empty body (engine-side rule; reference has no robots support)."""
    robots = robots_rules_df(
        spark, [("www.example.com", "User-agent: *\nDisallow: /prosecutor.html\n")]
    )
    crawler = Crawler(spark, pages, [basic_seed()], robots=robots)
    result = crawler.crawl()
    texts = _texts(result)
    assert texts == [
        "Webinar: How to Use Prescriber Checkup to Power Your Reporting",
        "",
        "",  # prosecutor blocked by robots → empty body → empty extraction
        "Six Facts Lost in the IRS Scandal",
    ]
    statuses = {
        r["url"]: r["status"] for r in result.frontier.collect()
    }
    assert statuses[f"{BASE}/prosecutor.html"] == "blocked"
    blocked_total = result.lineage.groupBy().sum("blocked_by_robots").collect()[0][0]
    assert blocked_total == 1


def test_instance_pagination_hook(spark, pages):
    """next_instance_page_url hook (lib/upton.rb:127-129 override): page 2
    of the search instance is appended while bodies stay non-empty."""

    def next_page(url, k):
        if url == f"{BASE}/propublica_search.html" and k <= 2:
            return f"{BASE}/propublica_search.html?p={k + 1}"
        return ""

    seeds = [
        SeedSpec(
            0,
            url_list=[f"{BASE}/propublica_search.html"],
            extract_selector=".compact-list a.title-link",
            extract_kind="list",
            sleep_time_between_requests=0.0,
        )
    ]
    crawler = Crawler(spark, pages, seeds, next_instance_page_url_fn=next_page)
    docs = crawler.scrape()
    # doc per pagination page: p1 body anchors, then ?p=2 body anchors; the
    # empty ?p=3 body ends the chain (anchor texts verified against the
    # fixture pages directly).
    assert docs[0] == ["Tools & Data ", "Tools and Resources for Reporting the Stimulus "]
    assert docs[1] == ["Chapter 1. Using Google Refine to Clean Messy Data "]
