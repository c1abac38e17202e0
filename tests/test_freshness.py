"""Freshness model (Poisson change-rate → staleness → planned admission)
and latency-adaptive politeness — the continuous-re-crawl contracts the
reference's run-once stash model never needed (see
operators/freshness.py's module docstring for the lineage)."""

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from upton_spark.crawler import Crawler, SeedSpec
from upton_spark.operators.freshness import (
    change_rate,
    freshness_priorities,
    staleness_scores,
)
from upton_spark.operators.politeness import adaptive_delays
from upton_spark.operators.robots import robots_rules_df
from upton_spark.sources.fixtures import BASE, fixture_pages
from tests import goldens

OBS_SCHEMA = "url string, ts timestamp, changed int"


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


def test_change_rate_matches_hand_math(spark):
    """λ̂ = -ln((n-X+0.5)/(n+0.5))/Ī against a by-hand computation, plus
    the NULL guards: single observation and zero span are inestimable."""
    obs = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 0, 0, 0), 1),
            ("a", datetime(2024, 1, 1, 2, 0, 0), 0),
            ("a", datetime(2024, 1, 1, 4, 0, 0), 1),
            ("b", datetime(2024, 1, 1, 0, 0, 0), 1),
            ("c", datetime(2024, 1, 1, 0, 0, 0), 1),
            ("c", datetime(2024, 1, 1, 0, 0, 0), 0),
        ],
        OBS_SCHEMA,
    )
    rows = {r["url"]: r for r in change_rate(obs).collect()}
    a = rows["a"]
    assert (a["n_obs"], a["n_changed"]) == (3, 2)
    assert a["span_hours"] == pytest.approx(4.0)
    # n=3, X=2, Ī = 4h/2 = 2h
    expect = -math.log((3 - 2 + 0.5) / (3 + 0.5)) / 2.0
    assert a["lambda_per_hour"] == pytest.approx(expect, rel=1e-12)
    assert rows["b"]["lambda_per_hour"] is None  # n < min_obs
    assert rows["c"]["lambda_per_hour"] is None  # zero span


def test_staleness_explore_arm_and_decay(spark):
    """Estimated pages decay by 1-exp(-λ·age); inestimable pages score
    exactly 1.0 (max-stale — the explore arm), ABOVE any estimated page."""
    obs = spark.createDataFrame(
        [
            ("hot", datetime(2024, 1, 1, 0, 0, 0), 1),
            ("hot", datetime(2024, 1, 2, 0, 0, 0), 1),
            ("cold", datetime(2024, 1, 1, 0, 0, 0), 0),
            ("cold", datetime(2024, 1, 2, 0, 0, 0), 0),
            ("unknown", datetime(2024, 1, 2, 0, 0, 0), 0),
        ],
        OBS_SCHEMA,
    )
    rates = change_rate(obs)
    asof = obs.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0] + 48 * 3600
    sc = {r["url"]: r for r in staleness_scores(rates, asof).collect()}
    lam = -math.log((2 - 2 + 0.5) / (2 + 0.5)) / 24.0
    assert sc["hot"]["staleness"] == pytest.approx(1 - math.exp(-lam * 48), rel=1e-12)
    assert sc["cold"]["staleness"] == 0.0  # X=0 → λ=0 → never stale
    assert sc["unknown"]["staleness"] == 1.0  # inestimable → explore
    assert sc["unknown"]["staleness"] > sc["hot"]["staleness"] > sc["cold"]["staleness"]


def test_freshness_priority_e2e(spark):
    """change_rate wired into a planned crawl the way pagerank/HITS already
    are: the page with the highest measured change rate (→ highest
    staleness) is fetched in its host's FIRST instance round under
    1-token/round politeness — freshness priorities actually steer the
    scheduler, not just score rows."""
    from upton_spark.sources.corpus import synth_pages, synth_seeds

    pages = synth_pages(spark, n_hosts=3, instances_per_host=6, page_size=50).cache()
    seeds = synth_seeds(3, 6, sleep_time=30.0)  # 1 token/host/round

    inst = pages.filter(~F.col("url").contains("index.html")).select("url")
    urls = sorted(r["url"] for r in inst.collect())
    by_host = {}
    for u in urls:
        by_host.setdefault(u.rsplit("/", 1)[0], []).append(u)
    tops = {max(us) for us in by_host.values()}  # the frequently-changing page

    t1, t2 = datetime(2024, 1, 1), datetime(2024, 1, 2)
    obs = spark.createDataFrame(
        [(u, t, 1 if u in tops else 0) for u in urls for t in (t1, t2)],
        OBS_SCHEMA,
    )
    rates = change_rate(obs)
    asof = obs.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0] + 72 * 3600
    prio = freshness_priorities(staleness_scores(rates, asof))

    result = Crawler(
        spark, pages, seeds, round_budget_s=30.0, url_priorities=prio
    ).crawl()

    fr = {r["url"]: r["first_round"] for r in result.urls_seen.collect()}
    for host, us in by_host.items():
        host_first = min(fr[u] for u in us)
        assert fr[max(us)] == host_first, (host, max(us), fr)


def test_adaptive_delays_clamp_and_scale(spark):
    """delay = clamp(2×mean latency, 0.5, 30): a fast host floors at the
    minimum, a pathological one caps, a normal one gets 2×mean."""
    obs = spark.createDataFrame(
        [("fast", 0.1), ("fast", 0.1), ("slow", 20.0), ("slow", 40.0), ("mid", 1.0)],
        "host string, latency_s double",
    )
    d = {r["host"]: r for r in adaptive_delays(obs).collect()}
    assert d["fast"]["crawl_delay"] == 0.5
    assert d["slow"]["crawl_delay"] == 30.0
    assert d["mid"]["crawl_delay"] == pytest.approx(2.0)
    assert d["slow"]["mean_latency_s"] == pytest.approx(30.0)


def test_adaptive_host_delays_throttle_admission(spark, pages):
    """host_delays= is a politeness floor exactly like robots Crawl-delay:
    delay=30 with budget=30 → 1 token/round → the 4 same-host instance
    fetches spread across 4 rounds, extraction order/bytes unchanged."""
    delays = spark.createDataFrame(
        [("www.example.com", 30.0)], "host string, crawl_delay double"
    )
    result = Crawler(
        spark, pages, [basic_seed()], host_delays=delays, round_budget_s=30.0
    ).crawl()
    inst = result.lineage.filter("phase = 'instance'").collect()
    assert len({r["round"] for r in inst}) == 4
    assert sum(r["deferred_by_politeness"] for r in inst) == 3 + 2 + 1
    assert _texts(result) == goldens.HEADLINES


def test_host_delays_merge_with_robots_greatest_wins(spark, pages):
    """Robots Crawl-delay 2s + adaptive 30s → greatest (30) drives the
    token budget: the merge composes sources, it doesn't overwrite."""
    robots = robots_rules_df(
        spark, [("www.example.com", "User-agent: *\nCrawl-delay: 2\n")]
    )
    delays = spark.createDataFrame(
        [("www.example.com", 30.0)], "host string, crawl_delay double"
    )
    result = Crawler(
        spark,
        pages,
        [basic_seed()],
        robots=robots,
        host_delays=delays,
        round_budget_s=30.0,
    ).crawl()
    inst = result.lineage.filter("phase = 'instance'").collect()
    assert len({r["round"] for r in inst}) == 4
    assert _texts(result) == goldens.HEADLINES
