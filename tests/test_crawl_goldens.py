"""End-to-end crawl goldens — the reference RSpec scenarios
(spec/upton_spec.rb:43-228) replayed through the Spark engine over the
fixture ``pages`` corpus. These are the correctness gate: crawl ordering,
URL-seen set, and byte-identical extracted text."""

import pytest

from upton_spark.crawler import Crawler, SeedSpec
from upton_spark.sources.fixtures import BASE, fixture_pages
from tests import goldens

SLEEP0 = dict(sleep_time_between_requests=0.0)


@pytest.fixture(scope="module")
def pages(spark):
    return fixture_pages(spark).cache()


def test_basic_scrape(spark, pages):
    """'should scrape in the basic case' (spec/upton_spec.rb:43-67)."""
    seeds = [
        SeedSpec(
            0,
            seed_url=f"{BASE}/propublica.html",
            index_selector="section#river section h1 a",
            extract_selector="h1.article-title",
            extract_kind="text",
            **SLEEP0,
        )
    ]
    crawler = Crawler(spark, pages, seeds)
    assert crawler.scrape() == goldens.HEADLINES


def test_relative_urls(spark, pages):
    """'should properly handle relative urls' (spec/upton_spec.rb:69-102)."""
    seeds = [
        SeedSpec(
            0,
            seed_url=f"{BASE}/propublica-relative.html",
            index_selector="section#river h1 a",
            extract_selector="h1.article-title",
            extract_kind="text",
            **SLEEP0,
        )
    ]
    assert Crawler(spark, pages, seeds).scrape() == [
        "A Prosecutor, a Wrongful Conviction and a Question of Justice"
    ]


def test_list_helper(spark, pages):
    """'should scrape a list properly with the list helper'
    (spec/upton_spec.rb:104-117); seed given as explicit URL array."""
    seeds = [
        SeedSpec(
            0,
            url_list=[f"{BASE}/propublica.html"],
            extract_selector="#jamb.wNarrow #most-commented li a",
            extract_kind="list",
            **SLEEP0,
        )
    ]
    assert Crawler(spark, pages, seeds).scrape() == [goldens.MOST_COMMENTED_HEDS]


def test_table_helper(spark, pages):
    """'should scrape a table properly with the table helper'
    (spec/upton_spec.rb:119-133), including the spec's newline
    normalization at :130."""
    seeds = [
        SeedSpec(
            0,
            url_list=[f"{BASE}/easttimor.html"],
            extract_selector=goldens.TABLE_XPATH,
            extract_kind="table",
            **SLEEP0,
        )
    ]
    table = Crawler(spark, pages, seeds).scrape()
    normalized = [[[cell.replace("\n", "") for cell in row] for row in doc] for doc in table]
    assert normalized == [goldens.EAST_TIMOR_PRIME_MINISTERS]


def test_paginated_scrape(spark, pages):
    """'should scrape paginated pages' (spec/upton_spec.rb:139-171):
    p=1,2 yield instances, empty p=3 terminates the chain."""
    seeds = [
        SeedSpec(
            0,
            seed_url=f"{BASE}/propublica_search.html",
            index_selector=".compact-list a.title-link",
            extract_selector="h1.article-title",
            extract_kind="text",
            paginated=True,
            pagination_param="p",
            pagination_max_pages=3,
            **SLEEP0,
        )
    ]
    assert Crawler(spark, pages, seeds).scrape() == goldens.SEARCH_RESULTS


class TestPolitenessCounts:
    """Sleep-count goldens (spec/upton_spec.rb:178-228) re-expressed as
    live-fetch lineage counts: 1 token consumed per live fetch, 0 per
    cache hit."""

    def _index_fetches(self, result):
        return (
            result.lineage.filter("phase = 'index'")
            .groupBy()
            .sum("fetched")
            .collect()[0][0]
            or 0
        )

    def test_one_live_fetch_with_caching_disabled(self, spark, pages):
        seeds = [SeedSpec(0, seed_url=f"{BASE}/", index_selector=".whatever",
                          extract_kind="text", extract_selector=".x",
                          sleep_time_between_requests=1.0)]
        crawler = Crawler(spark, pages, seeds, index_cached=False)
        result = crawler.crawl()
        assert self._index_fetches(result) == 1

    def test_one_live_fetch_when_uncached_with_caching_enabled(self, spark, pages):
        seeds = [SeedSpec(0, seed_url=f"{BASE}/", index_selector=".whatever",
                          extract_kind="text", extract_selector=".x",
                          sleep_time_between_requests=1.0)]
        crawler = Crawler(spark, pages, seeds, index_cached=True)
        result = crawler.crawl()
        assert self._index_fetches(result) == 1

    def test_three_live_fetches_for_paginated_index(self, spark, pages):
        """3 search pages (incl. the empty p=3) → exactly 3 live fetches
        (spec/upton_spec.rb:198-228; selector matches nothing)."""
        seeds = [
            SeedSpec(
                0,
                seed_url=f"{BASE}/propublica_search.html",
                index_selector=".nonexistent",
                extract_selector=".x",
                extract_kind="text",
                paginated=True,
                pagination_param="p",
                pagination_max_pages=3,
                sleep_time_between_requests=1.0,
            )
        ]
        crawler = Crawler(spark, pages, seeds, index_cached=False, instance_cached=False)
        result = crawler.crawl()
        assert self._index_fetches(result) == 3
        assert result.frontier.count() == 0  # no instances matched
