"""WARC ingestion (ISO 28500 subset) and distributed robots-from-corpus
parsing — the web-scale source formats feeding the ``pages`` table."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from upton_spark.sources.fixtures import BASE, fixture_pages, fixture_rows
from upton_spark.sources.warc import (
    iter_warc_records,
    pages_rows_from_warc,
    read_warc,
    write_warc,
)


class TestWarc:
    @pytest.mark.parametrize("suffix", [".warc", ".warc.gz"])
    def test_round_trip_local(self, tmp_path, suffix):
        rows = [
            ("http://a.example/x.html", datetime(2024, 3, 1, 12, 0, 0), b"<h1>A</h1>"),
            ("http://b.example/y.html", None, b""),
            ("http://c.example/z.html", datetime(2023, 1, 2, 3, 4, 5), "é".encode()),
        ]
        path = str(tmp_path / f"t{suffix}")
        write_warc(rows, path)
        got = list(pages_rows_from_warc(path))
        assert [(u, h) for u, _, h, _, _ in got] == [(u, h) for u, _, h in rows]
        assert got[0][1] == datetime(2024, 3, 1, 12, 0, 0)

    def test_read_warc_distributed_matches_fixture_corpus(self, spark, tmp_path):
        """Fixture corpus → two WARC archives → read_warc: byte-identical
        html per url vs the in-memory pages table."""
        rows = [(u, ts, html) for (u, ts, html, _, _) in fixture_rows()]
        p1, p2 = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc")
        write_warc(rows[:6], p1)
        write_warc(rows[6:], p2)
        got = {
            r["url"]: (r["warc_ts"], bytes(r["html"]))
            for r in read_warc(spark, [p1, p2]).collect()
        }
        want = {u: (ts, html) for u, ts, html in rows}
        assert got == want

    def test_crawl_over_warc_ingested_corpus(self, spark, tmp_path):
        """End-to-end: the flagship golden crawl runs unchanged over a
        WARC-ingested corpus (extraction byte-identical)."""
        from upton_spark.crawler import Crawler, SeedSpec
        from tests import goldens

        path = str(tmp_path / "corpus.warc.gz")
        write_warc([(u, ts, h) for (u, ts, h, _, _) in fixture_rows()], path)
        pages = read_warc(spark, [path])
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
        result = Crawler(spark, pages, seeds).crawl()
        texts = [
            r["text"]
            for r in result.extracted.orderBy("instance_index").collect()
        ]
        assert texts == goldens.HEADLINES

    def test_non_page_records_skipped(self, tmp_path):
        """warcinfo/request records (no page payload) are skipped."""
        path = str(tmp_path / "meta.warc")
        info = b"software: test\r\n"
        rec = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: "
            + str(len(info)).encode()
            + b"\r\n\r\n"
            + info
            + b"\r\n\r\n"
        )
        with open(path, "wb") as f:
            f.write(rec)
        write_warc([("http://x/y", None, b"<p>hi</p>")], str(tmp_path / "p.warc"))
        with open(str(tmp_path / "p.warc"), "rb") as f:
            rec2 = f.read()
        with open(path, "ab") as f:
            f.write(rec2)
        rows = list(pages_rows_from_warc(path))
        assert len(rows) == 1 and rows[0][0] == "http://x/y"
        with open(path, "rb") as f:
            assert len(list(iter_warc_records(f))) == 2


class TestRobotsFromPages:
    def test_matches_driver_side_parse_and_gates_crawl(self, spark):
        """robots_from_pages (distributed, dedup-latest per host) must equal
        the driver-side parser on the same bodies, and feed RobotsGate
        end-to-end: a Disallow carried IN the corpus blocks the fetch."""
        from upton_spark import schemas
        from upton_spark.crawler import Crawler, SeedSpec
        from upton_spark.operators.robots import (
            robots_from_pages,
            robots_rules_df,
        )

        body_new = "User-agent: *\nDisallow: /prosecutor.html\nCrawl-delay: 2\n"
        body_old = "User-agent: *\nDisallow: /everything\n"
        robots_rows = [
            (f"{BASE}/robots.txt", datetime(2014, 1, 1), body_new.encode(), None, None),
            # older capture must lose dedup-latest
            (f"{BASE}/robots.txt", datetime(2010, 1, 1), body_old.encode(), None, None),
        ]
        pages = fixture_pages(spark).unionByName(
            spark.createDataFrame(robots_rows, schema=schemas.PAGES)
        )
        rules = robots_from_pages(pages)
        got = sorted(tuple(r) for r in rules.collect())
        want = sorted(
            tuple(r)
            for r in robots_rules_df(spark, [("www.example.com", body_new)]).collect()
        )
        assert got == want

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
        result = Crawler(spark, pages, seeds, robots=rules).crawl()
        statuses = {r["url"]: r["status"] for r in result.frontier.collect()}
        assert statuses[f"{BASE}/prosecutor.html"] == "blocked"

    def test_non_root_robots_capture_is_not_authoritative(self, spark):
        """A capture at /user/robots.txt must NOT supply (or, being newer,
        shadow) the host's root rules — only the parsed path exactly
        '/robots.txt' is the authoritative REP location."""
        from upton_spark import schemas
        from upton_spark.operators.robots import (
            robots_from_pages,
            sitemaps_from_robots,
        )

        root = "User-agent: *\nDisallow: /real/\nSitemap: http://h.example/s.xml\n"
        fake = "User-agent: *\nDisallow: /\nSitemap: http://evil.example/s.xml\n"
        rows = [
            ("http://h.example/robots.txt", datetime(2012, 1, 1), root.encode(), None, None),
            # newer but nested — would win dedup-latest under a suffix match
            ("http://h.example/user/robots.txt", datetime(2020, 1, 1), fake.encode(), None, None),
            ("http://only-nested.example/a/robots.txt", datetime(2020, 1, 1), fake.encode(), None, None),
        ]
        pages = spark.createDataFrame(rows, schema=schemas.PAGES)
        rules = robots_from_pages(pages).collect()
        hosts = {r["host"] for r in rules}
        assert hosts == {"h.example"}  # nested-only host contributes nothing
        assert {r["path_prefix"] for r in rules if r["rule_type"] == "disallow"} == {"/real/"}
        maps = sitemaps_from_robots(pages).collect()
        assert [(r["host"], r["sitemap_url"]) for r in maps] == [
            ("h.example", "http://h.example/s.xml")
        ]


def test_sitemaps_from_robots_directive_extraction(spark):
    """Sitemap: directives (any case/indent) extracted per host from the
    corpus's robots.txt captures; commented lines and non-robots pages
    ignored; latest capture wins."""
    import datetime

    from upton_spark.operators.robots import sitemaps_from_robots

    old = b"Sitemap: http://h0.x/old.xml\n"
    new = (
        b"User-agent: *\nDisallow: /private\n"
        b"Sitemap: http://h0.x/sitemap.xml\n"
        b" sitemap : http://h0.x/sitemap2.xml.gz\n"
        b"# Sitemap: http://h0.x/commented.xml\n"
    )
    rows = [
        ("http://h0.x/robots.txt", datetime.datetime(2023, 1, 1), old, "", "en"),
        ("http://h0.x/robots.txt", datetime.datetime(2024, 1, 1), new, "", "en"),
        ("http://h1.x/robots.txt", datetime.datetime(2024, 1, 1), b"User-agent: *\nAllow: /", "", "en"),
        ("http://h0.x/page.html", datetime.datetime(2024, 1, 1), b"Sitemap: http://nope.x/s.xml", "", "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    got = sorted(
        (r["host"], r["sitemap_url"]) for r in sitemaps_from_robots(df).collect()
    )
    assert got == [
        ("h0.x", "http://h0.x/sitemap.xml"),
        ("h0.x", "http://h0.x/sitemap2.xml.gz"),
    ]


def test_wet_round_trip_and_pipeline(spark, tmp_path):
    """WET write -> distributed read round-trips (url, ts, text) including
    unicode and empty text; and the html->extract->WET->read pipeline
    carries the engine's extraction output in Common Crawl's text format."""
    from datetime import datetime

    from upton_spark.sources.warc import read_wet, write_wet

    rows = [
        ("http://a.com/1", datetime(2024, 3, 1, 12, 0, 0), "plain text body"),
        ("http://a.com/2", datetime(2024, 3, 2, 0, 0, 0), "unicode é中文 text\nwith newline"),
        ("http://b.com/3", datetime(2024, 3, 3, 6, 30, 0), ""),
    ]
    p = str(tmp_path / "x.wet.gz")
    write_wet(rows, p)
    got = sorted(map(tuple, read_wet(spark, p).collect()))
    assert got == sorted(rows)

    # pipeline: extraction output of the fixture crawl shipped as WET
    from upton_spark.crawler import Crawler
    from upton_spark.sources.fixtures import fixture_pages
    from tests.test_resume_and_gates import basic_seed

    res = Crawler(spark, fixture_pages(spark), [basic_seed()], clock="2024-03-01 12:00:00").crawl()
    ext = [
        (r["url"], datetime(2024, 3, 1, 12, 0, 0), r["text"])
        for r in res.extracted.orderBy("instance_index").collect()
    ]
    p2 = str(tmp_path / "extracted.wet")
    write_wet(ext, p2)
    back = read_wet(spark, p2)
    assert back.count() == len(ext)
    texts = {r["text"] for r in back.collect()}
    assert "Six Facts Lost in the IRS Scandal" in texts


def test_wat_round_trip_and_from_pages(spark, tmp_path):
    """WAT write -> distributed read round-trips (url, ts, links) incl.
    NULL hrefs/anchors and empty link lists; wat_from_pages generates the
    same link structs the anchor extraction UDF produces over real
    fixture html; malformed JSON payloads parse to empty links, never a
    task abort."""
    from datetime import datetime

    from upton_spark.sources.warc import (
        read_wat,
        wat_from_pages,
        wat_rows_from_file,
        write_wat,
    )

    rows = [
        (
            "http://a.com/1",
            datetime(2024, 3, 1, 12, 0, 0),
            [("http://a.com/x", "anchor x"), (None, "bare"), ("http://a.com/y", None)],
        ),
        ("http://a.com/2", datetime(2024, 3, 2, 0, 0, 0), []),
    ]
    p = str(tmp_path / "x.wat.gz")
    write_wat(rows, p)
    got = {
        r["url"]: [(l["href"], l["anchor"]) for l in r["links"]]
        for r in read_wat(spark, p).collect()
    }
    assert got["http://a.com/1"] == rows[0][2]
    assert got["http://a.com/2"] == []

    # generation side: fixture pages -> WAT rows == the anchors UDF output
    from upton_spark.functions.udfs import extract_anchors_udf
    from upton_spark.sources.fixtures import fixture_pages
    from pyspark.sql import functions as F

    pages = fixture_pages(spark)
    wat = wat_from_pages(pages, selector="a")
    direct = pages.select(
        "url",
        extract_anchors_udf(F.col("html"), F.lit("a"), F.col("url")).alias("links"),
    )
    a = {r["url"]: r["links"] for r in wat.collect()}
    b = {r["url"]: r["links"] for r in direct.collect()}
    assert a == b
    assert any(len(v) > 0 for v in a.values())

    # full cycle: generated WAT file reads back with identical links
    gen = [
        (r["url"], datetime(2024, 3, 1), [(l["href"], l["anchor"]) for l in r["links"]])
        for r in wat.collect()
    ]
    p2 = str(tmp_path / "gen.wat")
    write_wat(gen, p2)
    back = {
        r["url"]: [(l["href"], l["anchor"]) for l in r["links"]]
        for r in read_wat(spark, p2).collect()
    }
    assert back == {u: ls for u, _ts, ls in gen}

    # malformed payloads -> empty links row, stream keeps going: broken
    # JSON, and VALID JSON whose Links field is null / not a list
    body = b"not json {"
    head = (
        "WARC/1.0\r\nWARC-Type: metadata\r\n"
        "WARC-Target-URI: http://bad.com/\r\n"
        "WARC-Date: 2024-03-01T00:00:00Z\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    p3 = str(tmp_path / "bad.wat")
    with open(p3, "wb") as f:
        f.write(head + body + b"\r\n\r\n")
    assert list(wat_rows_from_file(p3))[0][2] == []
    for i, payload in enumerate([
        b'{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":'
        b'{"HTML-Metadata":{"Links":null}}}}}',
        b'{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":'
        b'{"HTML-Metadata":{"Links":"nope"}}}}}',
        b'{"Envelope":null}',
    ]):
        pbad = str(tmp_path / f"bad{i}.wat")
        head_i = (
            "WARC/1.0\r\nWARC-Type: metadata\r\n"
            "WARC-Target-URI: http://bad.com/\r\n"
            "WARC-Date: 2024-03-01T00:00:00Z\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        with open(pbad, "wb") as f:
            f.write(head_i + payload + b"\r\n\r\n")
        assert list(wat_rows_from_file(pbad))[0][2] == []
