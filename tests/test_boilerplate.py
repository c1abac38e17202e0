"""Main-content extraction (operators.boilerplate): the jusText-style
leaf-block text/link-density classifier — nav/footer/related rails drop,
prose keeps, script/style subtrees never count, nested block wrappers
delegate to their leaf blocks; the Spark aggregate preserves document
order independent of partitioning."""

from pyspark.sql import functions as F

from upton_spark.operators.boilerplate import (
    content_block_stats,
    content_blocks,
    extract_main_content,
    main_content,
)

PAGE = """<html><head><title>T</title><style>p{color:red}</style></head><body>
<nav><a href='/'>Home</a> <a href='/a'>About</a> <a href='/c'>Contact</a></nav>
<div><div><p>This is the long main article paragraph with plenty of prose in it.</p>
<p>short</p>
<p>Another substantial paragraph of genuine article text for the corpus. See <a href='/ref'>a reference</a>.</p></div></div>
<div><a href='/1'>related one two three</a> and</div>
<footer><a href='/terms'>Terms</a> (c) example</footer>
<script>var x = "<p>not a block</p>";</script>
</body></html>"""


def test_classifier_goldens():
    blocks = content_blocks(PAGE)
    by_tag = [(b[1], b[5]) for b in blocks]
    assert by_tag == [
        ("nav", False),       # 3 links, link density ~0.89
        ("p", True),          # long prose
        ("p", False),         # too short
        ("p", True),          # prose with ONE inline link (density ~0.13)
        ("div", False),       # related rail, density 0.84
        ("footer", False),    # link-dense and short
    ]
    # script contents never became a block; nested divs delegated to <p>s
    assert all("not a block" not in b[2] for b in blocks)
    assert main_content(PAGE) == (
        "This is the long main article paragraph with plenty of prose in it.\n"
        "Another substantial paragraph of genuine article text for the "
        "corpus. See a reference."
    )


def test_link_density_is_exact_micro_integer():
    blocks = content_blocks("<div><a href='/x'>abcde</a> fghij</div>", min_chars=1)
    # text 'abcde fghij' = 11 chars, link text 'abcde' = 5 -> 454545 micro
    assert blocks == [(0, "div", "abcde fghij", 11, 454545, False)]
    kept = content_blocks("<p>abcde fghij</p>", min_chars=1)
    assert kept[0][4] == 0 and kept[0][5] is True


def test_spark_extract_main_content_order_and_partitioning(spark):
    rows = [("u0", PAGE), ("u1", "<p></p>")]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {r["url"]: r for r in extract_main_content(df).collect()}
    assert out["u0"]["n_blocks"] == 6 and out["u0"]["n_kept"] == 2
    assert out["u0"]["content"] == main_content(PAGE)
    assert out["u1"]["n_kept"] == 0 and out["u1"]["content"] == ""
    # partitioning-independent content order (the sort_array pin)
    out7 = {
        r["url"]: r["content"]
        for r in extract_main_content(df.repartition(7)).collect()
    }
    assert out7["u0"] == out["u0"]["content"]
    # block stats expose the evidence
    stats = content_block_stats(df).filter(F.col("url") == "u0").collect()
    assert len(stats) == 6
    assert sum(r["kept"] for r in stats) == 2


def test_binary_html_column_decodes(spark):
    df = spark.createDataFrame(
        [("u0", PAGE.encode("utf-8"))], "url string, html binary"
    )
    out = extract_main_content(df).collect()[0]
    assert out["content"] == main_content(PAGE)


def test_crawl_with_content_kind_is_selector_free(spark):
    """extract_kind='content': a crawl with NO extract selector returns
    each instance page's main content (boilerplate removed) — the
    training-data path. Must equal the pure-function replay on the same
    fixture bytes, and scrape() returns the strings."""
    from upton_spark.crawler import Crawler, SeedSpec
    from upton_spark.sources.fixtures import BASE, fixture_pages

    pages = fixture_pages(spark)
    seed = SeedSpec(
        0,
        seed_url=f"{BASE}/propublica.html",
        index_selector="section#river section h1 a",
        extract_kind="content",
        sleep_time_between_requests=0.0,
    )
    crawler = Crawler(spark, pages, [seed])
    result = crawler.crawl()
    got = {
        r["url"]: r["text"]
        for r in result.extracted.select("url", "text").collect()
    }
    raw = {
        r["url"]: bytes(r["html"])
        for r in pages.select("url", "html").collect()
        if r["url"] in got
    }
    from upton_spark.html.dom import decode_html_bytes

    assert len(got) == 4
    for url, text in got.items():
        assert text == main_content(decode_html_bytes(raw[url])), url
        assert len(text) > 100  # real prose survived the classifier
    docs = Crawler(spark, pages, [seed]).scrape()
    assert sorted(docs) == sorted(got.values())
