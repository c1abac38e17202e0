"""Web-graph / crawl-planning operator tests: PageRank vs a numpy power
iteration, canonical-URL cases, snapshot diff, budget allocation, sitemap
extraction (incl. one sitemapindex indirection and dedup-latest).

Reference parity note: the reference crawls one site with a fixed seed
list (lib/upton.rb:65-114) — these operators are the frontier-PLANNING
layer a web-scale deployment adds (what to fetch next, at what rate, and
which aliases are the same page)."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from upton_spark.operators.webgraph import (
    allocate_budget,
    canonical_url_col,
    pagerank,
    snapshot_diff,
    synth_link_graph,
)
from upton_spark.sources.sitemap import sitemap_urls


def _canon(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(canonical_url_col(F.lit(url)).alias("c"))
        .collect()[0]["c"]
    )


@pytest.mark.parametrize(
    "url,expect",
    [
        # lower scheme+host, default port stripped, fragment dropped
        ("HTTP://Example.COM:80/Path/a.html#frag", "http://example.com/Path/a.html"),
        ("https://example.com:443/x", "https://example.com/x"),
        # non-default ports survive; :8080 is NOT ':80'-suffixed
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # path case preserved (distinct resources), empty path -> '/'
        ("http://example.com", "http://example.com/"),
        # tracking params stripped, remainder sorted, empty query dropped
        (
            "http://a.com/p?utm_source=tw&b=2&a=1&utm_medium=x",
            "http://a.com/p?a=1&b=2",
        ),
        ("http://a.com/p?utm_source=tw", "http://a.com/p"),
        ("http://a.com/p?fbclid=abc&z=1&gclid=2&ref_src=t", "http://a.com/p?z=1"),
        # plain url unchanged
        ("http://a.com/p?a=1", "http://a.com/p?a=1"),
    ],
)
def test_canonical_url_cases(spark, url, expect):
    assert _canon(spark, url) == expect


def _numpy_pagerank(n, edges, iters=5, d=0.85):
    """Textbook N-scaled power iteration with uniform dangling
    redistribution — the independent model pagerank() must match."""
    out = np.zeros(n)
    for s, _ in edges:
        out[s] += 1
    r = np.ones(n)
    for _ in range(iters):
        nxt = np.zeros(n)
        for s, t in edges:
            nxt[t] += r[s] / out[s]
        dangling = r[out == 0].sum()
        r = (1.0 - d) + d * (nxt + dangling / n)
    return r


def test_pagerank_matches_numpy_power_iteration(spark):
    # graph with a hub, a chain, and a dangling node (3 has no outlinks)
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 2)]
    n = 5
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["doc_id"]: r["rank"]
        for r in pagerank(nodes, edf, iters=5, damping=0.85).collect()
    }
    want = _numpy_pagerank(n, edges)
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12)
    # total rank mass is conserved (sums to N)
    assert sum(got.values()) == pytest.approx(n, abs=1e-9)


def test_synth_link_graph_is_deterministic_and_self_loop_free(spark):
    docs = spark.range(20).select(F.col("id").alias("doc_id"))
    e1 = sorted(map(tuple, synth_link_graph(docs).collect()))
    e2 = sorted(map(tuple, synth_link_graph(docs).collect()))
    assert e1 == e2
    assert all(s != t for s, t in e1)
    assert all(0 <= t < 20 for _, t in e1)


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "h1"), ("u2", "h2"), ("u3", "h3")], "url string, content_hash string"
    )
    new = spark.createDataFrame(
        [("u2", "h2"), ("u3", "h3x"), ("u4", "h4")], "url string, content_hash string"
    )
    got = {r["url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        "u1": "removed",
        "u2": "unchanged",
        "u3": "changed",
        "u4": "added",
    }


def test_allocate_budget_clamps_and_proportions(spark):
    hosts = spark.createDataFrame(
        [("big", 900), ("mid", 90), ("tiny", 10)], "host string, n_docs long"
    )
    rows = {
        r["host"]: r
        for r in allocate_budget(hosts, total_budget=100, floor=2, cap=50).collect()
    }
    assert rows["big"]["share"] == 90 and rows["big"]["budget"] == 50  # capped
    assert rows["mid"]["share"] == 9 and rows["mid"]["budget"] == 9
    assert rows["tiny"]["share"] == 1 and rows["tiny"]["budget"] == 2  # floored


def _page(url, ts, body):
    return (url, ts, body.encode(), None, None)


def test_sitemap_urls_extracts_resolves_index_and_dedups_latest(spark):
    t0 = datetime(2024, 1, 1)
    t1 = datetime(2024, 6, 1)
    xml_old = "<urlset><url><loc>http://a.com/old</loc></url></urlset>"
    xml_new = (
        "<urlset><url><loc> http://a.com/p1 </loc></url>"
        "<url><loc>http://a.com/p2</loc></url></urlset>"
    )
    # b.com publishes a sitemapindex pointing at a child sitemap capture
    xml_index = (
        "<sitemapindex><sitemap><loc>http://b.com/sm/child.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    xml_child = "<urlset><url><loc>http://b.com/deep</loc></url></urlset>"
    pages = spark.createDataFrame(
        [
            _page("http://a.com/sitemap.xml", t0, xml_old),
            _page("http://a.com/sitemap.xml", t1, xml_new),  # latest wins
            _page("http://b.com/sitemap.xml", t0, xml_index),
            _page("http://b.com/sm/child.xml", t0, xml_child),
            _page("http://a.com/not-a-sitemap.html", t0, "<p>hi</p>"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = sorted(map(tuple, sitemap_urls(pages).collect()))
    assert got == [
        ("a.com", "http://a.com/p1"),
        ("a.com", "http://a.com/p2"),
        ("b.com", "http://b.com/deep"),
    ]


def test_blocklist_gate_host_wins_over_pattern(spark):
    from upton_spark.operators.webgraph import blocklist_gate

    frontier = spark.createDataFrame(
        [
            (0, "http://bad.example/p/0", "bad.example"),
            (1, "http://ok.example/p/1?sessionid=9", "ok.example"),
            (2, "http://bad.example/p/2?sessionid=9", "bad.example"),
            (3, "http://ok.example/p/3", "ok.example"),
        ],
        "doc_id long, url string, host string",
    )
    bl = spark.createDataFrame([("bad.example",)], "host string")
    out = {
        r["doc_id"]: (r["blocked"], r["block_reason"])
        for r in blocklist_gate(frontier, bl, [r"[?&]sessionid="]).collect()
    }
    assert out[0] == (True, "host")
    assert out[1] == (True, "pattern")
    assert out[2] == (True, "host")  # host reason wins
    assert out[3] == (False, None)


def test_blocklist_gate_broadcasts_host_list(spark):
    from upton_spark.operators.webgraph import blocklist_gate

    frontier = spark.createDataFrame(
        [(i, f"http://h{i}.x/p", f"h{i}.x") for i in range(50)],
        "doc_id long, url string, host string",
    )
    bl = spark.createDataFrame([("h1.x",), ("h2.x",)], "host string")
    plan = blocklist_gate(frontier, bl, [])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lifecycle_plan_to_admission(spark):
    """Planning feeds scheduling end-to-end: two crawl generations diff ->
    re-fetch frontier (added+changed) -> blocklist gate -> per-host budget
    from host weights -> politeness admission consumes the budget as its
    token column. Each stage is the real operator; the glue is plain
    DataFrame code — the composition a production re-crawl runs."""
    from pyspark.sql import functions as F

    from upton_spark.operators.politeness import admit_per_host
    from upton_spark.operators.webgraph import (
        allocate_budget,
        blocklist_gate,
        snapshot_diff,
    )

    def gen(rows):
        return spark.createDataFrame(rows, "url string, content_hash string")

    old = gen([(f"http://h{i % 3}.x/p{i}", f"v1-{i}") for i in range(12)])
    new = gen(
        [(f"http://h{i % 3}.x/p{i}", f"v1-{i}" if i % 2 else f"v2-{i}") for i in range(12)]
        + [("http://h9.x/p99", "v1-99")]  # added page on a blocked host
    )
    diff = snapshot_diff(old, new)
    refetch = diff.filter(F.col("status").isin("added", "changed")).withColumn(
        "host", F.regexp_extract("url", r"http://([^/]+)/", 1)
    )
    gated = blocklist_gate(refetch, spark.createDataFrame([("h9.x",)], "host string"))
    clean = gated.filter(~F.col("blocked"))
    budgets = allocate_budget(
        clean.groupBy("host").agg(F.count("*").alias("n_docs")),
        total_budget=4,
        floor=1,
        cap=2,
    )
    admitted = admit_per_host(
        clean.join(F.broadcast(budgets.select("host", F.col("budget").alias("host_tokens"))), "host"),
        order_cols=("url",),
    )
    rows = admitted.collect()
    # the blocked-host page never reached admission
    assert all(r["host"] != "h9.x" for r in rows)
    # every changed page is in the candidate set; admission respects budgets
    per_host_admitted = {}
    for r in rows:
        if r["admitted"]:
            per_host_admitted[r["host"]] = per_host_admitted.get(r["host"], 0) + 1
    budget_map = {r["host"]: r["budget"] for r in budgets.collect()}
    assert per_host_admitted and all(
        n <= budget_map[h] for h, n in per_host_admitted.items()
    )
    # deferred rows exist when a host's changed pages exceed its budget
    assert any(not r["admitted"] for r in rows)


def test_revisit_intervals_adaptive_rules(spark):
    """Changed halves (clamped at min), unchanged doubles (clamped at max),
    added starts at base, removed drops; prev intervals carry through."""
    from upton_spark.operators.webgraph import revisit_intervals

    diff = spark.createDataFrame(
        [("u1", "changed"), ("u2", "unchanged"), ("u3", "added"), ("u4", "removed"),
         ("u5", "changed"), ("u6", "unchanged")],
        "url string, status string",
    )
    prev = spark.createDataFrame(
        [("u1", 3), ("u2", 500), ("u5", 1), ("u6", 10)],
        "url string, interval_hours long",
    )
    out = {
        r["url"]: r["interval_hours"]
        for r in revisit_intervals(diff, prev, base_hours=24, min_hours=1, max_hours=720).collect()
    }
    assert out == {
        "u1": 1,    # floor(3/2) = 1
        "u2": 720,  # 1000 clamped to max
        "u3": 24,   # added -> base
        "u5": 1,    # floor(1/2)=0 clamped up to min
        "u6": 20,
    }


def test_hits_matches_numpy_iteration(spark):
    """HITS (auth from hubs, hub from NEW auths, mean-1 normalization each
    step) against a direct numpy replay on a hub-and-authority graph."""
    import numpy as np

    from upton_spark.operators.webgraph import hits

    # node 2 is the authority (everyone points at it); 0 and 4 are hubs
    edges = [(0, 1), (0, 2), (1, 2), (4, 2), (4, 1), (3, 0)]
    n = 5
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["doc_id"]: (r["authority"], r["hub"])
        for r in hits(nodes, edf, iters=5).collect()
    }

    A = np.zeros((n, n))
    for s, t in edges:
        A[s, t] = 1.0
    h = np.ones(n)
    for _ in range(5):
        a = A.T @ h
        a = a / (a.sum() / n)
        h = A @ a
        h = h / (h.sum() / n)
    for i in range(n):
        assert got[i][0] == pytest.approx(a[i], abs=1e-9)
        assert got[i][1] == pytest.approx(h[i], abs=1e-9)
    # node 2 is the top authority; node 4 (two strong outlinks) a top hub
    assert max(range(n), key=lambda i: got[i][0]) == 2
    assert got[4][1] == max(v[1] for v in got.values())


def test_surt_key_forms_and_site_locality(spark):
    """SURT (web-archive sort key): lowercase, one leading www. stripped,
    host labels reversed comma-joined, ')' + path (+ raw query). Sorting
    by surt puts every subdomain of a domain in one contiguous range —
    plain URL order scatters them."""
    from pyspark.sql import functions as F

    from upton_spark.operators.webgraph import surt_keys

    urls = [
        "http://www.Example.com/a/b?q=1",
        "http://example.com/",
        "http://m.example.com/x",
        "http://cdn.example.com",
        "http://api.other.org/v1",
        "http://www.www2.example.com/y",  # only ONE leading www. strips
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["surt"] for r in surt_keys(df).collect()}
    assert got["http://www.Example.com/a/b?q=1"] == "com,example)/a/b?q=1"
    assert got["http://example.com/"] == "com,example)/"
    assert got["http://m.example.com/x"] == "com,example,m)/x"
    assert got["http://cdn.example.com"] == "com,example,cdn)/"
    assert got["http://api.other.org/v1"] == "org,other,api)/v1"
    assert got["http://www.www2.example.com/y"] == "com,example,www2)/y"
    # site locality: all example.com subdomains sort adjacent (one range)
    ordered = sorted(got.values())
    ex = [s for s in ordered if s.startswith("com,example")]
    lo = ordered.index(ex[0])
    assert ordered[lo : lo + len(ex)] == ex


def test_anchor_text_stats_counts_and_tiebreak(spark):
    from upton_spark.operators.webgraph import anchor_text_stats

    links = spark.createDataFrame(
        [
            # t1: 'beta' x2, 'alpha' x2 -> tie broken to lexicographically
            # smallest ('alpha'); 5 inlinks, 3 distinct anchors
            ("s1", "t1", "beta"),
            ("s2", "t1", "beta"),
            ("s3", "t1", "alpha"),
            ("s4", "t1", "alpha"),
            ("s5", "t1", "zeta"),
            # t2: single inlink
            ("s1", "t2", "only"),
        ],
        "src string, dst string, anchor string",
    )
    got = {
        r["target"]: r for r in anchor_text_stats(links).collect()
    }
    assert got["t1"]["inlinks"] == 5
    assert got["t1"]["n_anchors"] == 3
    assert got["t1"]["top_anchor"] == "alpha"
    assert got["t1"]["top_anchor_count"] == 2
    assert got["t2"]["inlinks"] == 1
    assert got["t2"]["top_anchor"] == "only"


def test_cdx_index_fields_and_sort(spark):
    import hashlib

    from upton_spark.operators.webgraph import cdx_index

    t0 = datetime(2024, 1, 1, 12, 30, 45)
    t1 = datetime(2024, 1, 1, 9, 0, 0)
    pages = spark.createDataFrame(
        [
            ("http://www.B-site.com/x", t0, b"hello"),
            ("http://a-site.com/y", t1, b"world!!"),
        ],
        "url string, warc_ts timestamp, html binary",
    )
    rows = cdx_index(pages).collect()
    # sorted by urlkey: a-site before b-site (www. stripped from the key)
    assert [r["urlkey"] for r in rows] == ["com,a-site)/y", "com,b-site)/x"]
    assert rows[0]["ts14"] == "20240101090000"
    assert rows[1]["ts14"] == "20240101123045"
    assert rows[1]["url"] == "http://www.B-site.com/x"  # original url kept
    assert rows[0]["digest"] == hashlib.md5(b"world!!").hexdigest()
    assert rows[0]["length"] == 7
    assert rows[1]["length"] == 5


def test_sitemap_entries_priority_default_and_lastmod(spark):
    from upton_spark.sources.sitemap import sitemap_entries

    t0 = datetime(2024, 1, 1)
    xml = (
        '<?xml version="1.0"?>\n<urlset>\n'
        "<url>\n  <loc>http://a.com/p1</loc>\n"
        "  <lastmod>2024-03-05</lastmod>\n"
        "  <priority>0.8</priority>\n</url>\n"
        "<url><loc>http://a.com/p2</loc></url>\n"  # no optional fields
        "<url><loc>http://a.com/p3</loc><priority>0.2</priority></url>\n"
        "</urlset>"
    )
    pages = spark.createDataFrame(
        [_page("http://a.com/sitemap.xml", t0, xml)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = {r["url"]: r for r in sitemap_entries(pages).collect()}
    assert set(got) == {"http://a.com/p1", "http://a.com/p2", "http://a.com/p3"}
    assert got["http://a.com/p1"]["priority"] == 0.8
    assert got["http://a.com/p1"]["lastmod"] == "2024-03-05"
    assert got["http://a.com/p2"]["priority"] == 0.5  # protocol default
    assert got["http://a.com/p2"]["lastmod"] is None
    assert got["http://a.com/p3"]["priority"] == 0.2
    assert all(r["host"] == "a.com" for r in got.values())


def test_sitemap_priorities_micro_quantized(spark):
    from upton_spark.sources.sitemap import sitemap_entries, sitemap_priorities

    t0 = datetime(2024, 1, 1)
    xml = (
        "<urlset><url><loc>http://a.com/hi</loc><priority>0.9</priority></url>"
        "<url><loc>http://a.com/lo</loc><priority>0.1</priority></url></urlset>"
    )
    pages = spark.createDataFrame(
        [_page("http://a.com/sitemap.xml", t0, xml)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = {
        r["url"]: r["priority"]
        for r in sitemap_priorities(sitemap_entries(pages)).collect()
    }
    # negated micro-quantized: higher sitemap priority -> lower (earlier) value
    assert got["http://a.com/hi"] == -900000
    assert got["http://a.com/lo"] == -100000
    assert got["http://a.com/hi"] < got["http://a.com/lo"]


def test_meta_refresh_redirects_forms(spark):
    from upton_spark.operators.webgraph import meta_refresh_redirects

    t0 = datetime(2024, 1, 1)
    rows = [
        # absolute target, uppercase attrs, unquoted value
        ("http://a.com/1", '<html><META HTTP-EQUIV=REFRESH CONTENT="0; URL=http://b.com/x"></html>'),
        # root-relative target resolves against the capture url
        ("http://a.com/2", "<meta http-equiv='refresh' content='5; url=/next'>"),
        # pure reload (no url=) -> no edge
        ("http://a.com/3", '<meta http-equiv="refresh" content="30">'),
        # no refresh tag at all -> no edge
        ("http://a.com/4", "<html><body>hi</body></html>"),
        # first tag wins
        (
            "http://a.com/5",
            '<meta http-equiv="refresh" content="0;url=/first">'
            '<meta http-equiv="refresh" content="0;url=/second">',
        ),
        # self-redirect dropped
        ("http://a.com/6", '<meta http-equiv="refresh" content="0;url=http://a.com/6">'),
    ]
    pages = spark.createDataFrame(
        [(u, t0, h.encode(), None, None) for u, h in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = {r["src"]: r["dst"] for r in meta_refresh_redirects(pages).collect()}
    assert got == {
        "http://a.com/1": "http://b.com/x",
        "http://a.com/2": "http://a.com/next",
        "http://a.com/5": "http://a.com/first",
    }


def test_resolve_redirects_chains_cycles_and_dups(spark):
    from upton_spark.operators.webgraph import resolve_redirects

    edges = spark.createDataFrame(
        [
            # chain a -> b -> c -> T (3 hops)
            ("a", "b"), ("b", "c"), ("c", "T"),
            # 1-hop
            ("x", "Y"),
            # 3-cycle
            ("c0", "c1"), ("c1", "c2"), ("c2", "c0"),
            # self-loop
            ("s", "s"),
            # duplicate srcs collapse to MIN dst ('A' < 'B')
            ("d", "B"), ("d", "A"),
        ],
        "src string, dst string",
    )
    got = {r["src"]: r for r in resolve_redirects(edges, max_hops=8).collect()}
    assert (got["a"]["final_url"], got["a"]["hops"], got["a"]["unresolved"]) == ("T", 3, False)
    assert (got["b"]["final_url"], got["b"]["hops"]) == ("T", 2)
    assert (got["x"]["final_url"], got["x"]["hops"]) == ("Y", 1)
    assert (got["d"]["final_url"], got["d"]["hops"]) == ("A", 1)
    for cyc in ("c0", "c1", "c2", "s"):
        assert got[cyc]["unresolved"] is True
        assert got[cyc]["final_url"] is None and got[cyc]["hops"] is None


def test_resolve_redirects_long_chain_overflow_flagged(spark):
    from upton_spark.operators.webgraph import resolve_redirects

    # chain of 9 hops; max_hops=4 rounds to 4 doubling rounds? no: 4 -> 2
    # rounds -> resolves chains up to 4 hops; 9 > 4 -> unresolved
    n = 9
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(n)], "src string, dst string"
    )
    got = {r["src"]: r for r in resolve_redirects(edges, max_hops=4).collect()}
    assert got[f"n{n-1}"]["final_url"] == f"n{n}"  # last edge resolves
    assert got["n0"]["unresolved"] is True  # 9 hops > 4 -> flagged, not wrong
    # with a big enough bound the same chain fully resolves
    full = {r["src"]: r for r in resolve_redirects(edges, max_hops=16).collect()}
    assert (full["n0"]["final_url"], full["n0"]["hops"]) == (f"n{n}", n)


def test_canonical_links_forms_and_chain_collapse(spark):
    from upton_spark.operators.webgraph import canonical_links, resolve_redirects

    t0 = datetime(2024, 1, 1)
    rows = [
        # self-canonical, uppercase attrs
        ("http://a.com/p1", '<LINK REL=CANONICAL HREF="http://a.com/p1">'),
        # relative canonical resolves against the capture url
        ("http://a.com/p1?utm=x", "<link rel='canonical' href='/p1'>"),
        # chain: p2 declares p3 canonical, p3 declares p4
        ("http://a.com/p2", '<link rel="canonical" href="http://a.com/p3">'),
        ("http://a.com/p3", '<link rel="canonical" href="/p4">'),
        # no declaration -> no row
        ("http://a.com/p5", "<html><body>plain</body></html>"),
        # first tag wins
        (
            "http://a.com/p6",
            '<link rel="canonical" href="/first"><link rel="canonical" href="/second">',
        ),
    ]
    pages = spark.createDataFrame(
        [(u, t0, h.encode(), None, None) for u, h in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = {r["src"]: r for r in canonical_links(pages).collect()}
    assert set(got) == {
        "http://a.com/p1", "http://a.com/p1?utm=x", "http://a.com/p2",
        "http://a.com/p3", "http://a.com/p6",
    }
    assert got["http://a.com/p1"]["is_self"] is True
    assert got["http://a.com/p1?utm=x"]["canonical"] == "http://a.com/p1"
    assert got["http://a.com/p1?utm=x"]["is_self"] is False
    assert got["http://a.com/p6"]["canonical"] == "http://a.com/first"

    # canonical CHAINS collapse through the same pointer-doubling resolver
    edges = canonical_links(pages).filter(~F.col("is_self")).select(
        "src", F.col("canonical").alias("dst")
    )
    resolved = {r["src"]: r for r in resolve_redirects(edges).collect()}
    assert (resolved["http://a.com/p2"]["final_url"], resolved["http://a.com/p2"]["hops"]) == (
        "http://a.com/p4", 2,
    )


def test_registrable_domains_longest_match_and_fallbacks(spark):
    from upton_spark.operators.webgraph import registrable_domains

    rows = [
        ("www.Site.co.uk",),          # multi-label public suffix
        ("a.b.example.com",),         # implicit '*' rule -> last two labels
        ("user.github.io",),          # private-section suffix: user IS the site
        ("deep.user.github.io",),     # still groups to user.github.io
        ("bucket.s3.amazonaws.com",), # 3-label suffix
        ("co.uk",),                   # host IS a suffix -> no domain
        ("localhost",),               # single label -> no domain
        ("foo.uk",),                  # unlisted ccTLD second level -> fallback
    ]
    df = spark.createDataFrame(rows, "host string")
    got = {r["host"]: r["domain"] for r in registrable_domains(df).collect()}
    assert got["www.Site.co.uk"] == "site.co.uk"
    assert got["a.b.example.com"] == "example.com"
    assert got["user.github.io"] == "user.github.io"
    assert got["deep.user.github.io"] == "user.github.io"
    assert got["bucket.s3.amazonaws.com"] == "bucket.s3.amazonaws.com"
    assert got["co.uk"] is None
    assert got["localhost"] is None
    assert got["foo.uk"] == "foo.uk"


def test_registrable_domains_no_shuffle_of_big_side(spark):
    from upton_spark.operators.webgraph import registrable_domains

    df = spark.createDataFrame([("x.co.uk",)], "host string")
    plan = registrable_domains(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_trap_scores_features_and_flag(spark):
    from upton_spark.operators.webgraph import url_trap_scores

    rows = [
        ("http://a.com/d/a/b1",),                      # normal
        ("http://a.com/x/x/x/x/x/page",),              # loop trap (4 dups)
        ("http://a.com/cal/2024/03/7",),               # calendar at depth 4
        ("http://a.com/s?a=1&b=2&c=3&d=4&e=5&f=6",),   # param explosion
        ("http://a.com/p?page=3",),                    # shallow + 1 param
        ("http://a.com/",),                            # empty path
        ("http://a.com/b2024/03/x",),                  # year not segment-aligned
        ("http://a.com/a/b/c/d/e/f/g/h/i/j",),         # depth > 8
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {r["url"]: r for r in url_trap_scores(df).collect()}
    r = got["http://a.com/d/a/b1"]
    assert (r["depth"], r["dup_segments"], r["param_count"], r["has_calendar"], r["is_trap"]) == (3, 0, 0, False, False)
    r = got["http://a.com/x/x/x/x/x/page"]
    assert (r["dup_segments"], r["is_trap"]) == (4, True)
    r = got["http://a.com/cal/2024/03/7"]
    assert (r["has_calendar"], r["depth"], r["is_trap"]) == (True, 4, True)
    r = got["http://a.com/s?a=1&b=2&c=3&d=4&e=5&f=6"]
    assert (r["param_count"], r["is_trap"]) == (6, True)
    r = got["http://a.com/p?page=3"]
    assert (r["param_count"], r["is_trap"]) == (1, False)
    r = got["http://a.com/"]
    assert (r["depth"], r["is_trap"]) == (0, False)
    assert got["http://a.com/b2024/03/x"]["has_calendar"] is False
    assert got["http://a.com/a/b/c/d/e/f/g/h/i/j"]["is_trap"] is True

    plan = url_trap_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_resolve_redirects_matches_linear_walk_on_random_graphs(spark):
    """Property check, seeded: 60 random functional graphs (chains, trees
    into chains, cycles, self-loops, duplicate srcs) resolved in ONE
    resolve_redirects call (nodes namespaced per graph) must agree with a
    pure-Python one-hop-at-a-time walk on terminal, hop count, and
    unresolved flag for every src."""
    import random

    rng = random.Random(20240818)
    edges, expected = [], {}
    MAX_HOPS = 16
    for g in range(60):
        n = rng.randint(2, 12)
        nodes = [f"g{g}:n{i}" for i in range(n)]
        emap: dict[str, str] = {}
        for s in nodes:
            if rng.random() < 0.7:
                d = rng.choice(nodes)  # may self-loop / form cycles
                emap[s] = d
                edges.append((s, d))
                if rng.random() < 0.15:  # duplicate src: MIN dst must win
                    d2 = rng.choice(nodes)
                    edges.append((s, d2))
                    emap[s] = min(d, d2)
        for s in emap:
            cur, hops = s, 0
            seen_n = set()
            while cur in emap and hops <= MAX_HOPS:
                if cur in seen_n:
                    break
                seen_n.add(cur)
                cur = emap[cur]
                hops += 1
            if cur in emap:  # cycle or over budget
                expected[s] = (None, None, True)
            else:
                expected[s] = (cur, hops, False)

    from upton_spark.operators.webgraph import resolve_redirects

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["src"]: (r["final_url"], r["hops"], r["unresolved"])
        for r in resolve_redirects(df, max_hops=MAX_HOPS).collect()
    }
    assert got == expected


class TestHostGraph:
    def test_host_level_counts_and_self_loops(self, spark):
        from upton_spark.operators.webgraph import host_graph

        links = spark.createDataFrame(
            [
                ("http://A.com/1", "http://b.com/x"),
                ("http://a.com/2", "http://B.com/y"),
                ("http://a.com/3", "http://a.com/4"),   # intra-site: kept
                ("http://c.com/1", None),               # unparseable: dropped
            ],
            "src_url string, dst_url string",
        )
        rows = {
            (r["src_site"], r["dst_site"]): r["n_links"]
            for r in host_graph(links).collect()
        }
        assert rows[("a.com", "b.com")] == 2  # case-folded hosts merge
        assert rows[("a.com", "a.com")] == 1
        assert len(rows) == 2

    def test_domain_level_collapses_subdomains_drops_bare_suffix(self, spark):
        from upton_spark.operators.webgraph import host_graph

        links = spark.createDataFrame(
            [
                ("http://www.foo.com/1", "http://bar.com/x"),
                ("http://m.foo.com/2", "http://cdn.bar.com/y"),
                ("http://foo.com/3", "http://bar.com/z"),
                ("http://com/1", "http://bar.com/q"),   # bare suffix: dropped
            ],
            "src_url string, dst_url string",
        )
        rows = {
            (r["src_site"], r["dst_site"]): r["n_links"]
            for r in host_graph(links, level="domain").collect()
        }
        assert rows == {("foo.com", "bar.com"): 3}

    def test_plan_no_window_no_python(self, spark):
        import pytest
        from upton_spark.operators.webgraph import host_graph

        links = spark.createDataFrame(
            [("http://a.com/1", "http://b.com/x")],
            "src_url string, dst_url string",
        )
        for level in ("host", "domain"):
            out = host_graph(links, level=level)
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "Window" not in plan
            assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        with pytest.raises(ValueError):
            host_graph(links, level="tld")


class TestMirrorHostPairs:
    def test_jaccard_counts_and_threshold(self, spark):
        from upton_spark.operators.webgraph import mirror_host_pairs

        rows = []
        # m1/m2 mirror 8 of 10 pages; solo shares 1 page with m1
        for i in range(10):
            rows.append(("m1.example", f"hash{i}"))
        for i in range(8):
            rows.append(("m2.example", f"hash{i}"))
        rows += [("m2.example", "only-m2-a"), ("m2.example", "only-m2-b")]
        rows += [("solo.example", "hash0"), ("solo.example", "zzz")]
        # duplicate captures of the same page must not inflate counts
        rows.append(("m1.example", "hash0"))
        df = spark.createDataFrame(rows, "host string, content_hash string")
        out = {
            (r["host_a"], r["host_b"]): r
            for r in mirror_host_pairs(df, threshold=0.5).collect()
        }
        assert set(out) == {("m1.example", "m2.example")}
        r = out[("m1.example", "m2.example")]
        assert (r["n_shared"], r["n_a"], r["n_b"]) == (8, 10, 10)
        assert abs(r["jaccard"] - round(8 / 12, 6)) < 1e-9
        # below threshold the solo pair exists but is filtered
        low = mirror_host_pairs(df, threshold=0.0).collect()
        assert any(
            {p["host_a"], p["host_b"]} == {"m1.example", "solo.example"} for p in low
        )

    def test_no_pairwise_join_shapes(self, spark):
        from upton_spark.operators.webgraph import mirror_host_pairs

        df = spark.createDataFrame(
            [("a", "h1"), ("b", "h1")], "host string, content_hash string"
        )
        plan = (
            mirror_host_pairs(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
