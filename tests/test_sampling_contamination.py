"""Deterministic stratified sampling + benchmark decontamination.

The sampling property under test is REPRODUCIBILITY: the keep/drop
decision is a pure integer function of the key, so the sample is identical
under repartitioning (unlike ``df.sample``, which is seeded per-partition).
Contamination is the standard exact n-gram collision check against a small
benchmark set; correctness is pinned on hand-built documents with known
shared 5-token windows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from upton_spark.operators.dedup_docs import contamination_pairs, shingle_table
from upton_spark.operators.sampling import (
    _BUCKETS,
    _MULT,
    _OFFSET,
    mixing_report,
    sample_bucket_col,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=i, lang=["en", "de", "zh"][i % 3], text=f"doc number {i} body text")
        for i in range(300)
    ]
    return spark.createDataFrame(rows).cache()


class TestStratifiedSample:
    def test_rate_one_keeps_all_rate_zero_drops_all(self, docs):
        kept = stratified_sample(docs, {"en": 1.0, "de": 0.0, "zh": 0.0})
        langs = [r["lang"] for r in kept.select("lang").distinct().collect()]
        assert langs == ["en"]
        assert kept.count() == docs.filter("lang = 'en'").count()

    def test_sample_is_invariant_under_repartition(self, docs):
        rates = {"en": 0.4, "de": 0.7, "zh": 0.15}
        a = sorted(r["doc_id"] for r in stratified_sample(docs, rates).collect())
        b = sorted(
            r["doc_id"]
            for r in stratified_sample(docs.repartition(13, "lang"), rates).collect()
        )
        assert a == b and 0 < len(a) < 300

    def test_decision_matches_python_arithmetic(self, docs):
        # the engine-side decision is exactly (k*MULT+OFFSET) % BUCKETS —
        # auditable per doc ("why is doc X in the sample?")
        rates = {"en": 0.3, "de": 0.3, "zh": 0.3}
        kept = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
        expect = {
            i for i in range(300) if (i * _MULT + _OFFSET) % _BUCKETS < 3000
        }
        assert kept == expect

    def test_default_rate_applies_to_unlisted_strata(self, docs):
        kept = stratified_sample(docs, {"en": 1.0}, default_rate=1.0)
        assert kept.count() == 300
        kept0 = stratified_sample(docs, {"en": 1.0}, default_rate=0.0)
        assert kept0.count() == docs.filter("lang = 'en'").count()

    def test_mixing_report_counts_and_zero_stratum(self, docs):
        rep = {
            r["lang"]: r
            for r in mixing_report(docs, {"en": 1.0, "de": 0.5, "zh": 0.0}).collect()
        }
        assert rep["en"]["n_kept"] == rep["en"]["n_total"]
        assert rep["en"]["realized_rate"] == 1.0
        assert rep["zh"]["n_kept"] == 0 and rep["zh"]["realized_rate"] == 0.0
        assert 0 < rep["de"]["n_kept"] < rep["de"]["n_total"]

    def test_bucket_col_range(self, docs):
        mn, mx = (
            docs.select(
                F.min(sample_bucket_col(F.col("doc_id"))),
                F.max(sample_bucket_col(F.col("doc_id"))),
            )
            .first()
        )
        assert 0 <= mn and mx < _BUCKETS

    def test_huge_keys_still_bucket_in_range(self, spark):
        """64-bit hash-derived doc ids used to overflow the int64 multiply
        (ANSI: throw; non-ANSI: a sign-preserving % gave a NEGATIVE bucket,
        i.e. always-keep at any rate). The mod-first form buckets ANY int64
        key to the exact mathematical (key*MULT+OFFSET) mod B residue."""
        huge = spark.createDataFrame(
            [(2**62,), (2**63 - 1,), (-(2**62),), (3_460_000_000,), (7,)],
            "doc_id long",
        )
        rows = huge.select(
            "doc_id", sample_bucket_col(F.col("doc_id")).alias("b")
        ).collect()
        for r in rows:
            assert 0 <= r["b"] < _BUCKETS, r
            # python ints are unbounded: this is the exact mathematical value
            assert r["b"] == (r["doc_id"] * _MULT + _OFFSET) % _BUCKETS, r


class TestContamination:
    @pytest.fixture(scope="class")
    def corpus_and_bench(self, spark):
        bench_text = "alpha beta gamma delta epsilon zeta eta"
        corpus = spark.createDataFrame(
            [
                # contains the bench 5-window "alpha beta gamma delta epsilon"
                Row(doc_id=1, text="intro words alpha beta gamma delta epsilon outro"),
                # exact copy of the benchmark item -> overlap 1.0
                Row(doc_id=2, text=bench_text),
                # no shared 5-token window
                Row(doc_id=3, text="one two three four five six seven eight"),
            ]
        )
        bench = spark.createDataFrame([Row(doc_id=100, text=bench_text)])
        return corpus, bench

    def test_known_overlaps(self, corpus_and_bench):
        corpus, bench = corpus_and_bench
        out = {
            r["doc_id"]: r
            for r in contamination_pairs(corpus, bench, k=5).collect()
        }
        assert set(out) == {1, 2}
        # doc 1: 8 tokens -> 4 shingles, exactly 1 shared (the bench window)
        assert out[1]["bench_id"] == 100
        assert out[1]["n_shared"] == 1 and out[1]["n_shingles"] == 4
        assert out[1]["overlap"] == 0.25
        # doc 2 is an exact copy: all 3 of its shingles shared
        assert out[2]["n_shared"] == out[2]["n_shingles"] == 3
        assert out[2]["overlap"] == 1.0

    def test_short_docs_use_whole_doc_shingle(self, spark):
        # < k tokens: the whole doc is one length-salted shingle, so exact
        # short-text matches are still caught
        corpus = spark.createDataFrame(
            [Row(doc_id=1, text="tiny doc"), Row(doc_id=2, text="other thing")]
        )
        bench = spark.createDataFrame([Row(doc_id=9, text="tiny doc")])
        out = contamination_pairs(corpus, bench, k=5).collect()
        assert len(out) == 1
        assert out[0]["doc_id"] == 1 and out[0]["overlap"] == 1.0

    def test_shingle_table_is_distinct_per_key(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="a b a b a b a b a b a b")]  # repeating windows
        )
        st = shingle_table(df, k=5)
        assert st.count() == st.distinct().count()

    def test_plan_broadcasts_benchmark_side(self, corpus_and_bench):
        corpus, bench = corpus_and_bench
        plan = contamination_pairs(corpus, bench, k=5)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestRepetitionStats:
    def test_hand_computed_repetition(self, spark):
        from upton_spark.operators.textops import repetition_stats

        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="a a a b"),  # heavy repetition
                Row(doc_id=2, text="w x y z"),  # all distinct
                Row(doc_id=3, text=""),  # empty
                Row(doc_id=4, text="solo"),  # single token, no bigram
            ]
        )
        out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
        r1 = out[1]
        # 4 tokens, 2 distinct; top token 'a' x3; bigrams [aa, aa, ab] -> top 2/3
        assert r1["n_tokens"] == 4 and r1["distinct_ratio"] == 0.5
        assert r1["top_token_frac"] == 0.75
        assert r1["top_bigram_frac"] == round(2 / 3, 4)
        assert r1["repetitive"] == 1
        r2 = out[2]
        assert r2["distinct_ratio"] == 1.0 and r2["top_token_frac"] == 0.25
        assert r2["repetitive"] == 1  # top_token_frac 0.25 > 0.12
        assert out[3]["n_tokens"] == 0 and out[3]["repetitive"] == 0
        r4 = out[4]
        assert r4["n_tokens"] == 1 and r4["top_bigram_frac"] == 0.0
        # single token: top_token_frac 1.0 -> flagged
        assert r4["repetitive"] == 1

    def test_linear_shuffle_shape_no_python_in_plan(self, spark):
        from upton_spark.operators.textops import repetition_stats

        df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
        plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan  # builtin expressions only, no UDF
        # the quadratic per-row form (transform(array_distinct, t ->
        # size(filter(...)))) is gone: counting happens in partial-agg
        # HashAggregates over the exploded grams, linear per document
        assert "array_distinct" not in plan
        assert "HashAggregate" in plan
        assert "CartesianProduct" not in plan


def test_pack_sequences_greedy_walk(spark):
    """Greedy per-shard packing: non-empty bins close on overflow, an
    oversized doc gets a bin to itself, zero-token docs ride along."""
    from upton_spark.operators.sampling import pack_sequences

    def words(n):
        return " ".join("w" for _ in range(n))

    # all in one shard (ids are multiples of 8)
    rows = [
        (0, words(100)),   # bin 0 (cum 100)
        (8, words(150)),   # bin 0 (cum 250)
        (16, words(10)),   # would overflow 256 -> bin 1 (cum 10)
        (24, words(300)),  # oversized: overflows non-empty bin 1 -> bin 2 alone
        (32, ""),          # 0 tokens: cum 300 > cap but adding 0 keeps <= rule? 300+0 > 256 -> new bin 3
        (40, words(5)),    # cum 0+? after empty doc: bin 3 had cum 0 -> stays bin 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, capacity=256, n_shards=8).collect()}
    assert [out[i]["bin_id"] for i in (0, 8, 16, 24)] == [0, 0, 1, 2]
    assert out[32]["bin_id"] == 3 and out[32]["n_tokens"] == 0
    assert out[40]["bin_id"] == 3
    assert all(out[i]["shard"] == 0 for i in (0, 8, 16, 24, 32, 40))


def test_pack_sequences_shards_independent(spark):
    from upton_spark.operators.sampling import pack_sequences

    rows = [(i, " ".join("w" for _ in range(64))) for i in range(32)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, capacity=128, n_shards=8).collect()
    # 4 docs per shard, 64 tokens each, capacity 128 -> bins of exactly 2 docs
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append((r["doc_id"], r["bin_id"]))
    for shard, docs in by_shard.items():
        docs.sort()
        assert [b for _, b in docs] == [0, 0, 1, 1]


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """Docs that share vocabulary with the target distribution score
    higher; identical docs score identically; weights are reproducible."""
    from pyspark.sql import functions as F

    from upton_spark.operators.sampling import dsir_weights

    rows = (
        [(i, "alpha beta gamma delta", "en") for i in range(6)]
        + [(10 + i, "omega psi chi phi", "zh") for i in range(6)]
        + [(20, "alpha beta gamma delta", "zh"),  # target-like text, raw lang
           (21, "omega psi chi phi", "en")]       # raw-like text
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r["dsir_logweight"] for r in dsir_weights(df, F.col("lang") == "en", n_buckets=512).collect()}
    # target-like text beats raw-like text regardless of its own label
    assert out[20] > out[10]
    assert out[0] > out[21]
    # identical text -> identical weight
    assert out[20] == out[0]
    assert out[21] == out[10]
    # deterministic across re-runs
    out2 = {r["doc_id"]: r["dsir_logweight"] for r in dsir_weights(df, F.col("lang") == "en", n_buckets=512).collect()}
    assert out == out2


def test_c4_clean_line_and_doc_rules(spark):
    from upton_spark.operators.textops import c4_clean

    rows = [
        (0, "a good long sentence here.\nshort no.\nenable javascript now please.\n"
            "another full sentence stands!\nno punct line at all\nthird proper sentence stays?"),
        (1, "only one good sentence here."),                       # < 3 kept -> flagged
        (2, "fine sentence number one.\nfine sentence number two!\n"
            "fine sentence number three?\nlorem ipsum dolor sit."),  # lorem -> flagged
        (3, "brace sentence number one {ok}.\nfine sentence number two!\n"
            "fine sentence number three?\nfine sentence number four."),  # brace -> flagged
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert out[0]["n_lines"] == 6 and out[0]["n_kept_lines"] == 3
    assert out[0]["c4_kept"] is True
    assert out[0]["clean_text"] == (
        "a good long sentence here.\nanother full sentence stands!\nthird proper sentence stays?"
    )
    assert out[1]["c4_kept"] is False and out[1]["n_kept_lines"] == 1
    assert out[2]["c4_kept"] is False and out[2]["n_kept_lines"] == 4
    assert out[3]["c4_kept"] is False


def test_c4_clean_all_codegen(spark):
    from upton_spark.operators.textops import c4_clean

    df = spark.createDataFrame([(0, "x.")], "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_chunk_documents_covers_every_token(spark):
    """Coverage property over varied lengths: concatenating each doc's
    chunks with overlap removed reproduces the token sequence exactly."""
    from upton_spark.operators.textops import chunk_documents

    rows = [(n, " ".join(f"w{n}_{i}" for i in range(n))) for n in (1, 3, 4, 5, 7, 48, 49, 95, 97)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    window, stride = 48, 32
    chunks = {}
    for r in chunk_documents(df, window=window, stride=stride).collect():
        chunks.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"].split(" ")
    for n, text in rows:
        got = chunks[n]
        rebuilt = list(got[0])
        for k in range(1, len(got)):
            overlap = window - stride if len(got[k]) == window or k < len(got) - 1 else 0
            # chunk k starts at k*stride: tokens beyond the already-covered
            # prefix are exactly got[k][len(rebuilt)-k*stride:]
            rebuilt.extend(got[k][len(rebuilt) - k * stride:])
        assert rebuilt == text.split(" "), n


def test_pii_scrub_idempotent(spark):
    from upton_spark.operators.textops import pii_scrub

    df = spark.createDataFrame(
        [(0, "a@b.io calls +1-222-3333 from 10.0.0.1")], "doc_id long, text string"
    )
    once = pii_scrub(df).select(F.col("clean_text").alias("text"), "doc_id")
    twice = pii_scrub(once).collect()[0]
    assert twice["clean_text"] == "<EMAIL> calls <PHONE> from <IP>"
    assert twice["n_emails"] == 0 and twice["n_ips"] == 0 and twice["n_phones"] == 0


def test_pack_sequences_matches_reference_walk_on_random_corpora(spark):
    """Property vs a plain-python reference: for randomized token counts
    (hypothesis-driven, deterministic profile), the distributed per-shard
    walk reproduces greedy first-fit exactly and never overfills a bin
    except the single-oversized-doc case."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from upton_spark.operators.sampling import pack_sequences

    CAP, SHARDS = 64, 4

    def reference(rows):
        bins = {}
        state = {}
        for doc_id, tok in sorted(rows):
            sh = doc_id % SHARDS
            cum, b = state.get(sh, (0, 0))
            if cum > 0 and cum + tok > CAP:
                b, cum = b + 1, 0
            bins[doc_id] = b
            state[sh] = (cum + tok, b)
        return bins

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=40)
    )
    def run(toks):
        rows = [(i, n) for i, n in enumerate(toks)]
        df = spark.createDataFrame(
            [(i, " ".join("w" for _ in range(n)) if n else "") for i, n in rows],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["bin_id"]
            for r in pack_sequences(df, capacity=CAP, n_shards=SHARDS).collect()
        }
        assert got == reference(rows)

    run()


def test_lm_nll_ranks_reference_like_docs_lower(spark):
    """CCNet LM scoring: documents drawn from the reference distribution
    score a LOWER avg NLL than out-of-distribution docs; scores are exact
    integer-micro sums (repartition-invariant)."""
    from pyspark.sql import Row

    from upton_spark.operators.sampling import lm_nll_scores

    ref_texts = [f"the quick brown fox jumps over the lazy dog {i}" for i in range(30)]
    rows = (
        [Row(doc_id=i, lang="en", text=t) for i, t in enumerate(ref_texts)]
        + [Row(doc_id=100, lang="de", text="the quick brown fox jumps over the lazy dog 7")]
        + [Row(doc_id=101, lang="de", text="zxq vnm plk qwe rty uio asd fgh jkl bnm")]
    )
    df = spark.createDataFrame(rows)
    out = {r["doc_id"]: r["avg_nll"] for r in lm_nll_scores(df, F.col("lang") == "en", n_buckets=512).collect()}
    # in-distribution doc scores lower than the gibberish doc
    assert out[100] < out[101]
    # repartition invariance (exact integer sums, one final division)
    out2 = {
        r["doc_id"]: r["avg_nll"]
        for r in lm_nll_scores(df.repartition(7), F.col("lang") == "en", n_buckets=512).collect()
    }
    assert out == out2


def test_gopher_rules_hand_computed(spark):
    """Each Gopher structural rule on hand-built docs: clean text passes;
    symbol noise, bullet walls, ellipsis walls, non-alpha floods, and
    stopword-free strings each trip their rule."""
    from pyspark.sql import Row

    from upton_spark.operators.textops import gopher_rules

    clean = "the quick brown fox jumps over the lazy dog and that dog sat with it"
    rows = [
        Row(doc_id=1, text=clean),
        Row(doc_id=2, text="the of and " + "### ## # " * 10),        # symbols
        Row(doc_id=3, text="\n".join(["- item the of and be to that have with more words here"] * 5)),  # bullets
        Row(doc_id=4, text="\n".join(["the story continues and that..."] * 5)),  # ellipsis lines
        Row(doc_id=5, text="the of 123 456 789 012 345 678 901 234 567 890"),  # non-alpha
        Row(doc_id=6, text="zxq vnm plk qwe rty uio asd fgh jkl bnm pqr stv"),  # no stopwords
        Row(doc_id=7, text="the of"),  # too short
    ]
    out = {r["doc_id"]: r for r in gopher_rules(spark.createDataFrame(rows)).collect()}
    assert out[1]["gopher_pass"] == 1
    assert out[2]["symbol_ratio"] >= 0.1 and out[2]["gopher_pass"] == 0
    assert out[3]["bullet_line_ratio"] >= 0.9 and out[3]["gopher_pass"] == 0
    assert out[4]["ellipsis_line_ratio"] >= 0.3 and out[4]["gopher_pass"] == 0
    assert out[5]["alpha_word_ratio"] <= 0.8 and out[5]["gopher_pass"] == 0
    assert out[6]["stop_hits"] < 2 and out[6]["gopher_pass"] == 0
    assert out[7]["n_words"] < 10 and out[7]["gopher_pass"] == 0


def test_gopher_rules_all_codegen(spark):
    from pyspark.sql import Row

    from upton_spark.operators.textops import gopher_rules

    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "Exchange" not in plan  # map-only


def test_host_disjoint_split_is_host_pure_and_engine_stable(spark):
    """Every host maps to exactly ONE split (leakage-safe by construction),
    the assignment is a pure md5 function (repartition-invariant), and the
    fraction thresholds resolve to exact integers."""
    import hashlib

    import pytest as _pytest
    from pyspark.sql import functions as F

    from upton_spark.operators.sampling import host_disjoint_split

    rows = [(i, f"host-{i % 37}.example") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = host_disjoint_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    per_host = (
        out.groupBy("host")
        .agg(F.countDistinct("split").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in per_host)
    # pure-python replay of the md5 bucket rule == the engine's assignment
    def expect(host):
        bkt = int(hashlib.md5(host.encode()).hexdigest()[:15], 16) % 10_000
        return "train" if bkt < 8000 else ("val" if bkt < 9000 else "test")

    got = {r["host"]: r["split"] for r in out.select("host", "split").distinct().collect()}
    assert got == {h: expect(h) for h in got}
    # repartition-invariance
    got2 = {
        r["host"]: r["split"]
        for r in host_disjoint_split(df.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("host", "split")
        .distinct()
        .collect()
    }
    assert got2 == got
    with _pytest.raises(ValueError, match="sum to 1"):
        host_disjoint_split(df, {"train": 0.5, "val": 0.1})
