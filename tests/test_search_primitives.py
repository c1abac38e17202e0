"""Tests for the search-side primitives (tf-idf keywords, sharded inverted
index) and quality-aware duplicate representative selection."""

from pyspark.sql import functions as F


class TestSelectRepresentatives:
    def _members(self, spark):
        # two clusters: {1,2,3} labeled 1, {10,11} labeled 10
        return spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
            "doc_id long, component long",
        )

    def test_highest_quality_wins_ties_break_low_doc_id(self, spark):
        from upton_spark.operators.dedup_docs import select_representatives

        quality = spark.createDataFrame(
            # cluster 1: doc 3 has the top score; cluster 10: 10 and 11 tie
            [(1, 100), (2, 250), (3, 900), (10, 500), (11, 500)],
            "doc_id long, quality_micro long",
        )
        rows = {
            r["component"]: r
            for r in select_representatives(self._members(spark), quality).collect()
        }
        assert rows[1]["rep_doc_id"] == 3 and rows[1]["rep_quality"] == 900
        assert rows[1]["n_members"] == 3 and rows[1]["n_dropped"] == 2
        # tie -> lowest doc_id (first-occurrence convention)
        assert rows[10]["rep_doc_id"] == 10 and rows[10]["rep_quality"] == 500

    def test_unscored_docs_rank_last_and_surface_null(self, spark):
        from upton_spark.operators.dedup_docs import select_representatives

        quality = spark.createDataFrame(
            # doc 3 unscored; doc 1/2 scored -> 2 wins. cluster 10 fully
            # unscored -> representative = lowest doc_id, rep_quality NULL
            [(1, 7), (2, 9)],
            "doc_id long, quality_micro long",
        )
        rows = {
            r["component"]: r
            for r in select_representatives(self._members(spark), quality).collect()
        }
        assert rows[1]["rep_doc_id"] == 2
        assert rows[10]["rep_doc_id"] == 10 and rows[10]["rep_quality"] is None

    def test_single_exchange_plan_no_window_no_python(self, spark):
        from upton_spark.operators.dedup_docs import select_representatives

        quality = spark.createDataFrame(
            [(1, 7)], "doc_id long, quality_micro long"
        )
        out = select_representatives(self._members(spark), quality)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestTfidfTopk:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "apple banana apple cherry"),
                (2, "banana cherry cherry"),
                (3, "apple zebra"),
            ],
            "doc_id long, text string",
        )

    def test_scores_and_ranks_match_hand_math(self, spark):
        import math

        from upton_spark.operators.textops import tfidf_topk

        rows = tfidf_topk(self._docs(spark), k=2).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for v in by_doc.values():
            v.sort(key=lambda r: r["rank"])
        # doc 1: apple tf=2 df=2, cherry tf=1 df=2, banana tf=1 df=2
        # idf(df=2) = ln(4/3); apple score 2*ln(4/3) tops; banana beats
        # cherry on the term tiebreak at equal (tf, df)
        assert [r["term"] for r in by_doc[1]] == ["apple", "banana"]
        assert abs(by_doc[1][0]["score"] - round(2 * math.log(4 / 3), 6)) < 1e-9
        # doc 3: zebra df=1 -> idf ln(2) beats apple's ln(4/3)
        assert [r["term"] for r in by_doc[3]] == ["zebra", "apple"]
        assert all(len(v) <= 2 for v in by_doc.values())

    def test_no_driver_action_for_corpus_size(self, spark):
        """N arrives as a broadcast 1-row aggregate: building the plan must
        not run any job (lazy end-to-end)."""
        from upton_spark.operators.textops import tfidf_topk

        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        out = tfidf_topk(self._docs(spark), k=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after == before
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestInvertedIndex:
    def test_postings_sorted_and_df_counts(self, spark):
        from upton_spark.operators.textops import inverted_index

        df = spark.createDataFrame(
            [(3, "b a a"), (1, "a c"), (2, "a b")],
            "doc_id long, text string",
        )
        rows = {
            (r["term"], r["shard"]): r for r in inverted_index(df).collect()
        }
        assert rows[("a", 0)]["postings"] == [1, 2, 3]
        assert rows[("a", 0)]["df"] == 3
        assert rows[("b", 0)]["postings"] == [2, 3]
        assert rows[("c", 0)]["postings"] == [1]

    def test_head_terms_shard_cold_terms_stay_whole(self, spark):
        from upton_spark.operators.textops import inverted_index

        # 'the' appears in all 40 docs, 'rare' in one
        df = spark.createDataFrame(
            [(i, "the" + (" rare" if i == 7 else "")) for i in range(40)],
            "doc_id long, text string",
        )
        out = inverted_index(df, shard_threshold=10, n_shards=4).collect()
        the_shards = sorted(r["shard"] for r in out if r["term"] == "the")
        assert the_shards == [0, 1, 2, 3]
        # shard membership is doc % n_shards, engine-portable
        for r in out:
            if r["term"] == "the":
                assert all(p % 4 == r["shard"] for p in r["postings"])
        assert sum(r["shard_docs"] for r in out if r["term"] == "the") == 40
        rare = [r for r in out if r["term"] == "rare"]
        assert len(rare) == 1 and rare[0]["shard"] == 0
