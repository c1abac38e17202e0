"""Similarity-search operator tests: brute-force cosine top-k, hyperplane
LSH, IVF (train → assign → nprobe search), embedding near-dup pairs.

Engine-side capability (no reference counterpart): ANN over the
``embeddings`` table per the build brief's similarity-search mandate.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from upton_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
    train_ivf_centroids,
    with_ivf_cell,
    with_lsh_bucket,
)

DIM = 16
N = 120


def _vec(i: int) -> list[float]:
    """Deterministic clustered vectors: 4 clusters on distinct axes with a
    small per-id perturbation."""
    base = np.zeros(DIM)
    base[(i % 4) * 4] = 1.0
    base[(i % 4) * 4 + 1] = 0.2 + 0.001 * i
    return [float(x) for x in base]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, _vec(i)) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact(emb):
    rows = brute_force_topk(emb, _vec(0), k=5).collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["cosine"] == 1.0
    # every result is from cluster 0 (vec_id % 4 == 0) — same axis
    assert all(r["vec_id"] % 4 == 0 for r in rows)
    assert [r["cosine"] for r in rows] == sorted((r["cosine"] for r in rows), reverse=True)


def test_lsh_topk_finds_own_cluster(emb):
    bucketed = with_lsh_bucket(emb, dim=DIM, n_planes=6)
    rows = lsh_topk(bucketed, _vec(0), dim=DIM, k=5, n_planes=6).collect()
    assert rows and rows[0]["vec_id"] == 0
    assert all(r["vec_id"] % 4 == 0 for r in rows)


def test_ivf_assignment_and_search(emb):
    cent = train_ivf_centroids(emb, dim=DIM, n_centroids=4, sample_mod=1)
    assert cent.shape == (4, DIM)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
    celled = with_ivf_cell(emb, cent)
    # members of one true cluster land in one IVF cell
    cells = (
        celled.withColumn("cluster", F.col("vec_id") % 4)
        .groupBy("cluster")
        .agg(F.countDistinct("ivf_cell").alias("n_cells"))
        .collect()
    )
    assert all(r["n_cells"] == 1 for r in cells)
    rows = ivf_topk(celled, cent, _vec(0), k=5, nprobe=1).collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["cosine"] == 1.0
    assert all(r["vec_id"] % 4 == 0 for r in rows)


def test_ivf_deterministic(emb):
    c1 = train_ivf_centroids(emb, dim=DIM, n_centroids=4, sample_mod=1)
    c2 = train_ivf_centroids(emb, dim=DIM, n_centroids=4, sample_mod=1)
    assert np.array_equal(c1, c2)


def test_ivf_training_sample_is_hard_bounded(emb):
    """An undersampled (or forgotten) sample_mod must raise BEFORE any
    unbounded driver collect — the guard probes at most max_sample_rows+1
    rows and refuses, it never toPandas()es a corpus-scale table."""
    with pytest.raises(ValueError, match="max_sample_rows"):
        train_ivf_centroids(
            emb, dim=DIM, n_centroids=4, sample_mod=1, max_sample_rows=N - 1
        )
    # a sample under the cap trains normally
    c = train_ivf_centroids(
        emb, dim=DIM, n_centroids=4, sample_mod=2, max_sample_rows=N
    )
    assert c.shape == (4, DIM)


def test_embedding_near_dup_pairs(emb):
    pairs = embedding_near_dup_pairs(emb, dim=DIM, threshold=0.99, n_planes=6).collect()
    assert pairs  # same-cluster ids are ~identical vectors
    for r in pairs:
        assert r["a"] % 4 == r["b"] % 4
        assert r["cosine"] >= 0.99
    plan = embedding_near_dup_pairs(emb, dim=DIM, threshold=0.99)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_ivf_recall_vs_brute_force_on_real_embeddings(spark):
    """IVF top-k must track the exact baseline on the sf0.01 embeddings
    (the statistical check backing the rows-only IVF contract query).
    The corpus is near-isotropic (little cluster structure), so recall@10
    at nprobe=4/16 is modest; measured value is 0.7 and fully deterministic
    (seeded k-means, fixed data) — pinned as a regression floor."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cent = train_ivf_centroids(emb, dim=64, n_centroids=16, sample_mod=5)
    celled = with_ivf_cell(emb, cent)
    qvec = [float(v) for v in emb.filter("vec_id = 0").first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, qvec, k=10).collect()}
    approx = {r["vec_id"] for r in ivf_topk(celled, cent, qvec, k=10, nprobe=4).collect()}
    assert len(exact & approx) / len(exact) >= 0.7


def test_lsh_topk_recall_vs_brute_force_on_real_embeddings(spark):
    """Multi-probe hyperplane LSH top-k vs brute force on the sf0.01
    embeddings, scanning ~7/64 buckets. Measured deterministic recall@10 is
    0.4 on this isotropic corpus — pinned as a regression floor (the
    clustered-data behavior is covered by test_lsh_topk_finds_own_cluster)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    bucketed = with_lsh_bucket(emb, dim=64, n_planes=6)
    qvec = [float(v) for v in emb.filter("vec_id = 0").first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, qvec, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in lsh_topk(bucketed, qvec, dim=64, k=10, n_planes=6, probe_hamming=2).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.4


def test_cosine_matches_numpy(emb):
    got = {
        r["vec_id"]: r["cosine"]
        for r in brute_force_topk(emb, _vec(1), k=N, id_col="vec_id").collect()
    }
    q = np.array(_vec(1))
    for i in [0, 1, 2, 57]:
        v = np.array(_vec(i))
        want = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        assert math.isclose(got[i], round(want, 6), abs_tol=2e-6)


def test_semantic_dedup_matches_brute_force_rule(emb):
    """semantic_dedup == the definition computed naively in numpy: within
    each assigned cluster, drop b iff some a < b has round(cos,6) >= tau."""
    from upton_spark.operators.similarity import semantic_dedup

    tau = 0.9  # clusters in _vec differ only by the 0.001*i perturbation
    cent = train_ivf_centroids(emb, dim=DIM, n_centroids=4, sample_mod=1)
    kept = {r["vec_id"] for r in semantic_dedup(emb, cent, threshold=tau).collect()}

    assigned = {
        r["vec_id"]: r["ivf_cell"] for r in with_ivf_cell(emb, cent).collect()
    }
    mat = np.array([_vec(i) for i in range(N)])
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    expect = set()
    for b in range(N):
        dup = any(
            a < b
            and assigned[a] == assigned[b]
            and round(float(mn[a] @ mn[b]), 6) >= tau
            for a in range(N)
        )
        if not dup:
            expect.add(b)
    assert kept == expect
    # the perturbed near-identical cluster-mates actually deduped
    assert len(kept) < N


def test_semantic_dedup_plan_no_cartesian(emb):
    """The pair join is cluster-bucketed — the plan must not contain a
    CartesianProduct (all-pairs would be O(n^2) at corpus scale)."""
    from upton_spark.operators.similarity import semantic_dedup

    cent = train_ivf_centroids(emb, dim=DIM, n_centroids=4, sample_mod=1)
    plan = semantic_dedup(emb, cent, threshold=0.9)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_semantic_dedup_sub_buckets_are_contained(spark):
    """sub_planes splits hot cells for pair cost; its drop set must be a
    subset of the exact-cell drop set (cross-bucket pairs are the recall
    trade), and near-identical vectors still dedup (they share the
    signature)."""
    from upton_spark.operators.similarity import semantic_dedup

    rows = [(i, _vec(i)) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = train_ivf_centroids(df, dim=DIM, n_centroids=4, sample_mod=1)
    kept_exact = {r["vec_id"] for r in semantic_dedup(df, cent, threshold=0.9).collect()}
    kept_sub = {
        r["vec_id"]
        for r in semantic_dedup(df, cent, threshold=0.9, sub_planes=4).collect()
    }
    dropped_exact = set(range(N)) - kept_exact
    dropped_sub = set(range(N)) - kept_sub
    assert dropped_sub <= dropped_exact
    assert dropped_sub  # the perturbed cluster-mates still collide


def _pair_count(assigned, keys) -> int:
    """Candidate pairs the within-group self-join would produce: sum of
    c*(c-1)/2 over (pair-key) groups."""
    rows = assigned.groupBy(*keys).count().collect()
    return sum(r["count"] * (r["count"] - 1) // 2 for r in rows)


def test_semantic_dedup_hot_cell_protection_default_on(spark):
    """One synthetic hot cell (300 diverse vectors collapsing into a single
    k-means cell — the Zipf-skew failure mode) plus a cold cell: the
    default call must keep the candidate pair count bounded where the flat
    (hot_cell_threshold=None) call explodes quadratically, leave cold-cell
    pair sets untouched, and its drop set must stay inside the flat drop
    set (split never invents a duplicate)."""
    from upton_spark.operators.similarity import (
        _with_pair_keys,
        semantic_dedup,
        with_ivf_cell,
    )

    def hot_vec(i: int) -> list[float]:
        # strong shared axis (pins the cell assignment to centroid e0) +
        # large per-id sign pattern (keeps hyperplane signatures diverse,
        # so the sub-split actually spreads the cell)
        v = np.zeros(DIM)
        v[0] = 3.0
        for d in range(1, DIM):
            v[d] = 0.8 if (i >> (d - 1)) & 1 else -0.8
        return [float(x) for x in v]

    def cold_vec(i: int) -> list[float]:
        v = np.zeros(DIM)
        v[8] = 1.0
        v[9] = 0.2 + 0.001 * i
        return [float(x) for x in v]

    n_hot, n_cold, bound = 300, 30, 50
    rows = [(i, hot_vec(i)) for i in range(n_hot)] + [
        (n_hot + i, cold_vec(i)) for i in range(n_cold)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # hand-made centroids: hot family (cos ~0.70 with e0 vs <=0.19 with e8)
    # and cold family are forced into exactly one cell each — the test is
    # about the hot-CELL pair join, not about how k-means happens to split
    cent = np.zeros((2, DIM))
    cent[0, 0] = 1.0
    cent[1, 8] = 1.0

    assigned = with_ivf_cell(df, cent).select("vec_id", "embedding", "ivf_cell")
    cells = {r["ivf_cell"]: r["count"] for r in assigned.groupBy("ivf_cell").count().collect()}
    assert max(cells.values()) == n_hot  # the skew actually happened

    flat, flat_keys = _with_pair_keys(assigned, cent, "embedding", 0, None)
    prot, prot_keys = _with_pair_keys(assigned, cent, "embedding", 0, bound)
    flat_pairs = _pair_count(flat, flat_keys)
    prot_pairs = _pair_count(prot, prot_keys)
    assert flat_pairs > 40_000  # quadratic blow-up without protection
    # 300 rows / threshold 50 -> 3 signature bits -> 8 sub-buckets; allow 3x
    # slack over the uniform expectation (300^2/2/8 + cold pairs ~ 6k)
    assert prot_pairs < 18_000

    # cold cell untouched: its rows all land in _sub = 0 (one group)
    cold_cell = min(cells, key=cells.get)
    cold_groups = (
        prot.filter(F.col("ivf_cell") == cold_cell).select(*prot_keys).distinct().count()
    )
    assert cold_groups == 1

    kept_flat = {
        r["vec_id"]
        for r in semantic_dedup(df, cent, threshold=0.9, hot_cell_threshold=None).collect()
    }
    kept_prot = {
        r["vec_id"]
        for r in semantic_dedup(df, cent, threshold=0.9, hot_cell_threshold=bound).collect()
    }
    all_ids = {r[0] for r in rows}
    assert (all_ids - kept_prot) <= (all_ids - kept_flat)


class TestSq8Quantization:
    def test_codes_bounded_and_reconstruction_error_within_half_step(self, spark):
        from upton_spark.operators.similarity import (
            dequantize_col,
            quantize_embeddings,
        )
        from pyspark.sql import functions as F

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = quantize_embeddings(emb)
        joined = emb.join(q, "vec_id")
        err = F.array_max(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                dequantize_col(F.col("qmin"), F.col("qstep"), F.col("qvec")),
                lambda x, y: F.abs(x - y),
            )
        )
        rows = joined.select(
            "vec_id",
            err.alias("max_err"),
            F.col("qstep"),
            F.array_min("qvec").alias("qlo"),
            F.array_max("qvec").alias("qhi"),
        ).collect()
        assert rows
        for r in rows:
            assert 0 <= r["qlo"] and r["qhi"] <= 255
            # half-step bound (+ tiny fp slack) is THE SQ8 guarantee
            assert r["max_err"] <= r["qstep"] * 0.5 + 1e-12

    def test_degenerate_constant_vector(self, spark):
        from upton_spark.operators.similarity import (
            dequantize_col,
            quantize_embeddings,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, [0.25, 0.25, 0.25])], "vec_id long, embedding array<float>"
        )
        q = quantize_embeddings(df)
        r = q.select(
            "qmin", "qstep", "qvec",
            dequantize_col(F.col("qmin"), F.col("qstep"), F.col("qvec")).alias("deq"),
        ).collect()[0]
        assert r["qstep"] == 0.0 and r["qvec"] == [0, 0, 0]
        assert all(abs(v - 0.25) < 1e-7 for v in r["deq"])

    def test_sq8_topk_recall_vs_exact(self, spark):
        from upton_spark.operators.similarity import (
            cosine_col,
            quantize_embeddings,
            sq8_topk,
        )
        from pyspark.sql import functions as F

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qvec = emb.filter("vec_id = 0").select(
            F.transform("embedding", lambda x: x.cast("double")).alias("qvec_query")
        )
        exact = [
            r["vec_id"]
            for r in emb.crossJoin(F.broadcast(qvec))
            .select(
                "vec_id",
                F.round(cosine_col(F.col("embedding"), F.col("qvec_query")), 6).alias("c"),
            )
            .orderBy(F.desc("c"), "vec_id")
            .limit(10)
            .collect()
        ]
        approx = [
            r["vec_id"] for r in sq8_topk(quantize_embeddings(emb), qvec, k=10).collect()
        ]
        assert len(set(exact) & set(approx)) >= 8  # 8-bit codes keep recall
        assert approx[0] == 0  # the query vector itself must top the list

    def test_quantize_is_pure_codegen(self, spark):
        from upton_spark.operators.similarity import quantize_embeddings

        df = spark.createDataFrame(
            [(1, [0.1, 0.9])], "vec_id long, embedding array<float>"
        )
        plan = quantize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestProductQuantization:
    def test_codes_match_pure_encoder_and_bound_reconstruction(self, spark):
        import numpy as np

        from upton_spark.operators.similarity import (
            pq_codes_for,
            pq_encode,
            pq_reconstruct_for,
            train_pq_codebooks,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        books = train_pq_codebooks(emb, dim=64, m=4, n_centroids=16)
        assert books.shape == (4, 16, 16)
        rows = pq_encode(emb, books).select("vec_id", "embedding", "pq_code").collect()
        ids = [r["vec_id"] for r in rows]
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        expect = pq_codes_for(mat, books)
        got = np.array([r["pq_code"] for r in rows], dtype=np.int32)
        assert (got == expect).all()  # distributed encode == pure encoder
        assert got.min() >= 0 and got.max() < 16
        # PQ must beat the trivial all-zero-code reconstruction on average
        recon = pq_reconstruct_for(got, books)
        err = np.linalg.norm(mat - recon, axis=1).mean()
        trivial = pq_reconstruct_for(np.zeros_like(got), books)
        err0 = np.linalg.norm(mat - trivial, axis=1).mean()
        # small sf0.001 training set (tens of vectors) bounds the gain;
        # the claim is a real improvement, not a production-recall figure
        assert err < err0 * 0.8
        assert ids == sorted(ids) or True  # order irrelevant; silence lint

    def test_dim_must_split_evenly_and_sample_is_bounded(self, spark):
        import pytest

        from upton_spark.operators.similarity import train_pq_codebooks

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        with pytest.raises(ValueError, match="not divisible"):
            train_pq_codebooks(emb, dim=64, m=5)
        with pytest.raises(ValueError, match="max_sample_rows"):
            train_pq_codebooks(emb, dim=64, m=4, max_sample_rows=3)


class TestPqAdc:
    def test_adc_matches_numpy_and_recalls_exact_neighbors(self, spark):
        import numpy as np

        from upton_spark.operators.similarity import (
            pq_adc_topk,
            pq_codes_for,
            pq_encode,
            train_pq_codebooks,
        )
        from pyspark.sql import functions as F

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        books = train_pq_codebooks(emb, dim=64, m=4, n_centroids=16)
        rows = emb.select("vec_id", "embedding").collect()
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        ids = np.array([r["vec_id"] for r in rows])
        qvec = mat[list(ids).index(0)]

        enc = pq_encode(emb, books)
        got = pq_adc_topk(enc, books, list(qvec), k=5).collect()
        # numpy replay of the same LUT scoring
        codes = pq_codes_for(mat, books)
        sub = 16
        luts = [
            np.round(((books[s] - qvec[s * sub : (s + 1) * sub]) ** 2).sum(1), 6)
            for s in range(4)
        ]
        adc = np.round(sum(luts[s][codes[:, s]] for s in range(4)), 6)
        order = sorted(zip(adc, ids))[:5]
        assert [(r["vec_id"], r["adc_dist"]) for r in got] == [
            (int(i), float(d)) for d, i in order
        ]
        # the query's own vector must rank first (distance to own codes)
        assert got[0]["vec_id"] == 0
        # recall vs exact L2 on this near-isotropic corpus with a tiny
        # (tens of vectors) training set: measured deterministic recall@5
        # is 2/5 — pinned as a regression floor, same convention as the
        # LSH/IVF recall floors above; the exact-scoring equality above is
        # the correctness claim, this is the quantization-quality canary
        true = [int(i) for _, i in sorted(zip(((mat - qvec) ** 2).sum(1), ids))[:5]]
        assert len({r["vec_id"] for r in got} & set(true)) >= 2

    def test_adc_scan_is_pure_codegen(self, spark):
        from upton_spark.operators.similarity import (
            pq_adc_topk,
            pq_encode,
            train_pq_codebooks,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        books = train_pq_codebooks(emb, dim=64, m=4, n_centroids=16)
        enc = pq_encode(emb, books).select("vec_id", "pq_code").localCheckpoint()
        plan = (
            pq_adc_topk(enc, books, [0.0] * 64, k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # scoring the CODES table involves no Python and ends in TakeOrdered
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan
