"""Similarity search over embedding columns (ARRAY<FLOAT>).

Baseline: brute-force cosine top-k entirely in codegen
(``F.zip_with`` + ``F.aggregate`` dot products — no Python in the scan).
Scale path: random-hyperplane LSH bucketing so the scan only scores the
query's bucket neighborhood (IVF-style would swap the bucketer for k-means
centroids; the plumbing is identical).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. The per-row score
    is whole-stage-codegen; top-k is a TakeOrdered (no full sort)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 13) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def with_lsh_bucket(
    embeddings: DataFrame, dim: int, n_planes: int = 12, vec_col: str = "embedding", seed: int = 13
) -> DataFrame:
    """Random-hyperplane signature → integer bucket (Charikar SimHash for
    vectors). One vectorized matmul per Arrow batch."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.IntegerType())
    def bucket(vec: pd.Series) -> pd.Series:
        mat = np.array(vec.tolist(), dtype=np.float64)
        signs = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((signs @ weights).astype(np.int32))

    return embeddings.withColumn("lsh_bucket", bucket(F.col(vec_col)))


def lsh_topk(
    embeddings_with_bucket: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: score only rows whose bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe LSH)."""
    planes = _hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qsig = int(((q @ planes.T) > 0) @ (1 << np.arange(n_planes)))
    probes = {qsig}
    if probe_hamming >= 1:
        probes |= {qsig ^ (1 << b) for b in range(n_planes)}
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        embeddings_with_bucket.filter(F.col("lsh_bucket").isin([int(p) for p in probes]))
        .select(F.col(id_col), F.round(cosine_col(F.col(vec_col), qcol), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
