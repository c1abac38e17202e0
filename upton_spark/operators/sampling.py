"""Deterministic corpus sampling / mixing for training-data pipelines.

A 100-TB pre-training pipeline samples and re-weights its corpus
constantly (per-language rates, per-source mixing weights), and the
sampling must be REPRODUCIBLE: the same doc keeps or drops regardless of
partitioning, retries, cluster size, or engine (``df.sample`` is none of
those — it's seeded per-partition, so a repartition changes the sample).
Hash-based sampling fixes this: the keep/drop decision is a pure integer
function of the document key, identical on Spark and in the DuckDB
oracle, stable under resume/backfill, and trivially invertible for audits
("why is doc X in the sample?").

Everything is built-in integer arithmetic — whole-stage codegen, no UDFs,
no RNG state — and exact (no floats), so the oracle matches bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# Knuth multiplicative constant + a prime offset; the bucket space is
# 10^4, so rates have 0.01% resolution.
_MULT = 2654435761
_OFFSET = 104729
_BUCKETS = 10_000


def sample_bucket_col(key: Column) -> Column:
    """Deterministic bucket in [0, 10000) from an integer key — the
    keep/drop decision is ``bucket < rate * 10000``.

    Computed as ``pmod(pmod(key, B) * MULT + OFFSET, B)``: reducing the key
    mod B FIRST is mathematically identical to ``(key*MULT+OFFSET) mod B``
    (mod distributes over the multiply-add) but the intermediate product is
    bounded by B*MULT ~ 2.7e13, so ANY int64 key — e.g. 64-bit hash-derived
    doc ids — buckets exactly, with no overflow (which under ANSI Spark
    would throw, and under non-ANSI would wrap to a sign-preserving ``%``
    result of a NEGATIVE bucket, i.e. silently always-keep). ``pmod`` keeps
    negative keys' residues non-negative, matching the arithmetic the
    oracle replays."""
    return F.pmod(F.pmod(key.cast("long"), F.lit(_BUCKETS)) * _MULT + _OFFSET, F.lit(_BUCKETS))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its key's bucket falls under its stratum's rate —
    e.g. ``rates={"en": 0.5, "zh": 1.0}`` keeps ~50% of English and all
    Chinese docs, deterministically. One codegen'd filter, no shuffle; a
    repartition, resume, or engine swap yields the SAME sample."""
    bucket = sample_bucket_col(F.col(key_col))
    # thresholds resolve to exact integers DRIVER-side: 0.3*10000 is
    # 2999.9999999999995 in IEEE — casting that per-row would keep/drop
    # differently than a decimal engine. int(round()) once, here, is the
    # single source of truth both engines compare against.
    thr = F.lit(int(round(float(default_rate) * _BUCKETS)))
    for stratum, r in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(float(r) * _BUCKETS)))
        ).otherwise(thr)
    return df.filter(bucket < thr)


def host_bucket_col(host: Column) -> Column:
    """Deterministic bucket in [0, 10000) from a STRING key, cross-engine
    exact: the first 15 hex chars (60 bits — fits a signed int64 with no
    overflow anywhere) of md5(host) parsed as an integer, mod 10000.
    DuckDB replays it verbatim as
    ``CAST(('0x' || substr(md5(host),1,15)) AS BIGINT) % 10000``. md5, not
    xxhash64/murmur3: those are engine-specific, and a split assignment
    must survive an engine swap bit-for-bit."""
    return F.pmod(
        F.conv(F.substring(F.md5(host), 1, 15), 16, 10).cast("long"),
        F.lit(_BUCKETS),
    )


def host_disjoint_split(
    df: DataFrame,
    fracs: dict[str, float],
    host_col: str = "host",
) -> DataFrame:
    """Train/val/test assignment that is HOST-DISJOINT by construction:
    ``split`` is a pure function of the host string (md5 bucket vs
    cumulative fraction thresholds), so every page of a host — and its
    near-duplicates, boilerplate siblings, and templated variants, which
    overwhelmingly live on the SAME host — lands in the same split. A
    row-level random split leaks: half a site's templated pages in train,
    half in val, and the eval set is contaminated with what are
    effectively training documents.

    ``fracs``: ordered {split_name: fraction}; fractions over buckets are
    cumulative, thresholds resolve to exact integers driver-side (the
    stratified_sample IEEE lesson). Map-only codegen — no shuffle, no
    Python; repartition/resume/engine-swap yield the same assignment.
    Realized fractions converge at corpus scale (hosts are the unit)."""
    total = sum(float(v) for v in fracs.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = host_bucket_col(F.col(host_col))
    expr = None
    cum = 0.0
    names = list(fracs)
    for name in names[:-1]:
        cum += float(fracs[name])
        thr = F.lit(int(round(cum * _BUCKETS)))
        expr = F.when(bucket < thr, name) if expr is None else expr.when(bucket < thr, name)
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def mixing_report(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Audit view of a stratified sample: per stratum, total rows, kept
    rows, and the realized rate (vs the requested one). The realized rate
    converges to the requested rate at corpus scale; at small N the exact
    hash decision is still reproducible — which is the property under
    test."""
    kept = stratified_sample(df, rates, strata_col, key_col, default_rate)
    totals = df.groupBy(strata_col).agg(F.count("*").cast("long").alias("n_total"))
    kept_n = kept.groupBy(strata_col).agg(F.count("*").cast("long").alias("n_kept"))
    return (
        totals.join(kept_n, strata_col, "left")
        .select(
            strata_col,
            "n_total",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.round(
                F.coalesce("n_kept", F.lit(0)) / F.col("n_total"), 4
            ).alias("realized_rate"),
        )
    )


def pack_sequences(
    df: DataFrame,
    capacity: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
) -> DataFrame:
    """Greedy sequential sequence packing: within each shard (id mod
    n_shards), walk documents in id order and start a new bin whenever
    adding the next document would exceed ``capacity`` tokens (a document
    larger than capacity still gets a bin to itself — greedy first-doc
    always places). Returns (id, shard, bin_id, n_tokens).

    Packing is inherently sequential PER SHARD (each decision depends on
    the running total), so the stateful walk runs as one applyInPandas per
    shard — embarrassingly parallel across shards, which is exactly how a
    100-TB packing job shards: thousands of independent shard walks, no
    cross-shard coordination. The per-row loop inside the walk is O(docs
    per shard) driver-free Python — the sequential dependency is the
    algorithm, not an implementation shortcut.

    ``count_col`` overrides the budget unit: pass a precomputed token-count
    column (e.g. size(bpe_encode_col(text)) — real BPE ids, what a trainer
    actually bins by) instead of the whitespace token_count_col default."""
    from upton_spark.operators.textops import token_count_col

    n_tokens = (
        F.col(count_col) if count_col is not None else token_count_col(F.col(text_col))
    )
    base = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        n_tokens.cast("long").alias("n_tokens"),
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, cum, b = [], 0, 0
        for tok in pdf["n_tokens"]:
            # a non-empty bin closes when the next doc would overflow it; an
            # empty bin (cum == 0) always accepts, so oversized docs get a
            # bin to themselves without an infinite split
            if cum > 0 and cum + tok > capacity:
                b += 1
                cum = 0
            bins.append(b)
            cum += tok
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[[id_col, "shard", "bin_id", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(
        walk, schema=f"{id_col} long, shard int, bin_id long, n_tokens long"
    )


def _hashed_gram_buckets(
    df: DataFrame, n_buckets: int, text_col: str, id_col: str, extra_cols: list[str]
) -> DataFrame:
    """(id, extra..., bucket) — one row per unigram AND bigram occurrence,
    bucketed by md5_number_lower(gram) % n_buckets (the DuckDB-replayable
    64-bit hash every signature op here uses). Arrow-batched; the token
    hash is memoized per batch (webtext vocabulary repeats heavily)."""
    import hashlib

    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(text: pd.Series) -> pd.Series:
        cache: dict = {}

        def h(g: str) -> int:
            v = cache.get(g)
            if v is None:
                v = (
                    int.from_bytes(hashlib.md5(g.encode()).digest()[8:16], "little")
                    % n_buckets
                )
                cache[g] = v
            return v

        out = []
        for t in text:
            toks = (t or "").split()
            grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            out.append([h(g) for g in grams])
        return pd.Series(out)

    return df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.explode(buckets(F.col(text_col))).alias("bucket"),
    )


def dsir_weights(
    df: DataFrame,
    target_filter: Column,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    public): hashed unigram+bigram bag-of-ngrams models of the TARGET
    distribution (rows matching ``target_filter``) and the RAW corpus;
    each document scores sum over its grams of
    log p_target(bucket) - log p_raw(bucket), add-1 smoothed. High scores
    = documents that look like the target — resample by weight to select
    pre-training data.

    100-TB shape: one explode + one bucket-count aggregation whose result
    is O(n_buckets) rows HOWEVER big the corpus — that bounded model state
    is collected, the log-ratios computed once driver-side (so both Spark
    and a SQL oracle join against the SAME literal doubles — JVM and
    engine libm ln() differ in the last ulp, which flips rounded terms),
    and broadcast-joined back onto the gram stream for the per-doc sum.
    No all-pairs anything.

    Returns (id, n_grams, dsir_logweight)."""
    tagged = df.withColumn("_target", target_filter)
    grams = _hashed_gram_buckets(tagged, n_buckets, text_col, id_col, ["_target"])
    counts = (
        grams.groupBy("bucket")
        .agg(
            F.count("*").alias("raw_c"),
            F.sum(F.col("_target").cast("long")).alias("tgt_c"),
        )
        .collect()
    )
    lw_rows = dsir_bucket_logweights(
        {r["bucket"]: (r["raw_c"], r["tgt_c"]) for r in counts}, n_buckets
    )
    weights = df.sparkSession.createDataFrame(lw_rows, "bucket int, lw_micro long")
    return (
        grams.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            # exact integer sum, ONE float division at the end — no
            # accumulation-order sensitivity, engine-independent
            (F.sum("lw_micro") / F.lit(1_000_000.0)).alias("dsir_logweight"),
        )
    )


def lm_nll_scores(
    df: DataFrame,
    ref_filter: Column,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020, public): each
    document's average negative log-likelihood under a hashed
    unigram+bigram bag model trained on the REFERENCE slice (rows matching
    ``ref_filter`` — CCNet uses a Wikipedia-trained LM; the bag-of-hashed-
    grams model stands in with the same selection semantics). Lower
    avg_nll = more reference-like; CCNet buckets a corpus into head/middle/
    tail on exactly this score (avg NLL = log perplexity for this model).

    Same 100-TB shape as :func:`dsir_weights`: one explode + one bucket
    aggregation whose result is O(n_buckets) rows regardless of corpus
    size, NLL terms computed once driver-side in integer micro-units (one
    libm — cross-engine exact sums), broadcast back onto the gram stream.
    Unseen buckets take the add-1 floor probability. Returns
    (id, n_grams, avg_nll)."""
    tagged = df.withColumn("_ref", ref_filter)
    grams = _hashed_gram_buckets(tagged, n_buckets, text_col, id_col, ["_ref"])
    counts = (
        grams.filter(F.col("_ref"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    nll_rows, default_micro = lm_bucket_nll_micros(
        {r["bucket"]: r["c"] for r in counts}, n_buckets
    )
    model = df.sparkSession.createDataFrame(nll_rows, "bucket int, nll_micro long")
    return (
        grams.join(F.broadcast(model), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            # exact integer sum; ONE float division at the end
            F.round(
                F.sum(F.coalesce("nll_micro", F.lit(default_micro)))
                / (F.count("*") * F.lit(1_000_000.0)),
                6,
            ).alias("avg_nll"),
        )
    )


def lm_bucket_nll_micros(
    counts: dict[int, int], n_buckets: int
) -> tuple[list[tuple[int, int]], int]:
    """((bucket, 10^6 x -log p(bucket)) rows, default micro-NLL for unseen
    buckets) from reference-slice bucket counts, add-1 smoothed. One libm
    (CPython's) computes every term; both engines sum exact integers."""
    import math

    n_total = sum(counts.values())
    denom = n_total + float(n_buckets)
    rows = [
        (int(b), round(-math.log((c + 1.0) / denom) * 1_000_000))
        for b, c in sorted(counts.items())
    ]
    return rows, round(-math.log(1.0 / denom) * 1_000_000)


def dsir_bucket_logweights(
    counts: dict[int, tuple[int, int]], n_buckets: int
) -> list[tuple[int, int]]:
    """(bucket, 10^6 x (log p_target - log p_raw)) from
    {bucket: (raw_c, tgt_c)}, add-1 smoothed, as INTEGER micro-units: one
    libm (CPython's) computes every weight, and both the Spark plan and the
    generated oracle sum exact integers (order-insensitive) with a single
    float division at the end."""
    import math

    n_raw = sum(rc for rc, _ in counts.values())
    n_tgt = sum(tc for _, tc in counts.values())
    return [
        (
            int(b),
            round(
                (
                    math.log((tc + 1.0) / (n_tgt + float(n_buckets)))
                    - math.log((rc + 1.0) / (n_raw + float(n_buckets)))
                )
                * 1_000_000
            ),
        )
        for b, (rc, tc) in sorted(counts.items())
    ]
