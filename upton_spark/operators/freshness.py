"""Change-rate estimation + freshness-driven re-crawl prioritization.

Why this exists: the reference crawls a site *once per run* (lib/upton.rb's
stash makes a second run a pure cache replay), so "when should I fetch this
url AGAIN?" is left to the operator deleting the stash directory. A
continuous 10^10-URL crawler has to answer it per-url: re-fetching a page
that never changes wastes the politeness budget the host grants us, while
ignoring a news index for a week makes the corpus stale. The public answer
is Cho & Garcia-Molina's Poisson model ("Estimating Frequency of Change",
ACM TOIT 2003): page changes arrive as a Poisson process with rate λ, and
an UNBIASED estimator from n visits that detected X changes over mean
inter-visit interval Ī is

    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / Ī

(the +0.5 terms are the paper's bias correction; the naive X/(n·Ī)
systematically under-estimates because two changes between visits count
once). Staleness of a page last seen ``age`` hours ago is then the
probability it changed since: ``1 - exp(-λ̂ · age)`` — exactly the quantity
a freshness-maximizing scheduler should sort on.

Division of labor with the rest of the engine:

* :func:`upton_spark.operators.webgraph.snapshot_diff` produces the
  per-generation changed/unchanged observations;
* :func:`upton_spark.operators.webgraph.revisit_intervals` is the simple
  exponential (halve/double) policy — integer-exact, zero history kept;
* THIS module is the model-based upgrade: it keeps the full observation
  history (n, X, span) per url and emits a continuous rate, which
  :func:`freshness_priorities` turns into the Crawler's ``url_priorities``
  table the same way pagerank/authority priorities do.

Scale shape: one groupBy(url) over the observation log (key-partitioned at
scale — same bucketing as the frontier, so the shuffle is the one the
frontier already pays), then map-only arithmetic. No UDF, no driver state,
no global sort: priorities are negated micro-quantized scores, not dense
ranks (see pagerank_priorities' rationale at webgraph.py:348).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def change_rate(
    obs: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    changed_col: str = "changed",
    min_obs: int = 2,
) -> DataFrame:
    """Per-key Poisson change-rate λ̂ (changes/hour) from an observation log.

    ``obs`` carries one row per fetch observation: key, observation
    timestamp, and a 0/1 ``changed`` flag (did the content hash differ
    from the previous fetch — snapshot_diff's ``status == 'changed'``).

    Output per key: ``n_obs``, ``n_changed``, ``span_hours`` (first→last
    observation), ``last_seen_epoch`` (seconds), ``lambda_per_hour`` —
    NULL when the history can't support an estimate (fewer than
    ``min_obs`` observations, or zero span): NULL-not-zero so the
    scheduler can tell "known static" (λ=0) from "never measured", which
    :func:`staleness_scores` deliberately treats as maximally stale.

    Epochs truncate to whole seconds (``unix_timestamp``) — the
    cross-engine contract (DuckDB's ``epoch()`` keeps microseconds;
    ``floor`` it when replaying).
    """
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    agg = obs.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col(changed_col).cast("long")).alias("n_changed"),
        F.min(epoch).alias("_first"),
        F.max(epoch).alias("last_seen_epoch"),
    )
    span_h = (F.col("last_seen_epoch") - F.col("_first")) / F.lit(3600.0)
    # mean inter-visit interval Ī = span / (n-1); guarded by min_obs >= 2
    ibar = span_h / (F.col("n_obs") - F.lit(1))
    lam = (
        -F.log(
            (F.col("n_obs") - F.col("n_changed") + F.lit(0.5))
            / (F.col("n_obs") + F.lit(0.5))
        )
        / ibar
    )
    return (
        agg.withColumn("span_hours", span_h)
        .withColumn(
            "lambda_per_hour",
            F.when(
                (F.col("n_obs") >= F.lit(int(min_obs))) & (span_h > 0), lam
            ),
        )
        .drop("_first")
    )


def staleness_col(lambda_col: Column, age_hours: Column) -> Column:
    """P(page changed since last fetch) = 1 - exp(-λ·age); NULL λ (no
    usable history) → 1.0: a page we know nothing about is scheduled like
    one that certainly changed — the explore arm of the explore/exploit
    split, and the behavior a fresh crawl needs (everything unknown →
    everything fetched)."""
    return F.when(
        lambda_col.isNull(), F.lit(1.0)
    ).otherwise(F.lit(1.0) - F.exp(-lambda_col * age_hours))


def staleness_scores(
    rates: DataFrame,
    asof_epoch_s: Column | int,
    key_col: str = "url",
) -> DataFrame:
    """change_rate output → per-key ``age_hours`` + ``staleness`` as of a
    fixed decision instant (pass the SAME asof to every partition — an
    injected literal or broadcast scalar, never the wall clock, so a
    resumed/re-run plan scores identically; the Crawler's injectable-clock
    convention)."""
    asof = asof_epoch_s if isinstance(asof_epoch_s, Column) else F.lit(int(asof_epoch_s))
    age = (asof - F.col("last_seen_epoch")) / F.lit(3600.0)
    return rates.select(
        key_col,
        "lambda_per_hour",
        age.alias("age_hours"),
        staleness_col(F.col("lambda_per_hour"), age).alias("staleness"),
    )


def freshness_priorities(
    scores: DataFrame,
    key_col: str = "url",
    score_col: str = "staleness",
) -> DataFrame:
    """Staleness scores → the Crawler's ``url_priorities`` table (url,
    priority:long), the freshness twin of pagerank_priorities /
    authority_priorities: NEGATED micro-quantized score, a monotone
    map-side transform (no global sort at web scale). Most-stale fetches
    first; ties keep the frontier's deterministic (seed_id,
    instance_index) tie-break."""
    return scores.select(
        F.col(key_col).alias("url"),
        (-F.round(F.col(score_col) * 1e6)).cast("long").alias("priority"),
    )
