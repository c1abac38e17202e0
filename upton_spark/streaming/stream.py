"""Structured Streaming surface over the crawl dataflow (SURVEY.md §2.9).

The batch round loop is the primary execution mode (determinism + snapshot
resume are easier to prove); this module provides the optional streaming
mapping recorded in the survey:

* ``pages_stream``      — readStream over a pages directory (the frontier
  as an unbounded arrival of captures).
* ``streaming_extract`` — the same Arrow extraction UDFs applied to a
  stream (stateless transform: identical code path as batch).
* ``windowed_crawl_metrics`` — watermarked tumbling-window counts per host
  (late captures tolerated up to the watermark).
* ``token_bucket_stateful`` — per-host politeness as
  ``applyInPandasWithState``: token-bucket state keyed by host, admitting
  up to ``tokens_per_trigger`` rows per micro-batch and deferring the rest
  by emitting them with ``admitted = false``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from upton_spark import schemas
from upton_spark.functions.udfs import extract_text_udf, host_col


def pages_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_extract(stream: DataFrame, selector: str) -> DataFrame:
    return stream.select(
        "url",
        "warc_ts",
        extract_text_udf(F.col("html"), F.lit(selector)).alias("text"),
    )


def windowed_crawl_metrics(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    return (
        stream.withColumn("host", host_col(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "host")
        .agg(F.count("*").alias("pages"), F.sum(F.length("html")).alias("bytes"))
    )


_STATE_SCHEMA = "tokens long"
_OUT_SCHEMA = "host string, url string, admitted boolean"


def _token_bucket_fn(tokens_per_trigger: int):
    def fn(key, pdfs, state: GroupState):
        (host,) = key
        if state.exists:
            (tokens,) = state.get
        else:
            tokens = 0
        tokens += tokens_per_trigger  # refill per trigger
        for pdf in pdfs:
            # vectorized: the first `tokens` rows of the trigger admit, the
            # rest defer — one arange comparison per Arrow batch, no per-row
            # Python (position-in-batch < remaining budget ≡ the row loop)
            k = min(tokens, len(pdf))
            tokens -= k
            yield pd.DataFrame(
                {
                    "host": host,
                    "url": pdf["url"].to_numpy(),
                    "admitted": np.arange(len(pdf)) < k,
                }
            )
        state.update((min(tokens, tokens_per_trigger),))  # cap carryover

    return fn


def token_bucket_stateful(stream: DataFrame, tokens_per_trigger: int = 2) -> DataFrame:
    """Per-host token bucket as custom stateful streaming op
    (applyInPandasWithState) — the streaming twin of
    operators.politeness.admit_per_host."""
    with_host = stream.withColumn("host", host_col(F.col("url"))).select("host", "url")
    return with_host.groupBy("host").applyInPandasWithState(
        _token_bucket_fn(tokens_per_trigger),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_url_dedup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming frontier dedup: keep the first capture of each url within
    the watermark horizon (``dropDuplicates`` keyed on url + event time —
    state expires with the watermark, so memory is bounded by the horizon's
    url arrival rate, not the crawl's lifetime). The batch crawl's
    Bloom+anti-join seen-set is the durable cross-run dedup; this is the
    intra-stream guard in front of it."""
    return stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )
