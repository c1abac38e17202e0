"""Salted host partitioning — the explicit skew control of SURVEY.md §4.1.

A 10^10-URL frontier is Zipfian by host: hash-partitioning on ``host`` alone
sends a hot host's entire row set to one partition (one task writes/scans
it, one executor OOMs on it). Salting spreads each host over
``ceil(host_rows / rows_per_bucket)`` sub-buckets — cold hosts keep salt 0
(no extra shuffle spread), hot hosts fan out proportionally to their size —
so partition sizes are bounded regardless of skew.

Division of labor with the rest of the engine:

* **storage & scan balance** — this module (frontier parquet writes, bulk
  per-row stages);
* **per-host ordering windows** (politeness ranking) — cannot be salted
  (row_number needs the whole host in one partition); they are protected by
  the token cap itself: admission bounds per-host work per round, so a hot
  host contributes at most ``tokens`` admitted rows per round;
* **joins** — AQE skew-join splitting (enabled in plans/session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_host_salt(
    df: DataFrame,
    rows_per_bucket: int = 100_000,
    host_col: str = "host",
    key_col: str = "url",
) -> DataFrame:
    """Add a ``host_salt`` column: 0 for hosts under ``rows_per_bucket``
    rows; hot hosts get ``pmod(xxhash64(key), n_buckets(host))`` with
    n_buckets proportional to the host's row count. One aggregation over the
    host column (tiny: |hosts| rows) broadcast back onto the rows."""
    buckets = (
        df.groupBy(host_col)
        .count()
        .select(
            host_col,
            F.greatest(
                F.lit(1), F.ceil(F.col("count") / F.lit(rows_per_bucket))
            ).cast("int").alias("_n_buckets"),
        )
    )
    return (
        df.join(F.broadcast(buckets), host_col, "left")
        .withColumn(
            "host_salt",
            F.pmod(F.xxhash64(F.col(key_col)), F.coalesce("_n_buckets", F.lit(1))).cast("int"),
        )
        .drop("_n_buckets")
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic output-shard id in ``[0, n_shards)`` from a row key:
    first 15 hex chars (60 bits — no int64 overflow) of ``md5(key)``,
    parsed and modded. md5, not xxhash64/murmur3, for the same reason as
    sampling.host_bucket_col — a shard layout must survive an engine swap
    bit-for-bit (the reader that consumes the shards may not be Spark).

    This is the write-path half of the scale story: a 100-TB corpus is
    emitted as N self-describing shards; ``df.repartition(n_shards,
    "shard").write.partitionBy("shard")`` gives one task and one file
    family per shard, and hash-of-key placement keeps shard sizes balanced
    regardless of ingest order (contrast range-partitioning, which inherits
    whatever skew the key distribution has). Map-only codegen — no
    shuffle here; the single exchange happens at write time."""
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(int(n_shards)),
    )
    return df.withColumn("shard", shard.cast("long"))


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    size_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest (the sidecar a sharded corpus ships with): row
    count, total payload size, and the key range per shard — what a
    downstream loader needs to plan reads without opening files, and what
    a balance monitor alerts on (max/min shard-size ratio). One
    groupBy(shard) over ``shard_assign`` output — a single
    ``n_shards``-row aggregate regardless of corpus size."""
    assigned = shard_assign(df, n_shards, key_col)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    ]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col).cast("long")).alias("total_size"))
    return assigned.groupBy("shard").agg(*aggs)


def salted_repartition(
    df: DataFrame,
    n_partitions: int,
    rows_per_bucket: int = 100_000,
    host_col: str = "host",
    key_col: str = "url",
) -> DataFrame:
    """Repartition by (host, host_salt): co-locates each host's sub-bucket
    while bounding any single partition's share of a hot host."""
    salted = with_host_salt(df, rows_per_bucket, host_col, key_col)
    return salted.repartition(n_partitions, F.col(host_col), F.col("host_salt")).drop(
        "host_salt"
    )
