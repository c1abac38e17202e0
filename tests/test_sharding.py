"""Output sharding (partitioning.shard_assign / shard_manifest): the
write-path planning primitive — deterministic, engine-portable, balanced."""

import hashlib

from pyspark.sql import functions as F

from upton_spark.operators.partitioning import shard_assign, shard_manifest


def _py_shard(key, n):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % n


def test_shard_assign_matches_md5_reference_and_range(spark):
    """Placement is the documented pure function of the key (first 60 bits
    of md5 mod n) — replayable outside Spark — and always in range."""
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    rows = shard_assign(df, 16, key_col="doc_id").collect()
    assert all(0 <= r["shard"] < 16 for r in rows)
    for r in rows:
        assert r["shard"] == _py_shard(r["doc_id"], 16), r


def test_shard_manifest_totals_and_balance(spark):
    """The manifest accounts for every row and byte exactly once, and
    hash placement keeps shards balanced on a uniform key set (each of 16
    shards within 2× of the mean for 2000 keys)."""
    df = (
        spark.range(0, 2000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("n_chars", (F.col("doc_id") % 100 + 1).cast("long"))
    )
    man = shard_manifest(df, 16, key_col="doc_id", size_col="n_chars").collect()
    assert len(man) == 16
    assert sum(r["n_rows"] for r in man) == 2000
    total = df.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["total_size"] for r in man) == total
    mean = 2000 / 16
    assert max(r["n_rows"] for r in man) <= 2 * mean
    assert min(r["n_rows"] for r in man) >= mean / 2
    for r in man:
        assert r["min_key"] <= r["max_key"]
