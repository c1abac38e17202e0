"""Vendored byte-level BPE tokenizer: drift pinning (committed merges ==
fresh retraining from the embedded seed corpus), encode/decode roundtrip
properties, the Spark Arrow path vs the pure-Python encoder, and the
chunk/pack operators running on real BPE ids (VERDICT-r3 item 6)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from upton_spark.functions.bpe import (
    SEED_CORPUS,
    VENDORED_MERGES,
    BPETokenizer,
    bytes_to_unicode,
    train_bpe,
    vendored_tokenizer,
)


def test_vendored_merges_match_retraining():
    """Drift pin: the committed table IS train_bpe(SEED_CORPUS, 384) —
    same contract as the vendored stdlib HTML regexes."""
    assert train_bpe(SEED_CORPUS, len(VENDORED_MERGES)) == VENDORED_MERGES
    assert len(VENDORED_MERGES) == 384


def test_bytes_to_unicode_is_reversible_and_total():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256  # injective -> reversible
    # printable latin-1 bytes map to themselves (the GPT-2 construction)
    assert m[ord("A")] == "A" and m[ord("~")] == "~"


def test_known_encoding_stable():
    tok = vendored_tokenizer()
    ids = tok.encode("The committee reported that revenue increased 12 percent.")
    assert tok.decode(ids) == "The committee reported that revenue increased 12 percent."
    # seed-corpus vocabulary compresses well below byte count
    assert len(ids) < len("The committee reported that revenue increased 12 percent.".encode())
    assert tok.encode("") == []


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_roundtrip_any_unicode(s):
    """encode→decode is lossless for ANY unicode text (byte-level base
    alphabet: nothing is out-of-vocabulary)."""
    tok = vendored_tokenizer()
    assert tok.decode(tok.encode(s)) == s


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120))
def test_merge_count_monotone(s):
    """More merges never increases token count on the same text."""
    t0 = BPETokenizer([])
    t1 = vendored_tokenizer()
    assert len(t1.encode(s)) <= len(t0.encode(s))


def test_spark_encode_matches_python(spark):
    """The Arrow-batched bpe_encode_col must equal the pure-Python encoder
    row for row (the oracle-side independence argument for the re-baked
    bpe_token_stats VALUES table)."""
    from upton_spark.operators.textops import bpe_encode_col

    texts = SEED_CORPUS + ["", "naïve café — 3.14", "a" * 300]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["ids"]
        for r in df.select("doc_id", bpe_encode_col(F.col("text")).alias("ids")).collect()
    }
    tok = vendored_tokenizer()
    for i, t in enumerate(texts):
        assert got[i] == tok.encode(t), i


def test_chunk_token_ids_covers_and_reconstructs(spark):
    """Chunking real BPE ids: stitching the first `stride` ids of every
    chunk (whole last chunk) rebuilds the original id sequence exactly —
    every token covered once at its stride position."""
    from upton_spark.operators.textops import bpe_encode_col, chunk_token_ids

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SEED_CORPUS)], "doc_id long, text string"
    ).select("doc_id", "text", bpe_encode_col(F.col("text")).alias("token_ids"))
    orig = {r["doc_id"]: r["token_ids"] for r in df.collect()}
    window, stride = 16, 12
    chunks = chunk_token_ids(df, window=window, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_ids"]))
    for d, parts in by_doc.items():
        parts.sort()
        rebuilt: list[int] = []
        for k, (cid, ids) in enumerate(parts):
            assert cid == k
            assert len(ids) <= window
            rebuilt.extend(ids if k == len(parts) - 1 else ids[:stride])
        assert rebuilt == orig[d], d
        # every chunk except the last is full-window unless the doc is short
        for _, ids in parts[:-1]:
            assert len(ids) == window


def test_pack_sequences_on_bpe_counts(spark):
    """Greedy packing with the budget unit = real BPE token counts: bins
    respect capacity (oversized docs alone), per-bin sums match a local
    replay of the same walk over the same counts."""
    from upton_spark.operators.sampling import pack_sequences
    from upton_spark.operators.textops import bpe_encode_col

    texts = SEED_CORPUS * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).withColumn("n_bpe", F.size(bpe_encode_col(F.col("text"))))
    counts = {r["doc_id"]: r["n_bpe"] for r in df.collect()}
    capacity, n_shards = 120, 4
    out = pack_sequences(
        df, capacity=capacity, n_shards=n_shards, count_col="n_bpe"
    ).collect()
    assert {r["doc_id"] for r in out} == set(counts)
    for r in out:
        assert r["n_tokens"] == counts[r["doc_id"]]
    # local replay of the documented greedy walk per shard
    for shard in range(n_shards):
        ids = sorted(d for d in counts if d % n_shards == shard)
        bins, cum, b = {}, 0, 0
        for d in ids:
            if cum > 0 and cum + counts[d] > capacity:
                b += 1
                cum = 0
            bins[d] = b
            cum += counts[d]
        got = {r["doc_id"]: r["bin_id"] for r in out if r["shard"] == shard}
        assert got == bins, shard
