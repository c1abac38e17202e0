"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct, exactly like ``pages.html``. The Spark-side plumbing —
schemas, Arrow batch shapes, ``mapInPandas`` signatures, partitioning — is
real and tested; the actual codec work is STUBBED behind
``decoder_available()`` because no image/audio libraries ship in this
container: with a decoder installed the deterministic fake in
``_fake_decode`` is replaced by the real one and nothing else changes.

Batch-shape contract: one input row per asset; decode/feature stages stream
``pd.DataFrame`` batches (never materialize a partition), so a 100 TB media
table flows at constant memory per task.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

MEDIA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)


def decoder_available() -> bool:
    """True when a real image decoder is importable (PIL etc.). This
    container ships none, so the pipeline runs the deterministic fake."""
    try:  # pragma: no cover - environment-dependent
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode(payload: bytes, out_hw: tuple[int, int]) -> np.ndarray:
    """Deterministic stand-in for decode+resize: expands an xorshift64*
    stream seeded from the payload into an (h, w) float grid in [0, 1].
    Same payload → same pixels, any size — keeps every downstream stage
    (resize, features, embedding) real and testable without a codec.

    Seed = little-endian uint64 of md5(lowercase-hex(payload)) digest bytes
    [8:16] — i.e. DuckDB's ``md5_number_lower(hex-string)`` — so the whole
    fake pipeline is replayable by a SQL oracle (a recursive CTE steps the
    same xorshift chain)."""
    h, w = out_hw
    n = h * w
    digest = hashlib.md5((payload or b"").hex().encode()).digest()
    seed = struct.unpack("<Q", digest[8:16])[0]
    # xorshift64* stream — cheap, deterministic, numpy-vectorizable
    out = np.empty(n, dtype=np.uint64)
    x = np.uint64(seed or 1)
    for i in range(n):
        x ^= x >> np.uint64(12)
        x ^= (x << np.uint64(25)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(27)
        out[i] = x
    return (out / np.float64(2**64)).reshape(h, w)


def decode_and_featurize(
    media: DataFrame, resize_to: tuple[int, int] = (8, 8), payload_col: str = "payload"
) -> DataFrame:
    """decode → resize → feature-extract as one mapInPandas stage.

    Output: asset_id, n_bytes, mean_intensity, std_intensity,
    feature ARRAY<FLOAT> (the flattened resized grid — the embedding input).
    Raises NotImplementedError from the decode step only if a real decoder
    is REQUIRED (env var UPTON_SPARK_REQUIRE_DECODER=1) but unavailable.
    """
    import os

    require_real = os.environ.get("UPTON_SPARK_REQUIRE_DECODER") == "1"
    if require_real and not decoder_available():
        raise NotImplementedError(
            "real media decoding requires an image library (PIL); not present in this container"
        )
    h, w = resize_to
    schema = (
        "asset_id long, n_bytes long, mean_intensity double, std_intensity double, "
        "feature array<float>"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                grid = _fake_decode(data, (h, w))
                rows.append(
                    (
                        int(asset_id),
                        len(data),
                        float(grid.mean()),
                        float(grid.std()),
                        grid.astype(np.float32).ravel().tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_bytes", "mean_intensity", "std_intensity", "feature"],
            )

    return media.select("asset_id", payload_col).mapInPandas(run, schema=schema)


def frame_sample(
    media: DataFrame, every_ms: int = 1000, payload_col: str = "payload"
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    offset (duration from meta), payload decode stubbed like above."""
    with_duration = media.select(
        "asset_id",
        payload_col,
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)).alias("duration_ms"),
    )
    frames = with_duration.withColumn(
        "frame_ms",
        F.explode(
            F.when(
                F.col("duration_ms") > 0,
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    return frames.select(
        "asset_id",
        "frame_ms",
        F.xxhash64(F.col(payload_col), F.col("frame_ms")).alias("frame_key"),
    )


def synth_media(spark, n_assets: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/benches. Payload bytes are
    md5-derived (16-byte digest repeated) so a SQL oracle can reconstruct
    them as repeat(md5('asset-' || i), k)."""
    rows = []
    for i in range(n_assets):
        payload = hashlib.md5(f"asset-{i}".encode()).digest() * (8 + 2 * (i % 5))
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                f"http://media.example.org/{kind}/{i}",
                payload,
                (kind, {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                 64 + i % 32, 48 + i % 16, 3000 + 100 * (i % 7)),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA)
