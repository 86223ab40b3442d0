"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (SURVEY.md §2.2 extensions): media travels as an opaque
``binary`` column with a typed metadata struct alongside — the Spark
pattern for 100 TB multimodal corpora (binaryFile source, partition by
content kind, never parse binary JVM-side). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages.

The actual codec step is STUBBED in this container (no PIL/ffmpeg):
``decode_media`` tries to import the real library and otherwise uses a
clearly-marked deterministic fake that parses this module's own synth
header format. The Spark-side plumbing — schema, batch shape, UDF
signatures, partitioning — is real and tested; swapping in a real
decoder changes only the marked inner function.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MAGIC = b"SGMM"  # synth-media header: MAGIC + u16 width + u16 height + u32 frames


def synth_media_corpus(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus: header + payload bytes.

    Stands in for spark.read.format('binaryFile') over an object store.
    Every field derives from md5 of the media id (byte k of the hex
    digest, written b(k) below), NOT from a numpy RNG: an oracle in any
    SQL engine with md5 can independently re-derive the metadata that
    gets packed into the binary header, which turns the decode
    pipeline's output into a hash-checkable roundtrip proof —
    encode -> binary column -> Arrow batch -> stub decode must return
    exactly the md5-derived values. ``seed`` is kept for API
    compatibility and ignored.

      w      = 8 + b(0) % 56             (8..63, as before)
      h      = 8 + b(1) % 56
      frames = 1 + b(2) % 29 (video; else 1)
      plen   = 64 + (b(3)*256 + b(4)) % 448   (64..511)
      payload[j] = digest16(id ':p')[j % 16]
    """
    import hashlib

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        hb = hashlib.md5(str(i).encode()).digest()
        w = 8 + hb[0] % 56
        h = 8 + hb[1] % 56
        frames = 1 + hb[2] % 29 if kind == "video" else 1
        plen = 64 + (hb[3] * 256 + hb[4]) % 448
        pbytes = hashlib.md5(f"{i}:p".encode()).digest()
        payload = (pbytes * (plen // 16 + 1))[:plen]
        content = _MAGIC + struct.pack("<HHI", w, h, frames) + payload
        meta = (
            w if kind != "audio" else None,
            h if kind != "audio" else None,
            16000 if kind == "audio" else None,
            frames if kind == "video" else None,
        )
        rows.append((i, kind, bytearray(content), meta))
    # slice count sized to the corpus, not the core count: 64 rows on
    # 32 default slices would spawn 32 python workers per UDF stage for
    # 2 rows each — pure overhead locally, and the same knob a real
    # binaryFile read gets from file splits
    n_slices = max(1, min(n // 8, spark.sparkContext.defaultParallelism))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), MEDIA_SCHEMA
    )


def _decode_header(content: bytes) -> tuple[int, int, int]:
    """STUB DECODER. A real build replaces this with PIL.Image.open /
    soundfile / pyav. Raises on non-synth bytes, like a real codec
    raises on corrupt input."""
    if bytes(content[:4]) != _MAGIC:
        raise NotImplementedError(
            "real codecs are unavailable in this container; only synth-media "
            "headers are decodable (see module docstring)"
        )
    w, h, frames = struct.unpack("<HHI", bytes(content[4:12]))
    return w, h, frames


def decode_media(media: DataFrame) -> DataFrame:
    """Decode stage: binary -> (dimensions, frame count, byte stats).

    Real Arrow-batched plumbing; the codec inner call is the stub.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("n_frames", T.IntegerType(), True),
            T.StructField("n_bytes", T.LongType(), False),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "width", "height", "n_frames", "n_bytes")}
            for mid, kind, content in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                w, h, frames = _decode_header(content)
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(frames)
                out["n_bytes"].append(len(content))
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "content").mapInPandas(_decode, schema=out_schema)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction stage: binary -> float vector.

    Deterministic stand-in for a vision/audio encoder: byte-histogram
    folded to `dim` buckets, L2-normalized. Output column shape matches
    what a real encoder would produce (array<float>), so downstream
    similarity ops (operators/similarity.py) compose unchanged.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = np.frombuffer(bytes(content[12:]), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                nrm = np.linalg.norm(hist)
                feats.append((hist / nrm if nrm else hist).astype(np.float32).tolist())
                ids.append(int(mid))
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media.select("media_id", "content").mapInPandas(_feat, schema=out_schema)


def frame_sample(media: DataFrame, every_nth: int = 5) -> DataFrame:
    """Frame-sampling stage for video rows: one output row per sampled
    frame index (1 -> N explode, like the map adapter's multi-emit)."""
    decoded = decode_media(media.filter(F.col("kind") == "video"))
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


def resize_plan(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize stage: computes target dims JVM-side (the pure-metadata
    part of resize); the pixel resample would live in the stubbed
    decode path. Demonstrates pushdown-friendly split of metadata math
    vs binary work."""
    decoded = decode_media(media.filter(F.col("kind") != "audio"))
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
    )
