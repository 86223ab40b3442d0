"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (SURVEY.md §2.2 extensions): media travels as an opaque
``binary`` column with a typed metadata struct alongside — the Spark
pattern for 100 TB multimodal corpora (binaryFile source, partition by
content kind, never parse binary JVM-side). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages.

Codecs: uncompressed public formats decode FOR REAL — binary PPM
(netpbm P6) and RIFF/WAVE PCM16 have genuine pure-numpy
encoders/decoders here (header grammar, chunk walking, payload
parse), proven end-to-end by the ``multimodal_real_decode`` oracle
query whose stats are recomputed from the parsed arrays. Compressed
formats (JPEG/PNG/MP4) still need codec libraries this container
does not ship, so only they raise NotImplementedError; the
deterministic synth-header format remains for the original roundtrip
oracle tests. The Spark-side plumbing — schema, batch shape, UDF
signatures, partitioning — is shared by all paths.
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


# ---------------------------------------------------------------------
# REAL codecs for uncompressed public formats (pure numpy/stdlib — no
# PIL/ffmpeg needed): binary PPM (P6, the netpbm image format) and
# RIFF/WAVE PCM. These are genuine end-to-end decoders — header
# grammar, chunk walking, payload parsing — not stand-ins; the
# NotImplementedError below remains only for formats this container
# truly cannot decode (JPEG/PNG/MP4 need external codec libraries).
# ---------------------------------------------------------------------


def encode_ppm(width: int, height: int, pixels: np.ndarray) -> bytes:
    """Binary PPM (P6): ``P6\\n<w> <h>\\n255\\n`` + raw RGB bytes."""
    px = np.asarray(pixels, dtype=np.uint8).reshape(-1)
    if px.size != 3 * width * height:
        raise ValueError(f"need {3 * width * height} RGB bytes, got {px.size}")
    return f"P6\n{width} {height}\n255\n".encode() + px.tobytes()


def decode_ppm(content: bytes) -> "tuple[int, int, int, np.ndarray]":
    """Parse a binary PPM: returns (width, height, maxval, pixels).
    Full header grammar — tokens separated by any whitespace, ``#``
    comments running to end-of-line anywhere between tokens — then
    exactly 3*w*h bytes of raw RGB after the single whitespace byte
    that terminates maxval."""
    buf = bytes(content)
    if buf[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) stream")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if not 0 < maxval <= 255:
        # netpbm allows maxval up to 65535, which switches samples to
        # 2 bytes big-endian — silently reading such a file as 8-bit
        # would return wrong pixels with no error; reject like any
        # unsupported-variant codec does
        raise ValueError(f"unsupported PPM maxval {maxval} (16-bit samples)")
    n = 3 * w * h
    if len(buf) - pos < n:
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos)
    return w, h, maxval, px


def encode_wav(sample_rate: int, samples: np.ndarray, n_channels: int = 1) -> bytes:
    """RIFF/WAVE, PCM16 little-endian."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes) -> "tuple[int, int, np.ndarray]":
    """Parse RIFF/WAVE PCM16: returns (sample_rate, n_channels,
    samples int16). Walks the chunk list properly (skipping unknown
    chunks, honoring the odd-size pad byte), so files with LIST/cue
    chunks decode too."""
    buf = bytes(content)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sample_rate = n_channels = bits = None
    samples = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) != size:
            # a declared chunk size past the end of the buffer is a
            # truncated transfer — slicing would silently shorten the
            # sample array; fail like decode_ppm does for cut pixels
            raise ValueError(
                f"truncated WAV chunk {cid!r}: declared {size} bytes, "
                f"{len(body)} available"
            )
        if cid == b"fmt ":
            codec, n_channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if codec != 1 or bits != 16:
                raise ValueError(f"only PCM16 supported (codec={codec}, bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks pad to even length
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, n_channels, samples


def _decode_header(content: bytes) -> tuple[int, int, int]:
    """Format dispatch for the metadata decode: synth headers, real
    binary PPM, and real RIFF/WAVE parse end-to-end; the raise remains
    only for formats that genuinely need external codec libraries
    (JPEG/PNG/MP4). For audio, ``frames`` is the PCM frame count
    (samples per channel — the audio meaning of the word)."""
    head = bytes(content[:4])
    if head == _MAGIC:
        w, h, frames = struct.unpack("<HHI", bytes(content[4:12]))
        return w, h, frames
    if head[:2] == b"P6":
        w, h, _, _ = decode_ppm(content)
        return w, h, 1
    if head == b"RIFF":
        _, n_ch, samples = decode_wav(content)
        return 0, 0, len(samples) // max(n_ch, 1)
    raise NotImplementedError(
        "compressed formats (JPEG/PNG/MP4) need codec libraries this "
        "container does not ship; PPM, WAV, and synth headers decode here"
    )


def real_media_corpus(spark: SparkSession, n: int = 32) -> DataFrame:
    """Corpus of REAL format bytes (binary PPM images and PCM16 WAV
    audio), with every parameter and payload value md5-derived so a
    SQL oracle re-derives the decoded stats arithmetically — the same
    roundtrip-proof recipe as synth_media_corpus, now through genuine
    format encoders and decoders instead of a made-up header. Even
    ids are images, odd ids are audio:

      b(k)   = byte k of md5(str(i))
      image: w = 8 + b(0) % 24, h = 8 + b(1) % 24,
             pixel[j] = (i + 3*j) % 256          (j in 0..3wh-1)
      audio: sr = 8000 + 100 * (b(0) % 80), nsamp = 64 + b(1) % 192,
             sample[t] = ((i*31 + t*7) % 256) - 128
    """
    import hashlib

    rows = []
    for i in range(n):
        hb = hashlib.md5(str(i).encode()).digest()
        if i % 2 == 0:
            w = 8 + hb[0] % 24
            h = 8 + hb[1] % 24
            px = (np.int64(i) + 3 * np.arange(3 * w * h, dtype=np.int64)) % 256
            content = encode_ppm(w, h, px.astype(np.uint8))
            rows.append((i, "image", bytearray(content), (w, h, None, None)))
        else:
            sr = 8000 + 100 * (hb[0] % 80)
            nsamp = 64 + hb[1] % 192
            t = np.arange(nsamp, dtype=np.int64)
            samples = ((np.int64(i) * 31 + t * 7) % 256) - 128
            content = encode_wav(sr, samples.astype(np.int16))
            rows.append((i, "audio", bytearray(content), (None, None, sr, None)))
    n_slices = max(1, min(n // 8, spark.sparkContext.defaultParallelism))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), MEDIA_SCHEMA
    )


def decode_media_stats(media: DataFrame) -> DataFrame:
    """Full-payload decode stage over real formats: every stat below
    comes from the PARSED arrays (pixels / PCM samples), never from
    the generator's formulas — matching the md5-arithmetic oracle is
    therefore a proof the header grammar, chunk walk, and payload
    parse are all correct. Arrow-batched like decode_media."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_vals", T.LongType(), False),
            T.StructField("val_sum", T.LongType(), False),
            T.StructField("val_first", T.IntegerType(), False),
            T.StructField("val_last", T.IntegerType(), False),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "kind", "width", "height", "sample_rate",
                "n_vals", "val_sum", "val_first", "val_last",
            )}
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                head = bytes(content[:2])
                if head == b"P6":
                    w, h, _, vals = decode_ppm(content)
                    width, height, sr = w, h, None
                elif bytes(content[:4]) == b"RIFF":
                    sr, _, vals = decode_wav(content)
                    width = height = None
                else:
                    raise NotImplementedError("real formats only")
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["width"].append(width)
                out["height"].append(height)
                out["sample_rate"].append(sr)
                out["n_vals"].append(int(vals.size))
                out["val_sum"].append(int(vals.astype(np.int64).sum()))
                out["val_first"].append(int(vals[0]))
                out["val_last"].append(int(vals[-1]))
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "content").mapInPandas(
        _decode, schema=out_schema
    )


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
