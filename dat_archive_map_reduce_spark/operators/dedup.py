"""Deduplication operators for large-scale training-data pipelines.

Not in the reference (SURVEY.md §2.2 extensions); designed Spark-first
for 100 TB corpora:

- **exact**: hash-groupBy on content digest. One shuffle on a 16-byte
  key regardless of document size; keep-policy = min(id).
- **n-gram Jaccard**: shingle -> inverted-index self-join -> exact
  Jaccard. The join explodes only on *shared* shingles, so cost scales
  with actual overlap, not |docs|^2.
- **MinHash + LSH**: per-doc signature (vectorized numpy over Arrow
  batches), banded bucketing, candidate pairs only within equal
  (band, band-hash) buckets — the classic sub-quadratic near-dup path;
  candidates then verified with exact Jaccard.
- **SimHash**: 64-bit signature; Hamming-≤k pairs found via the
  pigeonhole band trick (split signature into k+1 chunks; any pair
  within distance k matches on ≥1 chunk) — again no full cross join.

All signatures are seeded and content-derived (zlib.crc32 / blake2)
so re-runs and retries are deterministic.
"""

from __future__ import annotations

import zlib
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# a large 32-bit prime for universal hashing
_MERSENNE = (1 << 61) - 1
_MAX32 = 1 << 32


# ---------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------

def content_digest(col: str | F.Column) -> F.Column:
    """Stable 128-bit content hash (md5 — same function exists in the
    SQL oracle). Hashing first means the dedup shuffle moves 16-byte
    keys, not document bodies."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the min-id representative of each exact-content group."""
    return (
        df.groupBy(content_digest(content_col).alias("digest"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------
# shingling + exact n-gram Jaccard
# ---------------------------------------------------------------------

def with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("tokens", F.split(F.lower(F.col(text_col)), " "))


def with_shingles(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per row, computed with native
    higher-order functions (no Python): transform over an index
    sequence + slice + concat_ws."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return df.withColumn("shingles", shingles)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold, via inverted-
    index join (only docs sharing >=1 shingle ever meet).

    Scale: the shuffle key is the shingle; hot shingles (stop-phrases)
    would skew — mitigated upstream by shingle length n>=3 and AQE skew
    handling. Output: (id_a, id_b, jaccard), id_a < id_b.
    """
    sh = with_shingles(df, text_col, n).select(
        F.col(id_col).alias("doc"), F.explode("shingles").alias("shingle")
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common.join(sa, F.col("id_a") == F.col("sa.doc"))
        .join(sb, F.col("id_b") == F.col("sb.doc"))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------

def _shingle_hashes(text: str, n: int) -> np.ndarray:
    toks = text.lower().split(" ")
    if len(toks) < n:
        grams = [" ".join(toks)]
    else:
        grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.uint64)


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, signature array<long>) — one MinHash signature per doc.

    Vectorized per Arrow batch: for each doc the permuted hash matrix is
    (num_perm x n_shingles) computed in one numpy broadcast; worker-side
    state is just the (a, b) coefficient vectors derived from the seed.
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("signature", T.ArrayType(T.LongType()), False),
        ]
    )

    def _sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                hs = _shingle_hashes(text, shingle_n)
                # (num_perm, n_shingles) universal hashes; min over shingles
                m = (a[:, None] * hs[None, :] + b[:, None]) % _MERSENNE
                sig = m.min(axis=1) % _MAX32
                ids.append(int(doc_id))
                sigs.append(sig.astype(np.int64).tolist())
            yield pd.DataFrame({"id": ids, "signature": sigs})

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        _sig_batches, schema=out_schema
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signatures and emit candidate pairs per equal bucket.

    rows-per-band r = num_perm/bands; two docs collide iff some band's
    r-slice matches exactly. The bucket join shuffles on
    (band, band_hash) — sub-quadratic, no cross join anywhere.
    """
    n_perm = len(signatures.select("signature").first()["signature"])
    r = n_perm // bands
    banded = signatures.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.hash(F.slice("signature", bi * r + 1, r)).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signature -> banded buckets
    -> candidate pairs -> exact-Jaccard verification (no false
    positives leave this operator; recall is the LSH S-curve)."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n)
    cands = lsh_candidate_pairs(sigs, bands)
    exact = ngram_jaccard_pairs(df, text_col, id_col, n=shingle_n, threshold=threshold)
    return cands.join(exact, ["id_a", "id_b"], "inner").select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------

def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per doc: sign of the token-hash bit-vote sum.

    Native-ish: token hashing uses xxhash64 JVM-side; the bit votes run
    in a vectorized pandas stage (numpy popcount-style unpacking).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    def _vote(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = int(pdf["id"].iloc[0])
        hs = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for i in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(i)
        return pd.DataFrame({"id": [doc_id], "simhash": [int(sig.astype(np.int64))]})

    return toks.groupBy("id").applyInPandas(_vote, schema=out_schema)


def simhash_near_pairs(signatures: DataFrame, max_distance: int = 3) -> DataFrame:
    """Pairs with Hamming distance <= max_distance via the pigeonhole
    band trick: split 64 bits into (max_distance+1) chunks; any
    qualifying pair agrees exactly on >=1 chunk, so candidates come
    from equal-chunk buckets only. Verification = bit_count(xor)."""
    n_chunks = max_distance + 1
    width = 64 // n_chunks
    # shiftrightunsigned needs a variable shift amount -> SQL expr form
    # (the Python API only accepts a literal int shift)
    chunks = F.expr(
        f"transform(sequence(0, {n_chunks - 1}), i -> struct("
        f"i as chunk, shiftrightunsigned(simhash, i * {width}) & {(1 << width) - 1} as val))"
    )
    banded = signatures.select("id", "simhash", F.explode(chunks).alias("c")).select(
        "id", "simhash", "c.chunk", "c.val"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )
