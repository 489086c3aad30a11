"""Deduplication operators over the documents table.

Scale notes (the 100 TB story):
  * exact: hash-groupBy on the text (or its md5) — one shuffle keyed by
    fingerprint; AQE handles skew from boilerplate-heavy dup clusters.
  * MinHash+LSH: signatures are a narrow vectorized map; the only
    shuffle is the band-bucket groupBy, whose key space (band, hash)
    is uniform by construction — no skew.  Candidate verification is a
    bucket-local self-join, never all-pairs.
  * SimHash: 64-bit fingerprints; near-dup = same fingerprint band,
    identical mechanics to LSH.
  * n-gram Jaccard: exact verification on candidate pairs only.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# deterministic 64-bit mixing (same construction as sources/synthetic.py)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray, salt: int) -> np.ndarray:
    z = x + np.uint64((0x9E3779B97F4A7C15 * (salt + 1)) & 0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


# NOTE: python hash() of str is salted per process -> NOT deterministic
# across executors; shingle hashing uses a stable FNV-1a instead.


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _stable_shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    words = text.split()
    if len(words) < k:
        shingles = {" ".join(words)} if words else {""}
    else:
        shingles = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
    return np.fromiter((_fnv1a(s) for s in shingles), dtype=np.uint64, count=len(shingles))


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Texts appearing more than once — hash-groupBy, map-side partials."""
    return (
        docs.groupBy("text")
        .agg(F.count("*").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def distinct_doc_count(docs: DataFrame) -> DataFrame:
    return docs.agg(F.countDistinct("text").alias("distinct_docs"))


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, shingle_k: int = 3
) -> DataFrame:
    """(doc_id, sig: array<long>) — signature j = min over shingles of
    mix64(shingle_hash, j).  Vectorized: one (n_shingles x num_hashes)
    NumPy broadcast per document batch."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        salts = np.arange(num_hashes, dtype=np.uint64)
        for pdf in batches:
            sigs = []
            for t in pdf["text"]:
                sh = _stable_shingle_hashes(t or "", shingle_k)
                # broadcast mix: (n_shingles, num_hashes)
                mixed = _mix64(sh[:, None] + salts[None, :] * np.uint64(0x9E3779B9), 7)
                sigs.append(mixed.min(axis=0).view(np.int64).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    return docs.select("doc_id", "text").mapInPandas(fn, schema=schema)


def lsh_candidate_pairs(
    sig_df: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures, bucket-join within (band, bucket_hash).

    The self-join key (band, bucket) is high-entropy, so the shuffle is
    uniform; at cluster scale this is the standard LSH plan."""
    banded = sig_df.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Full MinHash pipeline: signatures -> LSH candidates -> verify by
    signature agreement >= threshold (estimate of Jaccard)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    joined = cands.join(sa, "doc_a").join(sb, "doc_b")
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        joined.withColumn("agree", agree)
        .where(F.col("agree") >= int(threshold * num_hashes))
        .select("doc_a", "doc_b", "agree")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over word-level features (vectorized sign-sum)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("simhash", T.LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = []
            for t in pdf["text"]:
                words = (t or "").split()
                if not words:
                    out.append(0)
                    continue
                hs = np.fromiter(
                    (_fnv1a(w) for w in words), dtype=np.uint64, count=len(words)
                )
                bits = (hs[:, None] >> bit_idx[None, :]) & np.uint64(1)
                votes = bits.sum(axis=0) * 2 > len(words)
                fp = np.uint64(0)
                fp = np.bitwise_or.reduce(
                    votes.astype(np.uint64) << bit_idx
                )
                out.append(int(fp.view(np.int64)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return docs.select("doc_id", "text").mapInPandas(fn, schema=schema)


# --------------------------------------------------------------------------
# n-gram / character Jaccard (exact verification path)
# --------------------------------------------------------------------------


def char_jaccard_adjacent(docs: DataFrame) -> DataFrame:
    """Character-set overlap of id-adjacent documents — integer-valued
    intersection/union sizes (exactly reproducible in the oracle)."""
    chars = F.array_distinct(F.split(F.col("text"), ""))
    d = docs.select("doc_id", chars.alias("chars"))
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("chars").alias("ca"))
    b = d.select((F.col("doc_id") - 1).alias("doc_a"), F.col("chars").alias("cb"),
                 F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ca", "cb")).cast("long").alias("inter_sz"),
            F.size(F.array_union("ca", "cb")).cast("long").alias("union_sz"),
        )
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5, k: int = 3) -> DataFrame:
    """Exact word-k-gram Jaccard over LSH candidates (verify stage)."""
    toks = F.split(F.col("text"), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )
    d = docs.select("doc_id", grams.alias("grams"))
    cands = lsh_candidate_pairs(minhash_signatures(docs), 16, 4)
    ga = d.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    gb = d.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return (
        cands.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("jaccard_pct", (inter * 100 / union).cast("long"))
        .where(F.col("jaccard_pct") >= int(threshold * 100))
        .select("doc_a", "doc_b", "jaccard_pct")
    )
