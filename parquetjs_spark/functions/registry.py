"""Driver-contract queries/oracles for the training-data operators
(dedup, similarity, text analysis, multimodal plumbing)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --- text ---------------------------------------------------------------


def q_doc_token_counts(spark, sf_dir):
    from . import text

    return text.token_counts(_docs(spark, sf_dir))


def q_doc_quality(spark, sf_dir):
    from . import text

    return text.quality_metrics(_docs(spark, sf_dir))


def q_doc_token_counts_bpe(spark, sf_dir):
    from . import text

    return text.token_counts_bpe(_docs(spark, sf_dir))


# (q_doc_fingerprints folded round 6: md5(text) per doc is computed —
# through the full encode pipeline — by rt_flba_digest's oracle on the
# SAME column; text.fingerprints stays pytest-covered.  Freed row funds
# the oracle-green normalize_text row.)


def q_normalize_text(spark, sf_dir):
    """Text canonicalization (lower / whitespace-collapse / trim) — the
    pass that precedes exact dedup.  Pure JVM built-ins with a direct
    SQL oracle (driver evidence for the round-5 pytest-only op)."""
    from . import text

    return text.normalize_text(_docs(spark, sf_dir)).select("doc_id", "text")


def q_sample_corpus_split(spark, sf_dir):
    """Deterministic hash-mod corpus split, driver-checked via its core
    invariant: sample(30%) and its complement — evaluated as two
    INDEPENDENT distributed jobs — must exactly partition the corpus
    (union multiset-equals all doc_ids; a rand()-based sampler would
    both drop and duplicate rows across two evaluations and fail the
    value hash).  Rate accuracy and seed separation stay pytest-pinned
    (the bucket hash itself is xxhash64, not SQL)."""
    from . import text

    docs = _docs(spark, sf_dir)
    s = text.sample_corpus(docs, 30).select("doc_id")
    c = text.sample_corpus(docs, 30, complement=True).select("doc_id")
    return s.unionByName(c)


def q_corpus_token_freq(spark, sf_dir):
    """Corpus-level token frequency table (tokenizer-training first
    pass): explode -> groupBy(token) -> count with map-side partials.
    Fully SQL-expressible — GROUP BY count over the same whitespace
    split (driver evidence for the round-5 pytest-only op)."""
    from . import text

    return text.corpus_token_frequencies(_docs(spark, sf_dir))


def q_doc_lang_id(spark, sf_dir):
    from . import text

    return text.language_id(_docs(spark, sf_dir))


def q_doc_rolling_fp_seeded(spark, sf_dir):
    """Rolling-fingerprint determinism made SQL-checkable: the hash
    itself (xxhash64 tokens + polynomial combine) is not SQL, but
    identical content MUST yield identical fingerprints regardless of
    partition/batch placement — so over the seeded corpus, every
    (i, i+10M) exact-dup pair must agree on rfp.  Emitting exactly the
    agreeing planted pairs gives a constant-by-construction oracle
    (upgrades round-4's rows-only doc_rolling_fp row)."""
    from pyspark.sql import functions as F

    from . import text

    fps = text.rolling_fingerprint(_seeded_docs(spark, sf_dir))
    a = fps.select(F.col("doc_id").alias("doc_a"), F.col("rfp").alias("fp_a"))
    b = fps.select(F.col("doc_id").alias("doc_b"), F.col("rfp").alias("fp_b"))
    return (
        a.where((F.col("doc_a") % 10 == 0) & (F.col("doc_a") < 10_000_000))
        .join(b, F.col("doc_b") == F.col("doc_a") + 10_000_000)
        .where(F.col("fp_a") == F.col("fp_b"))
        .select("doc_a", "doc_b")
    )


# --- dedup ----------------------------------------------------------------


def _seeded_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + deterministic duplicate/near-duplicate clusters.

    The raw fixture has no duplicate texts, which left the dedup operators
    vacuously green (0 == 0).  Seed exact dups (every 10th doc repeated
    under a new id) and near-dups (every 7th doc with one word appended)
    so exact/MinHash/LSH paths return non-trivial rows.  The construction
    is pure SQL, so DuckDB oracles can reproduce it."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    exact = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    near = docs.where(F.col("doc_id") % 7 == 3).select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended")).alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


_SEEDED_ORACLE_SRC = (
    "(SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0 "
    "UNION ALL SELECT doc_id + 20000000 AS doc_id, text || ' appended' AS text "
    "FROM documents WHERE doc_id % 7 = 3)"
)


def q_exact_dup_groups_seeded(spark, sf_dir):
    from . import dedup

    return dedup.exact_dup_groups(_seeded_docs(spark, sf_dir))


def q_minhash_dedup_pairs_seeded(spark, sf_dir):
    """MinHash+LSH pipeline recall on the seeded exact dups: identical
    texts have identical signatures, collide in every band, and agree on
    all 64 hashes — so the (i, i+10M) slice of the pair output is
    SQL-predictable (agree == 64) even though the hashing itself is not
    SQL.  Near-dup pairs (data-dependent agree) stay covered by the full
    operator pytests.  doc_a must be an ORIGINAL id (< 10M): for
    i = 10 mod 70 the exact-dup (i+10M) and near-dup (i+20M) ALSO
    differ by exactly 10M, so the diff filter alone over-admits."""
    from pyspark.sql import functions as F

    from . import dedup

    pairs = dedup.minhash_dedup_pairs(_seeded_docs(spark, sf_dir))
    return pairs.where(
        (F.col("doc_a") < 10_000_000)
        & (F.col("doc_b") - F.col("doc_a") == 10_000_000)
    ).select("doc_a", "doc_b", "agree")


def q_dup_clusters_seeded(spark, sf_dir):
    """Connected-component cluster resolution over exact-duplicate pairs
    (SQL-reproducible: pairs come from a text self-join, so the DuckDB
    oracle can rebuild the same clusters with a window MIN)."""
    from pyspark.sql import functions as F

    from . import dedup

    docs = _seeded_docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("doc_a"), "text")
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("t2"))
    pairs = a.join(b, (a.text == b.t2) & (a.doc_a < b.doc_b)).select(
        "doc_a", "doc_b"
    )
    return dedup.dup_clusters(pairs)


# (q_distinct_doc_count folded round 6: COUNT(DISTINCT text) is the
# same groupBy-text plan exact_dup_groups_seeded already verifies;
# q_char_jaccard_adjacent folded round 6: the set-intersection/union
# Jaccard math is verified by ngram_jaccard_pairs over n-gram sets.
# Both operators stay pytest-covered; freed rows fund the planted
# decode_images/decode_audios rows below.)


def q_simhash_fingerprints(spark, sf_dir):
    from . import dedup

    return dedup.simhash_fingerprints(_docs(spark, sf_dir))


def q_dedup_paragraphs_seeded(spark, sf_dir):
    """Cross-doc duplicate-paragraph removal on a seeded paragraph
    corpus (the raw fixture has no newlines): each doc becomes three
    paragraphs — its own text, its 50-block leader's text (shared by
    the whole block, the boilerplate analogue), and a short unique
    tail.  After the scrub, the shared paragraph survives only in the
    block leader (where it is ALSO the leader's first paragraph, so the
    leader keeps one copy and drops its own duplicate), and short tails
    survive everywhere.  Pure-SQL construction -> exact DuckDB oracle."""
    from pyspark.sql import functions as F

    from . import dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    blocks = docs.select(
        F.col("doc_id").alias("bid"), F.col("text").alias("btext")
    )
    seeded = (
        docs.withColumn("bid", F.col("doc_id") - F.col("doc_id") % 50)
        .join(blocks, "bid")
        .select(
            "doc_id",
            F.concat_ws(
                "\n\n",
                F.col("text"),
                F.col("btext"),
                F.concat(F.lit("tail "), F.col("doc_id").cast("string")),
            ).alias("text"),
        )
    )
    return dedup.remove_duplicate_paragraphs(seeded)


def q_ngram_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard verification over the SEEDED candidate set (exact
    dups at 100, one-word-appended near-dups just under): the verify
    math is the production operator's; the LSH candidacy (not SQL) is
    separately evidenced by minhash_dedup_pairs_seeded."""
    from pyspark.sql import functions as F

    from . import dedup

    docs = _seeded_docs(spark, sf_dir)
    orig = docs.where(F.col("doc_id") < 10_000_000)
    exact = orig.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 10_000_000).alias("doc_b"),
    )
    near = orig.where(F.col("doc_id") % 7 == 3).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 20_000_000).alias("doc_b"),
    )
    return dedup.ngram_jaccard_pairs(
        docs, threshold=0.3, pairs=exact.unionByName(near)
    )


# --- similarity -------------------------------------------------------------


def q_emb_topk_vec0(spark, sf_dir):
    from . import similarity

    return similarity.topk_for_id(_embs(spark, sf_dir), query_id=0, k=10)


def _seeded_embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings + planted exact-duplicate vectors (vec_id + 10M, same
    embedding) for vec_ids 0..2 — the ANN analogue of _seeded_docs.  An
    identical vector hashes to the query's own LSH bucket and argmaxes
    to the query's own IVF cell, so the planted duplicate is ALWAYS a
    candidate and always re-ranks at cosine 1.0 — an invariant that is
    SQL-predictable even though the bucketing is not."""
    from pyspark.sql import functions as F

    embs = _embs(spark, sf_dir).select("vec_id", "embedding")
    dups = embs.where(F.col("vec_id") < 3).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "embedding"
    )
    return embs.unionByName(dups)


def _planted_dup_rows(topk_fn, spark, sf_dir) -> DataFrame:
    """Run an ANN top-k for query ids 0..2 over the seeded table and
    keep only the planted-duplicate hit per query: present iff the
    duplicate survived candidacy + re-rank, score_u exactly 1000000.

    Deliberately one full top-k PER query (3 signature/assignment
    passes at oracle scale, where the table is tiny): the invariant is
    true top-k MEMBERSHIP, which pre-filtering to the planted ids
    would no longer test.  A production many-query workload shares one
    pass via the ``sigs=`` / ``ivf_assign`` caller-managed-persist
    APIs instead (see lsh_topk_for_id's docstring)."""
    from functools import reduce

    from pyspark.sql import functions as F

    embs = _seeded_embs(spark, sf_dir)
    outs = []
    for qid in (0, 1, 2):
        topk = topk_fn(embs, qid)
        outs.append(
            topk.where(F.col("vec_id") == qid + 10_000_000).select(
                F.lit(qid).cast("long").alias("query_id"),
                F.col("vec_id").alias("dup_id"),
                "score_u",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def q_emb_lsh_planted_dup(spark, sf_dir):
    """Multi-probe LSH ANN driver evidence (upgrades round-4's
    rows-only emb_lsh_topk_vec0): planted exact-dup vectors must appear
    in their query's top-k with score_u = 1000000.  Candidate recall on
    non-identical neighbors stays covered by the recall pytest."""
    from . import similarity

    return _planted_dup_rows(
        lambda embs, qid: similarity.lsh_topk_for_id(embs, query_id=qid, k=5),
        spark,
        sf_dir,
    )


def q_emb_ivf_planted_dup(spark, sf_dir):
    """IVF-flat ANN driver evidence (upgrades rows-only
    emb_ivf_topk_vec0) — same planted-duplicate invariant: the dup's
    cell is the query's own argmax cell, always probed first."""
    from . import similarity

    return _planted_dup_rows(
        lambda embs, qid: similarity.ivf_topk_for_id(embs, query_id=qid, k=5),
        spark,
        sf_dir,
    )


def q_simhash_near_dup_seeded(spark, sf_dir):
    """Seeded exact dups must all surface at Hamming 0: every (i, i+10M)
    pair must land in the same connected component of the simhash pair
    graph.  The pair SET itself is star-reduced within identical-
    fingerprint groups (simhash_near_dup_pairs docstring) and simhash
    collisions between unrelated short docs can re-root a star, so the
    SQL-stable invariant is CLUSTER connectivity, not the literal pair
    list: emit the seeded pairs whose endpoints share a cluster — all
    50 iff recall holds.  (Demo machinery dropped:
    emb_near_dup_topk_candidates' bucket-join is the same plan shape as
    emb_near_dup_pairs'.)"""
    from pyspark.sql import functions as F

    from . import dedup

    docs = _seeded_docs(spark, sf_dir)
    pairs = dedup.simhash_near_dup_pairs(docs)
    labels = dedup.dup_clusters(pairs.where(F.col("hamming") == 0))
    seeded = docs.where(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 10_000_000)
    ).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 10_000_000).alias("doc_b"),
    )
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb")
    )
    return (
        seeded.join(la, "doc_a")
        .join(lb, "doc_b")
        .where(F.col("ca") == F.col("cb"))
        .select("doc_a", "doc_b")
    )


def q_dedup_keep_canonical_seeded(spark, sf_dir):
    """End-of-pipeline dedup: drop every duplicate except its cluster's
    minimum-id representative.  Pairs come from the SQL-reproducible
    exact-text self-join, so the kept-id set has a window-MIN oracle."""
    from pyspark.sql import functions as F

    from . import dedup

    docs = _seeded_docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("doc_a"), "text")
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("t2"))
    pairs = a.join(b, (a.text == b.t2) & (a.doc_a < b.doc_b)).select(
        "doc_a", "doc_b"
    )
    return dedup.dedup_keep_canonical(docs, pairs).select("doc_id")


def q_emb_near_dup_pairs(spark, sf_dir):
    from . import similarity

    # production cutoff (0.95): expected EMPTY on this synthetic data —
    # the operator's real contract, kept honest alongside the demo above
    return similarity.embedding_near_dup_pairs(_embs(spark, sf_dir))


def q_emb_quantize_roundtrip(spark, sf_dir):
    """int8 quantize -> dequantize, projected to hashable scalars:
    per-vector scale, first quantized value, vector length, and the
    dequantized first element after the float32 storage round-trip.
    All pure float64/float32 IEEE arithmetic, so DuckDB reproduces it
    bit-exact (folds the round-4 pytest-only quantization op into the
    driver window)."""
    from pyspark.sql import functions as F

    from . import similarity

    q = similarity.quantize_embeddings_int8(_embs(spark, sf_dir))
    d = similarity.dequantize_embeddings(q)
    qs = q.select(
        "vec_id",
        "scale",
        F.element_at("qvec", 1).cast("long").alias("q0"),
        F.size("qvec").alias("n_q"),
    )
    ds = d.select(
        "vec_id", F.element_at("embedding", 1).cast("double").alias("d0")
    )
    return qs.join(ds, "vec_id")


# --- multimodal --------------------------------------------------------------


def q_media_metadata(spark, sf_dir):
    from . import multimodal

    return multimodal.extract_metadata(multimodal.as_media_table(_docs(spark, sf_dir)))


def q_media_resize(spark, sf_dir):
    from pyspark.sql import functions as F

    from . import multimodal

    out = multimodal.resize_images(multimodal.as_media_table(_docs(spark, sf_dir)))
    # hashable scalar projection (payload md5 + dims)
    return out.select(
        "doc_id", F.md5("payload").alias("pixels_md5"), "width", "height"
    )


# (q_media_frame_sample folded round 6: the byte-slice stand-in kernel
# and the 1->n fan-out shape stay pytest-covered; the REAL media decode
# paths get the two planted rows below instead — stronger evidence for
# the same mapInPandas plumbing at 1/4 the row count.)


# WAV header for the planted-audio row: every byte < 0x80 by
# construction (rate 4096 -> byte_rate 8192, both NUL-padded powers of
# two), so the whole payload round-trips through a Spark UTF-8 encode()
# of an ASCII string — buildable per-row in pure SQL, hence
# DuckDB-reproducible.  8 mono samples, 16-bit PCM.
_WAV_HEADER = (
    b"RIFF" + (52).to_bytes(4, "little") + b"WAVE"
    + b"fmt " + (16).to_bytes(4, "little")
    + (1).to_bytes(2, "little")      # PCM
    + (1).to_bytes(2, "little")      # mono
    + (4096).to_bytes(4, "little")   # sample rate
    + (8192).to_bytes(4, "little")   # byte rate
    + (2).to_bytes(2, "little")      # block align
    + (16).to_bytes(2, "little")     # bits per sample
    + b"data" + (16).to_bytes(4, "little")
).decode("ascii")
assert all(ord(ch) < 0x80 for ch in _WAV_HEADER)


def q_decode_images_planted(spark, sf_dir):
    """REAL image decode, driver-checked (upgrades the round-5
    pytest-only decode_images): each doc gets a pure-SQL-constructed
    2x2 PPM(P6) payload whose 12 pixel bytes are chr(65 + doc_id % 26)
    — so the decoded dims, decoded flag and pixel md5 are all
    constants-by-construction that DuckDB rebuilds from doc_id alone.
    The payload goes through the same Arrow-batched mapInPandas decode
    stage real image bytes would.

    Round 6 adds a PNG arm: the same 2x2 letter image wrapped as a real
    zlib-deflated PNG (26 distinct payloads built driver-side with
    encode_png, broadcast-joined on doc_id % 26).  The decode OUTPUT —
    dims, decoded flag, pixel md5 — is byte-identical to the PPM arm's
    constants, so the oracle stays pure SQL while the driver row
    exercises the inflate + unfilter path distributed."""
    import numpy as np
    from pyspark.sql import functions as F

    from . import multimodal

    docs = _docs(spark, sf_dir)
    ppm = docs.select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("P6\n2 2\n255\n"),
                F.expr("repeat(char(65 + doc_id % 26), 12)"),
            ),
            "UTF-8",
        ).alias("payload"),
    )
    png_payloads = spark.createDataFrame(
        [
            (
                i,
                bytearray(
                    multimodal.encode_png(
                        np.full((2, 2, 3), 65 + i, dtype=np.uint8)
                    )
                ),
            )
            for i in range(26)
        ],
        "letter_idx int, payload binary",
    )
    png = (
        docs.select(
            "doc_id", (F.col("doc_id") % 26).cast("int").alias("letter_idx")
        )
        .join(F.broadcast(png_payloads), "letter_idx")
        .select("doc_id", "payload")
    )
    out = multimodal.decode_images(ppm).withColumn(
        "fmt", F.lit("ppm")
    ).unionByName(
        multimodal.decode_images(png).withColumn("fmt", F.lit("png"))
    )
    return out.select(
        "doc_id", "fmt", "height", "width", "decoded",
        F.md5("pixels").alias("pixels_md5"),
    )


def q_decode_audios_planted(spark, sf_dir):
    """REAL audio decode, driver-checked (upgrades the round-5
    pytest-only decode_audios): a pure-SQL RIFF/WAVE 16-bit PCM payload
    (all-ASCII header above + 16 PCM bytes of chr(65 + doc_id % 26),
    i.e. 8 mono samples of value c*257) runs through the distributed
    RIFF chunk walk; sample count, channels, rate, decoded flag and the
    PCM md5 are constants-by-construction."""
    from pyspark.sql import functions as F

    from . import multimodal

    media = _docs(spark, sf_dir).select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit(_WAV_HEADER),
                F.expr("repeat(char(65 + doc_id % 26), 16)"),
            ),
            "UTF-8",
        ).alias("payload"),
    )
    out = multimodal.decode_audios(media)
    return out.select(
        "doc_id", "n_samples", "channels", "sample_rate", "decoded",
        F.md5("pcm").alias("pcm_md5"),
    )


def q_media_features(spark, sf_dir):
    from pyspark.sql import functions as F

    from . import multimodal

    # project the float vector to hashable scalars (the driver's
    # canonicalizer cannot hash array cells — same treatment as
    # rt_array_emb_elem0 in __spark_entry__.py)
    feats = multimodal.fake_features(multimodal.as_media_table(_docs(spark, sf_dir)))
    return feats.select(
        "doc_id",
        F.element_at("features", 1).cast("double").alias("f0"),
        F.size("features").alias("n_feat"),
    )


def _lang_id_oracle() -> str:
    """DuckDB equivalent of text.language_id, generated from the same
    profile dict: per-profile stopword hits, argmax with
    strictly-more-wins + earlier-profile tie-break."""
    from .text import _LANG_PROFILES

    langs = list(_LANG_PROFILES)
    hit_cols = ", ".join(
        "COALESCE(len(list_intersect(toks, ["
        + ", ".join(f"'{w}'" for w in sorted(prof))
        + f"])), 0) AS {lang}"
        for lang, prof in _LANG_PROFILES.items()
    )
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"{lang} > 0"] + [
            f"{lang} >= {other}" for other in langs[i + 1 :]
        ] + [f"{lang} > {other}" for other in langs[:i]]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return (
        "WITH t AS (SELECT doc_id, list_distinct(list_filter("
        "string_split_regex(COALESCE(text, ''), '\\s+'), x -> x != '')) AS toks "
        "FROM documents), h AS (SELECT doc_id, "
        + hit_cols
        + " FROM t) SELECT doc_id, CASE "
        + " ".join(cases)
        + " ELSE 'unknown' END AS pred_lang FROM h"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS (driver records the first 50 overall): the
    # similarity/ANN/multimodal block goes first — in round 2 it sat at
    # the tail of a 63-entry dict and got no correctness rows at all.
    # Dropped for budget (each operator stays covered by another row):
    # exact_dup_groups + minhash_dedup_pairs unseeded (vacuous/weaker
    # twins of the *_seeded rows), emb_dims + emb_label_counts (trivial
    # sanity queries over the raw table, not engine operators).
    # simhash_fingerprints folded round 4 (raw-fingerprint determinism is
    # exercised inside simhash_near_dup_seeded + pytest) to fund the
    # oracle-green paragraph-dedup row within the 50-query window.
    # Round 6: distinct_doc_count / char_jaccard_adjacent /
    # media_frame_sample / doc_fingerprints folded (see notes at each)
    # to fund oracle rows for the round-5 operators, which lead the
    # window as the least-recently-verified block.
    return {
        "decode_images_planted": q_decode_images_planted,
        "decode_audios_planted": q_decode_audios_planted,
        "normalize_text_docs": q_normalize_text,
        "sample_corpus_split": q_sample_corpus_split,
        "corpus_token_freq": q_corpus_token_freq,
        "emb_lsh_planted_dup": q_emb_lsh_planted_dup,
        "emb_ivf_planted_dup": q_emb_ivf_planted_dup,
        "doc_rolling_fp_seeded": q_doc_rolling_fp_seeded,
        "emb_quantize_roundtrip": q_emb_quantize_roundtrip,
        "dedup_paragraphs_seeded": q_dedup_paragraphs_seeded,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "dup_clusters_seeded": q_dup_clusters_seeded,
        "emb_topk_vec0": q_emb_topk_vec0,
        "simhash_near_dup_seeded": q_simhash_near_dup_seeded,
        "dedup_keep_canonical_seeded": q_dedup_keep_canonical_seeded,
        "emb_near_dup_pairs": q_emb_near_dup_pairs,
        "media_metadata": q_media_metadata,
        "media_resize": q_media_resize,
        "media_features": q_media_features,
        "doc_token_counts": q_doc_token_counts,
        "doc_token_counts_bpe": q_doc_token_counts_bpe,
        "doc_quality": q_doc_quality,
        "doc_lang_id": q_doc_lang_id,
        "exact_dup_groups_seeded": q_exact_dup_groups_seeded,
        "minhash_dedup_pairs_seeded": q_minhash_dedup_pairs_seeded,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_token_counts": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
            "FROM documents"
        ),
        "doc_quality": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
            "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens, "
            "CAST(list_max(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS max_token_len, "
            r"CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS BIGINT) AS n_punct_chars, "
            "CAST(len(list_filter(string_split(text, ' '), x -> list_contains("
            "['and', 'for', 'in', 'is', 'it', 'of', 'the', 'to'], lower(x)))) AS BIGINT) AS n_stopword_tokens "
            "FROM documents"
        ),
        "normalize_text_docs": (
            "SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) "
            "AS text FROM documents"
        ),
        # the bucket hash (xxhash64) is not SQL, but exact-partition IS:
        # sample ∪ complement must multiset-equal the corpus ids
        "sample_corpus_split": "SELECT doc_id FROM documents",
        "corpus_token_freq": (
            "SELECT token, COUNT(*) AS n FROM (SELECT unnest(list_filter("
            "string_split_regex(text, '\\s+'), t -> t != '')) AS token "
            "FROM documents) GROUP BY token"
        ),
        # planted-payload media decode: payloads are pure functions of
        # doc_id, so the decoded shape + pixel/PCM digests are
        # constants-by-construction
        "decode_images_planted": (
            "SELECT doc_id, fmt, CAST(2 AS INTEGER) AS height, "
            "CAST(2 AS INTEGER) AS width, true AS decoded, "
            "md5(repeat(chr(CAST(65 + doc_id % 26 AS INTEGER)), 12)) "
            "AS pixels_md5 FROM documents "
            "CROSS JOIN (SELECT unnest(['ppm', 'png']) AS fmt)"
        ),
        "decode_audios_planted": (
            "SELECT doc_id, CAST(8 AS BIGINT) AS n_samples, "
            "CAST(1 AS INTEGER) AS channels, "
            "CAST(4096 AS INTEGER) AS sample_rate, true AS decoded, "
            "md5(repeat(chr(CAST(65 + doc_id % 26 AS INTEGER)), 16)) "
            "AS pcm_md5 FROM documents"
        ),
        "doc_token_counts_bpe": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            r"'\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens FROM documents"
        ),
        "doc_lang_id": _lang_id_oracle(),
        # rolling hash itself is custom xxhash64 math, but the seeded
        # invariant (identical content <=> identical fingerprint) is a
        # constant-by-construction pair set
        "doc_rolling_fp_seeded": (
            "SELECT doc_id AS doc_a, doc_id + 10000000 AS doc_b "
            "FROM documents WHERE doc_id % 10 = 0"
        ),
        # ANN candidate sets are custom bucketing, but a planted exact
        # duplicate always shares its query's bucket/cell and re-ranks
        # at cosine 1.0 exactly -> the hit rows are SQL-predictable
        "emb_lsh_planted_dup": (
            "SELECT CAST(vec_id AS BIGINT) AS query_id, "
            "CAST(vec_id + 10000000 AS BIGINT) AS dup_id, "
            "CAST(1000000 AS BIGINT) AS score_u "
            "FROM embeddings WHERE vec_id < 3"
        ),
        "emb_ivf_planted_dup": (
            "SELECT CAST(vec_id AS BIGINT) AS query_id, "
            "CAST(vec_id + 10000000 AS BIGINT) AS dup_id, "
            "CAST(1000000 AS BIGINT) AS score_u "
            "FROM embeddings WHERE vec_id < 3"
        ),
        # pure IEEE float64/float32 arithmetic: DuckDB reproduces the
        # quantizer bit-exact (round() ties-away-from-zero both engines)
        "emb_quantize_roundtrip": (
            "WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e "
            "FROM embeddings), "
            "m AS (SELECT vec_id, e, "
            "list_max(list_transform(e, x -> abs(x))) AS am FROM t) "
            "SELECT vec_id, am / 127.0 AS scale, "
            "CAST(CASE WHEN am = 0 THEN 0 ELSE round(e[1] * 127.0 / am) "
            "END AS BIGINT) AS q0, "
            "CAST(len(e) AS INTEGER) AS n_q, "
            # d0 goes through the BIGINT cast first, mirroring the int8
            # storage: round(-0.3) is -0.0 in DuckDB, but the stored
            # byte is 0, so dequantize yields +0.0 — multiplying the
            # un-cast double would leak the -0.0 sign into d0
            "CAST(CAST(CAST(CASE WHEN am = 0 THEN 0 ELSE "
            "round(e[1] * 127.0 / am) END AS BIGINT) * (am / 127.0) "
            "AS FLOAT) AS DOUBLE) AS d0 FROM m"
        ),
        "exact_dup_groups_seeded": (
            f"SELECT text, COUNT(*) AS dup_count FROM {_SEEDED_ORACLE_SRC} "
            "GROUP BY text HAVING COUNT(*) > 1"
        ),
        "ngram_jaccard_pairs": (
            f"WITH s AS (SELECT * FROM {_SEEDED_ORACLE_SRC} t), "
            "g AS (SELECT doc_id, list_distinct(list_transform("
            "range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1), "
            "i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' '))) "
            "AS grams FROM s), "
            "c AS (SELECT doc_id AS doc_a, doc_id + 10000000 AS doc_b "
            "FROM documents WHERE doc_id % 10 = 0 "
            "UNION ALL SELECT doc_id AS doc_a, doc_id + 20000000 AS doc_b "
            "FROM documents WHERE doc_id % 7 = 3) "
            "SELECT * FROM (SELECT c.doc_a, c.doc_b, "
            "CAST(FLOOR(len(list_intersect(ga.grams, gb.grams)) * 100.0 / "
            "len(list_distinct(list_concat(ga.grams, gb.grams)))) AS BIGINT) "
            "AS jaccard_pct FROM c "
            "JOIN g ga ON ga.doc_id = c.doc_a "
            "JOIN g gb ON gb.doc_id = c.doc_b) "
            "WHERE jaccard_pct >= 30"
        ),
        "dedup_paragraphs_seeded": (
            "WITH src AS (SELECT d.doc_id, d.text || chr(10) || chr(10) || "
            "b.text || chr(10) || chr(10) || 'tail ' || d.doc_id AS text "
            "FROM documents d JOIN documents b "
            "ON b.doc_id = d.doc_id - d.doc_id % 50), "
            "p AS (SELECT doc_id, "
            "unnest(string_split(text, chr(10) || chr(10))) AS part, "
            "unnest(range(1, len(string_split(text, chr(10) || chr(10))) + 1)) "
            "AS pos FROM src), "
            "k AS (SELECT part, min(doc_id) AS kd FROM p "
            "WHERE length(part) >= 40 GROUP BY part), "
            "k2 AS (SELECT p.part, k.kd, min(p.pos) AS kp FROM p "
            "JOIN k ON p.part = k.part AND p.doc_id = k.kd "
            "WHERE length(p.part) >= 40 GROUP BY p.part, k.kd), "
            "kept AS (SELECT doc_id, pos, part FROM p WHERE length(part) < 40 "
            "UNION ALL SELECT p.doc_id, p.pos, p.part FROM p JOIN k2 "
            "ON p.part = k2.part AND p.doc_id = k2.kd AND p.pos = k2.kp) "
            "SELECT s.doc_id, COALESCE(agg.text, '') AS text FROM src s "
            "LEFT JOIN (SELECT doc_id, string_agg(part, chr(10) || chr(10) "
            "ORDER BY pos) AS text FROM kept GROUP BY doc_id) agg "
            "USING (doc_id)"
        ),
        "minhash_dedup_pairs_seeded": (
            "SELECT doc_id AS doc_a, doc_id + 10000000 AS doc_b, "
            "CAST(64 AS INTEGER) AS agree "
            "FROM documents WHERE doc_id % 10 = 0"
        ),
        # minhash/simhash/ngram pairs: custom stable hashing -> rows-only
        "dup_clusters_seeded": (
            f"WITH s AS (SELECT * FROM {_SEEDED_ORACLE_SRC} t), "
            "d AS (SELECT text FROM s GROUP BY text HAVING COUNT(*) > 1) "
            "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS cluster_id "
            "FROM s WHERE text IN (SELECT text FROM d)"
        ),
        # brute-force cosine top-k: DuckDB's list_cosine_similarity on
        # DOUBLE[] reproduces the float64 matmul exactly; the operator's
        # integer-scaled score_u exists precisely for this hash-exact
        # comparison (lsh/ivf topk stay rows-only: their candidate sets
        # come from custom bucketing)
        "emb_topk_vec0": (
            "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id = 0) "
            "SELECT vec_id, CAST(ROUND(list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)) * 1000000) "
            "AS BIGINT) AS score_u FROM embeddings WHERE vec_id != 0 "
            "ORDER BY score_u DESC, vec_id ASC LIMIT 10"
        ),
        # production-cutoff near-dups: the oracle is the EXACT all-pairs
        # ground truth (feasible at oracle scale), so the expected-empty
        # result is confirmed empty rather than assumed
        "emb_near_dup_pairs": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "CAST(ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS score_u "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) * 1000000) >= 950000"
        ),
        "simhash_near_dup_seeded": (
            "SELECT doc_id AS doc_a, doc_id + 10000000 AS doc_b "
            "FROM documents WHERE doc_id % 10 = 0"
        ),
        "dedup_keep_canonical_seeded": (
            f"SELECT doc_id FROM {_SEEDED_ORACLE_SRC} t "
            "QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)"
        ),
        "media_metadata": (
            "SELECT doc_id, 'image/fake' AS media_type, "
            "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "substr(sha256(text), 1, 16) AS sha_prefix FROM documents"
        ),
        # the resize/frame kernels are deterministic byte ops over ASCII
        # text payloads, so DuckDB string math reproduces them byte-exact
        # (every sf doc is far below the 64x64 target, so the oracle
        # takes the pad branch; the strided-subsample branch is pinned
        # against a NumPy reference in tests/test_functions.py)
        "media_resize": (
            "SELECT doc_id, md5(rpad(text, 4096, chr(0))) AS pixels_md5, "
            "CAST(64 AS INTEGER) AS width, CAST(64 AS INTEGER) AS height "
            "FROM documents"
        ),
        # media_features' fake encoder seeds the vector from
        # sha256(payload): f0 = float32(le_u32(digest[0:4])) / 2^32 —
        # DuckDB reproduces the float32 arithmetic bit-exact from its
        # own sha256 hex output
        "media_features": (
            "WITH t AS (SELECT doc_id, sha256(text) AS h FROM documents), "
            "b AS (SELECT doc_id, "
            "(strpos('0123456789abcdef', substr(h,1,1))-1)*16 + "
            "(strpos('0123456789abcdef', substr(h,2,1))-1) AS b0, "
            "(strpos('0123456789abcdef', substr(h,3,1))-1)*16 + "
            "(strpos('0123456789abcdef', substr(h,4,1))-1) AS b1, "
            "(strpos('0123456789abcdef', substr(h,5,1))-1)*16 + "
            "(strpos('0123456789abcdef', substr(h,6,1))-1) AS b2, "
            "(strpos('0123456789abcdef', substr(h,7,1))-1)*16 + "
            "(strpos('0123456789abcdef', substr(h,8,1))-1) AS b3 FROM t) "
            "SELECT doc_id, CAST(CAST(b0 + 256*b1 + 65536*b2 + "
            "16777216*b3 AS FLOAT) / CAST(4294967296 AS FLOAT) AS DOUBLE) "
            "AS f0, CAST(8 AS INTEGER) AS n_feat FROM b"
        ),
    }
