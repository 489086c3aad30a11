"""Streaming exact dedup — drop documents whose key was already seen in
ANY earlier micro-batch.

A training-data ingest stream re-crawls the same pages constantly; the
dedup has to happen ON the stream, with state that survives restarts,
or the downstream encode pays for every duplicate.  Spark's built-in
streaming ``dropDuplicates`` is exactly this operator (declared plan:
Catalyst owns the state store — RocksDB/HDFS-backed on a cluster — and
the exactly-once bookkeeping via the checkpoint), so the implementation
is a plan declaration, not a hand-rolled ``applyInPandasWithState``
loop.

State discipline at 100 TB: keys are hashed so the state store holds
fixed-size keys instead of document texts.  The hash width is an
explicit exactness trade (round-4 ADVICE — a single 64-bit hash is NOT
exact at scale):

* ``key_mode="hash128"`` (default): two xxhash64 values (the second
  seed-chained with a literal prefix — effectively independent for
  non-adversarial keys, not provably so), 16-byte state entries.
  Under that independence approximation, expected collisions at 10^10
  distinct keys ~ n^2 / 2^129 ≈ 1e-19 — "exact" at any realistic
  corpus size.
* ``key_mode="hash64"``: one xxhash64, 8-byte entries.  Expected
  collisions at 10^10 keys ≈ 2.7 — each collision silently DROPS a
  distinct document.  Only for state-size-critical jobs that tolerate
  ppb-level loss.
* ``key_mode="exact"``: state keys are the raw key columns — zero
  collision risk, state grows with key bytes (document-text keys make
  state data-sized; prefer this only for short keys like URLs/ids).

Without a watermark the state grows with the number of DISTINCT keys
forever — correct, but unbounded; pass ``event_time_col`` +
``watermark_delay`` to bound state to the watermark horizon
(``dropDuplicatesWithinWatermark``: duplicates arriving later than the
delay are treated as new — the standard trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


def dedup_stream(
    stream_df: DataFrame,
    output_path: str,
    checkpoint_path: str,
    key_cols: list[str] | tuple[str, ...] = ("text",),
    event_time_col: str | None = None,
    watermark_delay: str = "1 hour",
    trigger_once: bool = False,
    key_mode: str = "hash128",
) -> StreamingQuery:
    """Start a streaming dedup of ``stream_df`` (a readStream DataFrame).

    First occurrence of each key passes through; later occurrences — in
    the same micro-batch or any later one — are dropped.  Restarting
    from the same checkpoint keeps the seen-set (exactly-once).
    ``key_mode`` picks the state-key representation (module docstring:
    hash128 default / hash64 small-state / exact raw columns)."""
    if key_mode in ("hash64", "hash128"):
        clash = {"__dedup_key", "__dedup_key2"} & set(stream_df.columns)
        if clash:
            # withColumn would silently REPLACE a same-named source
            # column, then the final drop would delete user data
            raise ValueError(
                f"source column(s) {sorted(clash)} collide with the "
                "injected dedup key names; rename them or use "
                "key_mode='exact'"
            )
    cols = [F.col(c) for c in key_cols]
    if key_mode == "hash64":
        keyed = stream_df.withColumn("__dedup_key", F.xxhash64(*cols))
        key_names = ["__dedup_key"]
        drop = ["__dedup_key"]
    elif key_mode == "hash128":
        # second hash salted with a literal first arg -> independent
        # 64 bits; the pair is a 128-bit key in two state columns
        keyed = stream_df.withColumn(
            "__dedup_key", F.xxhash64(*cols)
        ).withColumn("__dedup_key2", F.xxhash64(F.lit("pjs.k2"), *cols))
        key_names = ["__dedup_key", "__dedup_key2"]
        drop = ["__dedup_key", "__dedup_key2"]
    elif key_mode == "exact":
        keyed = stream_df
        key_names = list(key_cols)
        drop = []
    else:
        raise ValueError(f"key_mode {key_mode!r}: hash128 | hash64 | exact")
    if event_time_col is not None:
        deduped = keyed.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(key_names)
    else:
        deduped = keyed.dropDuplicates(key_names)
    writer = (
        deduped.drop(*drop)
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
