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

State discipline at 100 TB: keys are hashed to one int64
(``xxhash64``) so the state store holds 8-byte keys instead of document
texts.  Without a watermark the state grows with the number of DISTINCT
keys forever — correct, but unbounded; pass ``event_time_col`` +
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
) -> StreamingQuery:
    """Start a streaming dedup of ``stream_df`` (a readStream DataFrame).

    First occurrence of each key passes through; later occurrences — in
    the same micro-batch or any later one — are dropped.  Restarting
    from the same checkpoint keeps the seen-set (exactly-once)."""
    keyed = stream_df.withColumn(
        "__dedup_key", F.xxhash64(*[F.col(c) for c in key_cols])
    )
    if event_time_col is not None:
        deduped = keyed.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(["__dedup_key"])
    else:
        deduped = keyed.dropDuplicates(["__dedup_key"])
    writer = (
        deduped.drop("__dedup_key")
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
