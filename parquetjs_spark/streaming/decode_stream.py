"""Streaming decode — the read-side complement of encode_stream (the
reference's cursor, /root/reference/lib/reader.js:51-67, driven by a
stream): new blob files appended by a running encode_stream are decoded
back to value rows as they land.

``readStream`` over the blobs directory + ``foreachBatch`` running the
same vectorized decode stage per micro-batch; checkpointing gives
exactly-once decode of each appended chunk, so an encode stream and a
decode stream form a durable, resumable pipe whose unit of progress is
the column chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .. import pipeline


def decode_stream(
    spark: SparkSession,
    encoded_path: str,
    output_path: str,
    checkpoint_path: str,
    column: str,
    dtype: str,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Start a streaming decode of one column from ``encoded_path``/blobs.

    ``dtype`` is required up front (streams can't probe): read it from
    the manifest (``pipeline.read_manifest``) or the writer's schema."""
    stream = (
        spark.readStream.schema(pipeline.BLOB_SCHEMA)
        .parquet(f"{encoded_path}/blobs")
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = pipeline.decode_column(batch_df, column, dtype=dtype)
        out.write.mode("append").parquet(output_path)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
