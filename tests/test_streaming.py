"""Streaming encode (ParquetTransformer analogue, SURVEY.md S7/§3.3)."""

from pyspark.sql import functions as F

from parquetjs_spark import pipeline
from parquetjs_spark.sources.tables import load_table
from parquetjs_spark.streaming import encode_stream

SF = "/root/testdata/sf0.001"


def test_stream_encode_roundtrip(tmp_path, spark):
    # stage source as a file stream (one parquet dir the stream discovers)
    src_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    ck_dir = tmp_path / "ck"
    df = load_table(spark, SF, "events").select("event_type", "value", "props")
    df.write.parquet(str(src_dir))

    stream = spark.readStream.schema(df.schema).parquet(str(src_dir))
    q = encode_stream(
        stream, str(out_dir), str(ck_dir), chunk_rows=256, trigger_once=True
    )
    q.awaitTermination(120)

    blobs = pipeline.read_encoded(spark, str(out_dir))
    assert pipeline.verify_blobs(blobs).where(~F.col("ok")).count() == 0
    manifest = pipeline.read_manifest(spark, str(out_dir))
    n = df.count()
    got = (
        manifest.where(F.col("column") == "props")
        .agg(F.sum("n").alias("n"))
        .collect()[0]["n"]
    )
    assert got == n
    # decoded values match the source multiset
    vals = pipeline.decode_column(blobs, "props")
    assert sorted(r[0] for r in vals.collect()) == sorted(
        r[0] for r in df.select("props").collect()
    )
