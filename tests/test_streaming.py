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


def test_stream_decode_follows_encode(tmp_path, spark):
    """encode_stream -> decode_stream pipe: chunks appended by the
    encode stream are decoded exactly once to value rows."""
    from parquetjs_spark.streaming import decode_stream

    src_dir = tmp_path / "in2"
    enc_dir = tmp_path / "enc2"
    dec_dir = tmp_path / "dec2"
    df = load_table(spark, SF, "documents").select("doc_id", "text")
    df.write.parquet(str(src_dir))

    stream = spark.readStream.schema(df.schema).parquet(str(src_dir))
    q1 = encode_stream(
        stream, str(enc_dir), str(tmp_path / "ck_e"), chunk_rows=128,
        trigger_once=True,
    )
    q1.awaitTermination(120)
    q2 = decode_stream(
        spark, str(enc_dir), str(dec_dir), str(tmp_path / "ck_d"),
        column="text", dtype="string", trigger_once=True,
    )
    q2.awaitTermination(120)
    got = sorted(r[0] for r in spark.read.parquet(str(dec_dir)).collect())
    want = sorted(r[0] for r in df.select("text").collect())
    assert got == want
    # restart with the same checkpoint: no new files -> no duplicates
    q3 = decode_stream(
        spark, str(enc_dir), str(dec_dir), str(tmp_path / "ck_d"),
        column="text", dtype="string", trigger_once=True,
    )
    q3.awaitTermination(120)
    assert spark.read.parquet(str(dec_dir)).count() == len(want)
