"""Runt-chunk compaction: selective merge correctness, pass-through
bit-identity, row alignment for decode_table, and the CLI surface."""

import json

import pytest
from pyspark.sql import functions as F

from parquetjs_spark import cli, pipeline


@pytest.fixture(scope="module")
def runty(spark):
    """4 partitions x 1300 rows encoded at chunk_rows=512 ->
    per-partition chunk geometry [512, 512, 276]: one runt tail each."""
    df = (
        spark.range(5200)
        .select(
            F.col("id").alias("rid"),
            (F.col("id") % 97).alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("s"),
        )
        .repartition(4)
    )
    blobs = pipeline.encode_columns(df, chunk_rows=512).cache()
    blobs.count()
    return df, blobs


class TestCompact:
    def test_merges_runts_and_preserves_rows(self, spark, runty):
        df, blobs = runty
        out = pipeline.compact_chunks(blobs, min_rows=300, target_rows=512).cache()
        try:
            geom = out.select("part_id", "chunk_seq", "n").distinct()
            # no runt remains anywhere
            assert geom.where(F.col("n") < 300).count() == 0
            # 3 chunks/partition became 2 (512 + 788)
            per_part = {
                r["part_id"]: r["cnt"]
                for r in geom.groupBy("part_id").agg(F.count("*").alias("cnt")).collect()
            }
            assert set(per_part.values()) == {2}
            # row totals intact per column
            tot = {
                r["column"]: r["rows"]
                for r in out.groupBy("column").agg(F.sum("n").alias("rows")).collect()
            }
            assert set(tot.values()) == {5200}
            # every merged chunk re-verifies (fresh sha path)
            assert pipeline.verify_blobs(out).where(~F.col("ok")).count() == 0
            # decode_table returns the exact original content
            back = pipeline.decode_table(out, ["rid", "k", "s"])
            assert sorted(map(tuple, back.collect())) == sorted(
                map(tuple, df.collect())
            )
        finally:
            out.unpersist()

    def test_passthrough_partitions_bit_identical(self, spark, runty):
        _, blobs = runty
        # min_rows=100: the 276-row tails are NOT runts -> nothing to do
        out = pipeline.compact_chunks(blobs, min_rows=100, target_rows=512)
        a = sorted(
            (r["part_id"], r["chunk_seq"], r["column"], bytes(r["data"]))
            for r in blobs.collect()
        )
        b = sorted(
            (r["part_id"], r["chunk_seq"], r["column"], bytes(r["data"]))
            for r in out.collect()
        )
        assert a == b  # untouched partitions keep their exact blob bytes

    def test_alignment_survives_for_all_columns(self, spark, runty):
        """Bucket boundaries must be identical across columns: every
        (part_id, chunk_seq) carries the same n for all three."""
        _, blobs = runty
        out = pipeline.compact_chunks(blobs, min_rows=300, target_rows=512)
        bad = (
            out.groupBy("part_id", "chunk_seq")
            .agg(F.countDistinct("n").alias("d"), F.count("*").alias("c"))
            .where((F.col("d") != 1) | (F.col("c") != 3))
            .count()
        )
        assert bad == 0

    def test_single_chunk_partition_untouched(self, spark):
        df = spark.range(100).select(F.col("id").alias("x")).coalesce(1)
        blobs = pipeline.encode_columns(df, chunk_rows=512)
        out = pipeline.compact_chunks(blobs, min_rows=300)
        assert out.count() == blobs.count()
        assert pipeline.decode_column(out, "x", dtype="int64").count() == 100


def test_cli_compact_roundtrip(tmp_path, spark, capsys):
    src = str(tmp_path / "src.parquet")
    enc = str(tmp_path / "enc")
    cmp_ = str(tmp_path / "cmp")
    spark.range(2600).select(
        F.col("id").alias("rid"), (F.col("id") % 7).alias("k")
    ).coalesce(2).write.parquet(src)
    assert cli.main(["encode", "--input", src, "--output", enc,
                     "--chunk-rows", "512"]) == 0
    capsys.readouterr()
    rc = cli.main(["compact", "--input", enc, "--output", cmp_,
                   "--min-rows", "300", "--target-rows", "512"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["chunks_after"] < rep["chunks_before"]
    assert cli.main(["verify", "--input", cmp_]) == 0
    # bad flags exit 2
    assert cli.main(["compact", "--input", enc, "--output", cmp_,
                     "--min-rows", "600", "--target-rows", "512"]) == 2
    # in-place compaction refused before any job starts (including
    # path-normalization near-misses)
    assert cli.main(["compact", "--input", enc, "--output", enc]) == 2
    assert cli.main(["compact", "--input", enc, "--output", enc + "/"]) == 2


def test_cli_compact_preserves_column_partitioning(tmp_path, spark, capsys):
    """A --partition-by-column input keeps its layout through compact."""
    import os

    src = str(tmp_path / "s.parquet")
    enc = str(tmp_path / "enc_pbc")
    cmp_ = str(tmp_path / "cmp_pbc")
    spark.range(1300).select(
        F.col("id").alias("rid"), (F.col("id") % 5).alias("k")
    ).coalesce(1).write.parquet(src)
    assert cli.main(["encode", "--input", src, "--output", enc,
                     "--chunk-rows", "512", "--partition-by-column"]) == 0
    assert cli.main(["compact", "--input", enc, "--output", cmp_,
                     "--min-rows", "300", "--target-rows", "512"]) == 0
    assert any(d.startswith("column=") for d in os.listdir(f"{cmp_}/blobs"))
    assert cli.main(["verify", "--input", cmp_]) == 0
