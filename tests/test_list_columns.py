"""One-level repeated fields (array<T> columns) — the Dremel
shred/materialize re-expression for rLevelMax=1
(/root/reference/lib/shred.js:28-73 repeated leaves; SURVEY.md §2.4
L3/L4). Per-row element counts are the collapsed repetition levels;
flattened elements ride any scalar codec."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from parquetjs_spark import arrow_chunk, chunk as chunklib


def rt_arrow(values, pa_elem, dtype, codec="auto"):
    arr = pa.array(values, type=pa.list_(pa_elem))
    blob, stats = arrow_chunk.encode_arrow_column(arr, dtype, codec=codec)
    out, out_dtype = arrow_chunk.decode_arrow_column(blob)
    assert out_dtype == dtype
    assert arrow_chunk.verify_arrow(blob, stats["sha256"])
    return out.to_pylist(), stats


def test_list_int64_roundtrip():
    vals = [[1, 2, 3], [], [42], list(range(100)), [7, 7, 7, 7]] * 50
    got, stats = rt_arrow(vals, pa.int64(), "list_int64")
    assert got == vals
    assert stats["n"] == len(vals) and stats["n_nulls"] == 0


def test_list_int64_with_null_rows():
    vals = [[1, 2], None, [], None, [9, 8, 7]] * 40
    got, stats = rt_arrow(vals, pa.int64(), "list_int64")
    assert got == vals
    assert stats["n_nulls"] == 80


def test_list_string_roundtrip():
    vals = [["green", "red"], ["orange"], None, [], ["green", "brown"], ["yellow"]] * 30
    got, _ = rt_arrow(vals, pa.string(), "list_string")
    assert got == vals


def test_list_float32_roundtrip_embedding_shape():
    rng = np.random.default_rng(7)
    vals = [rng.random(16).astype(np.float32).tolist() for _ in range(200)]
    got, _ = rt_arrow(vals, pa.float32(), "list_float32")
    assert np.allclose(np.array(got), np.array(vals), rtol=0, atol=0)  # bit-exact


def test_list_element_codec_selected():
    # constant elements -> element codec should not stay PLAIN
    vals = [[5, 5, 5, 5]] * 500
    _, stats = rt_arrow(vals, pa.int64(), "list_int64")
    assert stats["codec"] in ("RLE", "DICT_RLE", "FOR_BITPACK")


def test_list_null_elements_roundtrip():
    """Element-level nulls (inner definition level) — supported since the
    list wire gained an element-validity section."""
    arr = pa.array([[1, None, 3], [], None, [None]], type=pa.list_(pa.int64()))
    blob, stats = arrow_chunk.encode_arrow_column(arr, "list_int64")
    out, dtype = arrow_chunk.decode_arrow_column(blob)
    assert dtype == "list_int64"
    assert out.to_pylist() == arr.to_pylist()
    assert arrow_chunk.verify_arrow(blob, stats["sha256"])


def test_list_pandas_path_delegates():
    s = pd.Series([[1, 2], None, [3]], dtype=object)
    blob, stats = chunklib.encode_chunk(s, "list_int64")
    out, dtype = chunklib.decode_chunk(blob)
    assert dtype == "list_int64"
    assert out.tolist() == [[1, 2], None, [3]]
    assert chunklib.verify_chunk(blob, stats["sha256"])


def test_list_spark_pipeline_embeddings(spark):
    """Round-trip the real embeddings.embedding (array<float>) column
    through the full mapInArrow pipeline."""
    from pyspark.sql import functions as F

    from parquetjs_spark import pipeline

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    blobs = pipeline.encode_columns(df, ["embedding"])
    bad = pipeline.verify_blobs(blobs).where(~F.col("ok")).count()
    assert bad == 0
    out = pipeline.roundtrip_column(df, "embedding")
    got = sorted(tuple(r[0]) for r in out.collect())
    want = sorted(tuple(r[0]) for r in df.select("embedding").collect())
    assert got == want


# --- multi-level repetition (rLevelMax > 1) ---------------------------------
# The reference shreds arbitrarily nested repeated fields
# (/root/reference/lib/shred.js:75-135 recursion; test/shred.js
# nested-repeated cases).  Our wire peels one count stream per list level
# and embeds the flattened child as a recursive inner chunk blob.


def rt_nested(values, dtype, codec="auto"):
    arr = pa.array(values, type=arrow_chunk.pa_type_of(dtype))
    blob, stats = arrow_chunk.encode_arrow_column(arr, dtype, codec=codec)
    out, out_dtype = arrow_chunk.decode_arrow_column(blob)
    assert out_dtype == dtype
    assert arrow_chunk.verify_arrow(blob, stats["sha256"])
    return out.to_pylist(), stats


def test_nested_list_int_roundtrip():
    vals = [[[1, 2], [3]], [], [[], [4, 5, 6]], [[7]], [[8], [], [9, 10]]] * 40
    got, stats = rt_nested(vals, "list_list_int64")
    assert got == vals
    assert stats["n_nulls"] == 0


def test_nested_list_nulls_both_levels():
    # outer-null rows AND null inner lists AND null elements
    vals = [[[1, None], None, [3]], None, [[], [4]], [None], []] * 30
    got, stats = rt_nested(vals, "list_list_int64")
    assert got == vals
    assert stats["n_nulls"] == 30


def test_nested_list_strings_and_depth3():
    vals = [[["a", "bb"], ["ccc"]], [[]], None, [["dd", None], []]] * 25
    got, _ = rt_nested(vals, "list_list_string")
    assert got == vals
    deep = [[[[1.5], [2.5, 3.5]]], None, [[[4.0]], []], [[[]]]] * 20
    got3, _ = rt_nested(deep, "list_list_list_float64")
    assert got3 == deep


def test_nested_list_token_embeddings_shape():
    """array<array<float>> — per-token embedding vectors, the shape the
    round-2 verdict called out as the real-corpus gap."""
    rng = np.random.default_rng(13)
    vals = [
        [rng.random(8).astype(np.float32).tolist() for _ in range(int(k) % 5)]
        for k in rng.integers(0, 10, 300)
    ]
    got, _ = rt_nested(vals, "list_list_float32")
    assert got == vals


def test_nested_list_pandas_path_delegates():
    s = pd.Series([[[1, 2], [3]], None, [[], [4]]], dtype=object)
    blob, stats = chunklib.encode_chunk(s, "list_list_int64")
    out, dtype = chunklib.decode_chunk(blob)
    assert dtype == "list_list_int64"
    assert out.tolist() == [[[1, 2], [3]], None, [[], [4]]]
    assert chunklib.verify_chunk(blob, stats["sha256"])


def test_nested_list_spark_pipeline(spark):
    """array<array<double>> through the full mapInArrow pipeline."""
    from pyspark.sql import functions as F

    from parquetjs_spark import pipeline

    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(
            "l_orderkey",
            F.array(
                F.array(F.col("l_quantity")),
                F.array(F.col("l_quantity") * 2, F.col("l_quantity") + 1),
            ).alias("qmat"),
        )
    )
    blobs = pipeline.encode_columns(df)
    assert pipeline.verify_blobs(blobs).where(~F.col("ok")).count() == 0
    out = pipeline.decode_table(blobs)
    got = sorted(
        (r["l_orderkey"], tuple(tuple(x) for x in r["qmat"]))
        for r in out.collect()
    )
    want = sorted(
        (r["l_orderkey"], tuple(tuple(x) for x in r["qmat"]))
        for r in df.collect()
    )
    assert got == want


def test_array_inside_arrstruct_spark(spark):
    """array field inside array<struct> (the reference's nested-repeated
    group shape) — shreds to a list-of-list leaf."""
    from pyspark.sql import functions as F

    from parquetjs_spark import pipeline

    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .limit(2000)
        .select(
            "l_orderkey",
            F.array(
                F.struct(
                    F.col("l_linenumber").alias("n"),
                    F.array(F.col("l_quantity"), F.col("l_quantity") * 3).alias("qs"),
                ),
                F.struct(
                    (F.col("l_linenumber") + 1).alias("n"),
                    F.array(F.col("l_quantity") + 1).alias("qs"),
                ),
            ).alias("xs"),
        )
    )
    out = pipeline.roundtrip_table(df)
    got = sorted(
        (
            r["l_orderkey"],
            tuple((e["n"], tuple(e["qs"])) for e in r["xs"]),
        )
        for r in out.collect()
    )
    want = sorted(
        (
            r["l_orderkey"],
            tuple((e["n"], tuple(e["qs"])) for e in r["xs"]),
        )
        for r in df.collect()
    )
    assert got == want


def test_arrstruct_inside_arrstruct_spark(spark):
    """array<struct> INSIDE array<struct> — the reference's recursive
    repeated-group shred (lib/shred.js:75-135, test/shred.js
    nested-repeated).  Nulls at every level: null outer array, empty
    outer array, null element struct, null inner array, empty inner
    array, null inner element, null inner field."""
    from parquetjs_spark import pipeline

    rows = [
        (1, [
            {"a": 10, "spans": [{"s": 1, "e": 2}, {"s": 3, "e": None}], "tag": "x"},
            {"a": None, "spans": [], "tag": "y"},
            None,
            {"a": 30, "spans": None, "tag": None},
        ]),
        (2, None),
        (3, []),
        (4, [{"a": 7, "spans": [{"s": 9, "e": 9}, None], "tag": "z"}]),
    ]
    schema = (
        "id long, ann array<struct<a: long, "
        "spans: array<struct<s: long, e: long>>, tag: string>>"
    )
    df = spark.createDataFrame(rows, schema)
    out = pipeline.decode_table(pipeline.encode_columns(df, chunk_rows=2))
    assert out.schema.simpleString() == df.schema.simpleString()
    got = sorted(
        (r.asDict(recursive=True) for r in out.collect()),
        key=lambda r: r["id"],
    )
    want = sorted(
        (r.asDict(recursive=True) for r in df.collect()),
        key=lambda r: r["id"],
    )
    assert got == want


def test_arrstruct_three_levels_spark(spark):
    """Three repetition levels (group in group in group) plus a plain
    struct wrapper — depth recursion with no special-case ceiling."""
    from parquetjs_spark import pipeline

    rows = [
        (1, [{"k": 1, "mid": [{"m": 2, "leaf": [{"v": "a"}, None]}, None]}]),
        (2, []),
        (3, [{"k": 5, "mid": []}, {"k": 6, "mid": None}]),
    ]
    schema = (
        "id long, x array<struct<k: long, mid: array<struct<m: long, "
        "leaf: array<struct<v: string>>>>>>"
    )
    df = spark.createDataFrame(rows, schema)
    out = pipeline.decode_table(pipeline.encode_columns(df, chunk_rows=1))
    assert out.schema.simpleString() == df.schema.simpleString()
    got = sorted(
        (r.asDict(recursive=True) for r in out.collect()),
        key=lambda r: r["id"],
    )
    want = sorted(
        (r.asDict(recursive=True) for r in df.collect()),
        key=lambda r: r["id"],
    )
    assert got == want
