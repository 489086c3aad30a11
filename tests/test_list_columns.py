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
