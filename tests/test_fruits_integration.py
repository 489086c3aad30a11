"""The reference's end-to-end write/read cycle re-expressed over a flat
fruits DataFrame (SURVEY.md §5c; /root/reference/test/integration.js).

The reference writes 40,000 rows (4 fruit records x 10,000,
test/integration.js:9,34-97) of an 11-field schema and deepEquals every
row after reading back, across a {DataPage v1,v2} x {compression}
matrix. Our engine's analogue: the same 4x10,000 fruit rows with the
nested fields flattened (stock -> stock_qty/stock_warehouse, colour ->
comma-joined, INTERVAL -> three int columns, BSON meta -> JSON string),
encoded through the chunk pipeline and decoded back value-identical,
across the {auto, NONE, ZLIB} compression matrix
(/root/reference/test/integration.js:290-356 analogue; our DataPageV2-
style layout always keeps levels raw, values compressed)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from parquetjs_spark import pipeline

N_COPIES = 10_000  # test/integration.js:9
VTIME_US = 1_700_000_000_000_000  # fixed stand-in for TEST_VTIME (determinism)


def fruits_pdf() -> pd.DataFrame:
    """4 fruit records x N_COPIES, flat schema (integration.js:34-97)."""
    base = [
        # name, quantity, price, date_step_us, colour, stock_qty, stock_wh, meta
        ("apples", 10, 2.6, 1000_000, "green,red", 30, "A,B", None),
        ("oranges", 20, 2.7, 2000_000, "orange", 83, "X", None),
        ("kiwi", None, 4.2, 8000_000, "green,brown", 62, "f,x", '{"expected_ship_date": 1700000000}'),
        ("banana", None, 3.2, 6000_000, "yellow", None, None, '{"shape": "curved"}'),
    ]
    rows = []
    for i in range(N_COPIES):
        for name, qty, price, step, colour, sq, wh, meta in base:
            rows.append(
                {
                    "name": name,
                    "quantity": qty,
                    "price": price,
                    "date": VTIME_US + step * i,  # TIMESTAMP_MICROS as int64
                    "day": dt.date(2017, 11, 26),
                    "finger": b"FNORD",
                    "inter_months": 42,
                    "inter_days": 23,
                    "inter_ms": 777,
                    "stock_qty": sq,
                    "stock_warehouse": wh,
                    "colour": colour,
                    "meta_json": meta,
                }
            )
    pdf = pd.DataFrame(rows)
    pdf["quantity"] = pdf["quantity"].astype("Int64")
    pdf["stock_qty"] = pdf["stock_qty"].astype("Int64")
    return pdf


@pytest.fixture(scope="module")
def fruits(spark):
    pdf = fruits_pdf()
    df = spark.createDataFrame(pdf).repartition(8).cache()
    df.count()
    yield pdf, df
    df.unpersist()


ALL_COLUMNS = [
    "name",
    "quantity",
    "price",
    "date",
    "day",
    "finger",
    "inter_months",
    "inter_days",
    "inter_ms",
    "stock_qty",
    "stock_warehouse",
    "colour",
    "meta_json",
]


def _norm(v):
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _assert_column_identical(pdf: pd.DataFrame, decoded_rows, column: str):
    got = sorted((_norm(r[0]) for r in decoded_rows), key=lambda x: (x is None, str(x)))
    want = sorted(
        (None if pd.isna(v) else _norm(v) for v in pdf[column].tolist()),
        key=lambda x: (x is None, str(x)),
    )
    assert len(got) == len(want) == 4 * N_COPIES
    assert got == want, f"column {column} not value-identical after round-trip"


@pytest.mark.parametrize("column", ALL_COLUMNS)
def test_fruits_roundtrip_auto(fruits, column):
    """deepEqual analogue (integration.js:202-261): every value of every
    column survives encode->decode bit-identically under auto codec."""
    pdf, df = fruits
    out = pipeline.roundtrip_column(df, column).collect()
    _assert_column_identical(pdf, out, column)


@pytest.mark.parametrize("compression", ["UNCOMPRESSED", "ZLIB"])
@pytest.mark.parametrize("column", ["name", "date", "price", "meta_json"])
def test_fruits_compression_matrix(fruits, column, compression):
    """UNCOMPRESSED/GZIP matrix analogue (integration.js:290-335)."""
    pdf, df = fruits
    out = pipeline.roundtrip_column(df, column, compression=compression).collect()
    _assert_column_identical(pdf, out, column)


def test_fruits_column_pruned_read(fruits):
    """Column-pruning cursor analogue (integration.js:263-285): encoding
    a projection only produces chunks for the requested columns."""
    _, df = fruits
    blobs = pipeline.encode_columns(df.select("name", "price"), ["name", "price"])
    cols = {r[0] for r in blobs.select("column").distinct().collect()}
    assert cols == {"name", "price"}


def test_fruits_full_table_verify(fruits):
    """sha256 bit-identity over every chunk of every column."""
    from pyspark.sql import functions as F

    _, df = fruits
    blobs = pipeline.encode_columns(df)
    bad = pipeline.verify_blobs(blobs).where(~F.col("ok")).count()
    assert bad == 0


def test_fruits_true_nested_schema_roundtrip(spark):
    """The reference's ACTUAL nested integration schema
    (/root/reference/test/integration.js:12-32): `stock` is a repeated
    group {quantity, warehouse} and `colour` a repeated UTF8 — now
    expressible directly instead of the flattened stand-ins above.
    (The reference's inner `quantity: repeated INT64` is scalar here:
    repeated-inside-repeated is rLevelMax>1, documented unsupported.)"""
    from pyspark.sql import Row

    base = [
        Row(name="apples", quantity=10, price=2.6, colour=["green", "red"],
            stock=[Row(quantity=10, warehouse="A"), Row(quantity=20, warehouse="B")],
            meta_json=None),
        Row(name="oranges", quantity=20, price=2.7, colour=["orange"],
            stock=[Row(quantity=50, warehouse="X"), Row(quantity=33, warehouse="Y")],
            meta_json=None),
        Row(name="kiwi", quantity=None, price=4.2, colour=["green", "brown"],
            stock=[Row(quantity=42, warehouse="f")],
            meta_json='{"expected_ship_date": 1700000000}'),
        Row(name="banana", quantity=None, price=3.2, colour=["yellow"],
            stock=None, meta_json='{"shape": "curved"}'),
    ]
    schema = (
        "name string, quantity long, price double, colour array<string>, "
        "stock array<struct<quantity: long, warehouse: string>>, meta_json string"
    )
    df = spark.createDataFrame(base * 250, schema).repartition(4)
    out = pipeline.roundtrip_table(df, chunk_rows=128)
    assert out.schema == df.schema
    assert sorted(map(repr, out.collect())) == sorted(map(repr, df.collect()))
