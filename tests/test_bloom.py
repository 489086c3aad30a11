"""Per-chunk bloom filters (codecs/bloom.py) — the equality-pruning
metadata Parquet declares but the reference never writes
(/root/reference/parquet.thrift:359-361 is a TODO)."""

import numpy as np
import pytest

from parquetjs_spark.codecs import bloom


def test_no_false_negatives_ints():
    rng = np.random.default_rng(2)
    vals = rng.integers(-(2**60), 2**60, 5000)
    bits = bloom.build_from_hashes(bloom.hash_ints(vals))
    for v in vals[:200]:
        assert bloom.might_contain(bits, int(v), "int64")


def test_no_false_negatives_strings():
    strs = [b"hello", b"", b"x" * 200, "café".encode(), b"a", b"ab"]
    data = b"".join(strs)
    offs = np.cumsum([0] + [len(s) for s in strs]).astype(np.int64)
    bits = bloom.build_from_hashes(bloom.hash_bytes_arrays(data, offs))
    for s in strs:
        assert bloom.might_contain(bits, s, "binary")


def test_vectorized_matches_scalar_hash():
    vals = np.array([1, 42, -7, 2**40, -(2**62)], dtype=np.int64)
    hv = bloom.hash_ints(vals)
    for i, v in enumerate(vals):
        assert int(hv[i]) == bloom.hash_scalar(int(v), "int64")
    strs = [b"alpha", b"", b"beta" * 100]
    data = b"".join(strs)
    offs = np.cumsum([0] + [len(s) for s in strs]).astype(np.int64)
    hs = bloom.hash_bytes_arrays(data, offs)
    for i, s in enumerate(strs):
        assert int(hs[i]) == bloom.hash_scalar(s, "binary")


def test_sizing_and_false_positive_rate():
    rng = np.random.default_rng(0)
    h = bloom.hash_ints(rng.integers(0, 2**62, 4096))
    bits = bloom.build_from_hashes(h)
    assert len(bits) * 64 <= bloom.MAX_BITS
    fp = sum(
        bloom.might_contain(bits, int(v), "int64")
        for v in rng.integers(2**62, 2**63, 2000)
    )
    assert fp / 2000 < 0.02  # ~10 bits/distinct, 4 hashes -> ~1%
    # low cardinality pays only the floor
    small = bloom.build_from_hashes(bloom.hash_ints(np.array([1, 2, 3] * 1000)))
    assert len(small) * 64 == bloom.MIN_BITS


def test_string_probe_matches_encode_side():
    """scan_eq probes a python str against blooms built from utf-8
    StrBlock bytes — the two hash paths must agree."""
    strs = ["apple", "banana", "café"]
    data = "".join(strs).encode("utf-8")
    offs = np.cumsum([0] + [len(s.encode("utf-8")) for s in strs]).astype(np.int64)
    bits = bloom.build_from_hashes(bloom.hash_bytes_arrays(data, offs))
    for s in strs:
        assert bloom.might_contain(bits, s, "string")
    assert not bloom.might_contain(bits, "durian", "string") or True  # fp allowed
