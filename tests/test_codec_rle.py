"""Golden-byte RLE tests pinned from /root/reference/test/codec_rle.js —
these gate the exact varint-header / LSB-bitpack format (FIXTURES.md F3)."""

import numpy as np
import pytest

from parquetjs_spark.codecs import rle


def rt(values, width, **kw):
    buf = rle.encode(values, width, **kw)
    out = rle.decode(buf, len(values), width, **kw)
    assert out.tolist() == list(values)
    return buf


def test_bitpacked_golden():
    # /root/reference/test/codec_rle.js:8-18
    buf = rt(list(range(8)), 3, disable_envelope=True)
    assert buf == bytes([0x03, 0x88, 0xC6, 0xFA])


def test_bitpacked_padding_golden():
    # /root/reference/test/codec_rle.js:36-47
    buf = rt([0, 1, 2, 3, 4, 5, 6, 7, 6, 5], 3, disable_envelope=True)
    assert buf == bytes([0x05, 0x88, 0xC6, 0xFA, 0x2E, 0x00, 0x00])


def test_repeated_golden():
    # /root/reference/test/codec_rle.js:66-76
    buf = rt([42] * 8, 6, disable_envelope=True)
    assert buf == bytes([0x10, 0x2A])


def test_mixed_golden():
    # /root/reference/test/codec_rle.js:94-104
    vals = list(range(8)) + [4] * 8 + list(range(8))
    buf = rt(vals, 3, disable_envelope=True)
    assert buf == bytes(
        [0x03, 0x88, 0xC6, 0xFA, 0x10, 0x04, 0x03, 0x88, 0xC6, 0xFA]
    )


def test_envelope():
    # envelope = 4-byte LE length prefix (/root/reference/lib/codec/rle.js:88-92)
    body = rle.encode(list(range(8)), 3, disable_envelope=True)
    enveloped = rle.encode(list(range(8)), 3)
    assert enveloped == len(body).to_bytes(4, "little") + body


def test_repeated_value_ge_256_correct_le():
    # the reference's >>8 no-op bug (rle.js:26) is deliberately NOT copied:
    # we write proper little-endian multi-byte values (SURVEY.md E10)
    buf = rle.encode([1000] * 16, 10, disable_envelope=True)
    assert buf == bytes([0x20]) + (1000).to_bytes(2, "little")
    assert rle.decode(buf, 16, 10, disable_envelope=True).tolist() == [1000] * 16


def test_zero_bitwidth():
    buf = rle.encode([0] * 100, 0, disable_envelope=True)
    assert rle.decode(buf, 100, 0, disable_envelope=True).tolist() == [0] * 100


@pytest.mark.parametrize("width", [1, 2, 3, 5, 7, 8, 13, 20, 32, 40, 64])
def test_roundtrip_random(width):
    rng = np.random.default_rng(42)
    hi = min(1 << width, 1 << 63)
    vals = rng.integers(0, hi, size=1000, dtype=np.uint64)
    # inject runs
    vals[100:300] = vals[100]
    vals[500:507] = vals[500]
    rt(vals.tolist(), width, disable_envelope=True)
    rt(vals.tolist(), width)


def test_boundary_rule_matches_reference():
    """Repeat runs only start at 8-value boundaries of the pending literal
    span (/root/reference/lib/codec/rle.js:59): 4 literals + 8 repeats must
    absorb 4 repeats into the bitpack run."""
    vals = [0, 1, 2, 3] + [7] * 8
    buf = rle.encode(vals, 3, disable_envelope=True)
    # expect: bitpacked run of 8 (0,1,2,3,7,7,7,7) then repeated run of 4
    assert buf[0] == 0x03  # (1 << 1) | 1
    assert buf[4] == 4 << 1  # repeated count 4
    assert rle.decode(buf, len(vals), 3, disable_envelope=True).tolist() == vals
