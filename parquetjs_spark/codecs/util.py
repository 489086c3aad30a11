"""Shared low-level helpers for the codec kernels.

Everything here is vectorized NumPy — no per-value Python loops in the
hot path (the reference's element-wise JS loops, e.g.
/root/reference/lib/codec/rle.js:9-13, are the anti-pattern we replace).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# varint (unsigned LEB128) — format-compatible with the `varint` npm module
# used by the reference (/root/reference/lib/codec/rle.js:1,16,30).
# ---------------------------------------------------------------------------


def varint_encode(value: int) -> bytes:
    """Unsigned LEB128 encode."""
    if value < 0:
        raise ValueError("varint is unsigned")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def varint_decode(buf: bytes | memoryview, offset: int = 0) -> tuple[int, int]:
    """Return (value, new_offset)."""
    result = 0
    shift = 0
    while True:
        b = buf[offset]
        offset += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, offset
        shift += 7


# ---------------------------------------------------------------------------
# LSB-first bit packing — the exact bit layout of the reference's bitpacked
# runs (/root/reference/lib/codec/rle.js:8-13): stream bit b holds bit
# (b % bitWidth) of value[b // bitWidth]; stream bit b lands in byte b//8
# at in-byte position b%8.
# ---------------------------------------------------------------------------


def bit_width(max_value: int) -> int:
    """ceil(log2(v+1)); 0 for 0 — semantics of /root/reference/lib/util.js:37-43."""
    if max_value < 0:
        raise ValueError("bit_width requires non-negative input")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints LSB-first at `width` bits per value.

    Output length = ceil(len(values)*width/8) bytes. Caller is responsible
    for any run padding (RLE pads to a multiple of 8 values).

    Two routes, byte-identical output: tiny widths use one shift-mask
    pass per bit; wider values go through the LE byte view -> unpackbits
    -> slice -> packbits pipeline, whose cost is ~3 C passes regardless
    of width (the per-bit loop was O(width) passes — 48-bit timestamp
    offsets paid 48 of them per chunk).
    """
    if width == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    if width <= 4:
        bits = np.empty((n, width), dtype=np.uint8)
        for j in range(width):
            bits[:, j] = (v >> np.uint64(j)) & np.uint64(1)
        return np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    # bits[i, j] = bit j of value i (LSB-first): unpack the value's own
    # little-endian bytes and keep the low `width` bits per value —
    # flattened row-major gives the exact stream order of the reference
    # encoder.
    raw = v.view(np.uint8).reshape(n, 8)
    bits = np.unpackbits(raw, axis=1, bitorder="little", count=64)[:, :width]
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(buf: bytes | memoryview, width: int, count: int) -> np.ndarray:
    """Inverse of pack_bits: return `count` uint64 values."""
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8, count=(count * width + 7) // 8)
    bits = np.unpackbits(raw, bitorder="little", count=count * width)
    bits = bits.reshape(count, width)
    if width <= 4:
        out = np.zeros(count, dtype=np.uint64)
        for j in range(width):
            out |= bits[:, j].astype(np.uint64) << np.uint64(j)
        return out
    # pad each value's bits to 64 and reinterpret as LE uint64 — the
    # same ~3-C-pass shape as pack_bits (the per-bit loop cost O(width)
    # vector passes per run)
    full = np.zeros((count, 64), dtype=np.uint8)
    full[:, :width] = bits
    return np.packbits(full, axis=1, bitorder="little").view("<u8").reshape(count)


# ---------------------------------------------------------------------------
# Run-length segmentation (vectorized): values -> (run_values, run_lengths)
# ---------------------------------------------------------------------------


def run_lengths(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return (first-value-of-run, run-length) arrays, in order."""
    n = len(values)
    if n == 0:
        return values[:0], np.zeros(0, dtype=np.int64)
    change = np.flatnonzero(values[1:] != values[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    return values[starts], (ends - starts).astype(np.int64)
