"""Parquet RLE / bit-packing hybrid — format-identical to the reference
(/root/reference/lib/codec/rle.js), vectorized.

Wire format (per run):
  bit-packed run : varint header ``((n_values/8) << 1) | 1`` then
                   ``bitWidth * n/8`` bytes, values packed LSB-first
                   (rle.js:3-19); runs are padded with zeros to a
                   multiple of 8 values (rle.js:4-6), trimmed on decode
                   via the caller-supplied count (rle.js:143).
  repeated run   : varint header ``count << 1`` then the value in
                   ``ceil(bitWidth/8)`` little-endian bytes (rle.js:21-33).
                   NOTE: the reference has a bug — ``value >> 8`` at
                   rle.js:26 is a no-op, so repeated values >= 256 encode
                   the low byte repeatedly.  We write correct LE bytes
                   (SURVEY.md E10 says don't copy the bug); all pinned
                   golden vectors use bitWidth <= 8 so parity holds there.
  envelope       : unless ``disable_envelope``, the whole payload is
                   prefixed with a 4-byte LE total length (rle.js:88-92).

Run segmentation reproduces the reference's greedy rule (rle.js:56-76):
a repeated run may only begin when the pending bit-packed run holds a
multiple of 8 values and the current value equals the next one; it then
extends while values repeat.  We reproduce this exactly — but instead of
walking values one by one, we walk *runs* (vectorized run-length
segmentation via np.diff), so cost scales with the number of runs, and
the bit-packing of literal spans is fully vectorized.
"""

from __future__ import annotations

import numpy as np

from .util import pack_bits, run_lengths, unpack_bits, varint_decode, varint_encode


def _emit_bitpacked(out: list[bytes], values: np.ndarray, width: int) -> None:
    n = len(values)
    if n == 0:
        return
    pad = (-n) % 8
    if pad:
        values = np.concatenate([values, np.zeros(pad, dtype=values.dtype)])
    out.append(varint_encode((len(values) // 8) << 1 | 1))
    out.append(pack_bits(values, width))


def _emit_repeated(out: list[bytes], value: int, count: int, width: int) -> None:
    out.append(varint_encode(count << 1))
    # ceil(bitWidth/8) bytes, 0 bytes when width==0 (rle.js:22 Buffer.alloc)
    out.append(int(value).to_bytes((width + 7) // 8, "little"))


def encode(values, bit_width: int, disable_envelope: bool = False) -> bytes:
    """Encode non-negative ints with the reference's greedy hybrid."""
    v = np.ascontiguousarray(np.asarray(values), dtype=np.uint64)
    out: list[bytes] = []
    run_vals, run_lens = run_lengths(v)

    # Pending literal (bit-packed) span, tracked as [start, end) into v.
    lit_start = 0
    lit_len = 0
    pos = 0
    for rv, rl in zip(run_vals.tolist(), run_lens.tolist()):
        if rl >= 2:
            # reference rule: the repeat may only start at an 8-boundary of
            # the pending literal run; leading values of this run are
            # absorbed into the literal span until the boundary (rle.js:59).
            absorb = (-lit_len) % 8
            absorb = min(absorb, rl)
            if rl - absorb >= 2:
                lit_len += absorb
                if lit_len:
                    _emit_bitpacked(out, v[lit_start : lit_start + lit_len], bit_width)
                _emit_repeated(out, rv, rl - absorb, bit_width)
                lit_start = pos + rl
                lit_len = 0
            else:
                lit_len += rl
        else:
            lit_len += rl
        pos += rl
    if lit_len:
        _emit_bitpacked(out, v[lit_start : lit_start + lit_len], bit_width)

    buf = b"".join(out)
    if disable_envelope:
        return buf
    return len(buf).to_bytes(4, "little") + buf


def decode(
    buf: bytes | memoryview,
    count: int,
    bit_width: int,
    disable_envelope: bool = False,
) -> np.ndarray:
    """Decode `count` values; returns uint64 ndarray (rle.js:122-150)."""
    offset = 0
    if not disable_envelope:
        offset += 4  # skip the 4-byte LE length prefix (rle.js:127-129)
    parts: list[np.ndarray] = []
    got = 0
    nbytes_rep = (bit_width + 7) // 8
    while got < count:
        header, offset = varint_decode(buf, offset)
        if header & 1:
            n = (header >> 1) * 8
            parts.append(unpack_bits(memoryview(buf)[offset:], bit_width, n))
            offset += bit_width * (n // 8)
            got += n
        else:
            n = header >> 1
            value = int.from_bytes(bytes(buf[offset : offset + nbytes_rep]), "little")
            offset += nbytes_rep
            parts.append(np.full(n, value, dtype=np.uint64))
            got += n
    if not parts:  # count == 0: empty column chunk
        return np.empty(0, dtype=np.uint64)
    values = parts[0] if len(parts) == 1 else np.concatenate(parts)
    return values[:count]  # trim bit-pack padding (rle.js:143)
