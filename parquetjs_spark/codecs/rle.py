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


def encode(values, bit_width: int, disable_envelope: bool = False) -> bytes:
    """Encode non-negative ints with the reference's greedy hybrid.

    Two phases: the segmentation walk over runs does pure integer
    bookkeeping (it only records literal spans and repeats), then ALL
    literal spans are bit-packed in ONE ``pack_bits`` call over their
    concatenated 8-padded values — each padded span is byte-aligned
    (8*width bits per group), so the single packed buffer slices back
    into per-span payloads.  Byte-identical to emitting span by span
    (golden-vector parity tests), but without per-span NumPy dispatch,
    which dominated numeric-table encode."""
    v = np.ascontiguousarray(np.asarray(values), dtype=np.uint64)
    run_vals, run_lens = run_lengths(v)

    # phase 1: segmentation — ints only
    pieces: list[tuple] = []  # ("lit", start, n) | ("rep", value, count)
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
                    pieces.append(("lit", lit_start, lit_len))
                pieces.append(("rep", rv, rl - absorb))
                lit_start = pos + rl
                lit_len = 0
            else:
                lit_len += rl
        else:
            lit_len += rl
        pos += rl
    if lit_len:
        pieces.append(("lit", lit_start, lit_len))

    # phase 2: one batched pack of every literal span
    lit_total = sum((n + 7) // 8 * 8 for kind, _, n in pieces if kind == "lit")
    packed = b""
    span_bytes = bit_width  # bytes per 8-value group
    if lit_total:
        allv = np.zeros(lit_total, dtype=np.uint64)
        off = 0
        for kind, a, n in pieces:
            if kind == "lit":
                allv[off : off + n] = v[a : a + n]
                off += (n + 7) // 8 * 8
        packed = pack_bits(allv, bit_width)

    out: list[bytes] = []
    rep_nbytes = (bit_width + 7) // 8
    boff = 0
    for kind, a, n in pieces:
        if kind == "lit":
            groups = (n + 7) // 8
            out.append(varint_encode(groups << 1 | 1))
            out.append(packed[boff : boff + groups * span_bytes])
            boff += groups * span_bytes
        else:
            out.append(varint_encode(n << 1))
            # ceil(bitWidth/8) LE bytes; 0 bytes when width==0
            # (rle.js:22 Buffer.alloc)
            out.append(int(a).to_bytes(rep_nbytes, "little"))

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
