"""Frame-of-reference + bit-pack codec for integer-like columns.

Not present in the reference (the DELTA_* encodings are enum-only there,
/root/reference/parquet.thrift:301-316 — see SURVEY.md E16); this is the
north-rule replacement: subtract the per-chunk minimum, bit-pack the
offsets at ``bit_width(max-min)`` bits (semantics of
/root/reference/lib/util.js:37-43), LSB-first like the RLE hybrid's
bit-packed runs.

Wire format:
  i64 LE reference (chunk min)
  u8     bit width
  then ceil(n*width/8) bytes of LSB-first packed offsets
"""

from __future__ import annotations

import numpy as np

from .util import bit_width, pack_bits, unpack_bits


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return (0).to_bytes(8, "little", signed=True) + bytes([0])
    ref = int(v.min())
    # bit-reinterpret + wrap-around subtract: offsets fit uint64 for the
    # full int64 range
    offs = v.view(np.uint64) - np.uint64(ref & 0xFFFFFFFFFFFFFFFF)
    span = int(offs.max())
    width = bit_width(span)
    return (
        ref.to_bytes(8, "little", signed=True)
        + bytes([width])
        + pack_bits(offs, width)
    )


def decode(buf: bytes | memoryview, count: int) -> np.ndarray:
    ref = int.from_bytes(bytes(buf[:8]), "little", signed=True)
    width = buf[8]
    offs = unpack_bits(memoryview(buf)[9:], width, count)
    # wrap-around add then bit-reinterpret as two's-complement int64
    return (offs + np.uint64(ref & 0xFFFFFFFFFFFFFFFF)).view(np.int64)


def estimated_size(n: int, vmin: int, vmax: int) -> int:
    """Analytic size for the codec auto-selector."""
    return 9 + (n * bit_width(vmax - vmin) + 7) // 8
