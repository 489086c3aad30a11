"""BYTE_STREAM_SPLIT — the Parquet-spec lightweight encoding for
floating-point columns (format spec Encodings.md, added v2.8; the
reference's codec registry has only PLAIN and RLE,
/root/reference/lib/codec/index.js:1-2 — this is a north-star addition
like FSST).

The value bytes are transposed into per-byte-position planes: the k-th
byte of every value becomes contiguous.  IEEE floats share sign and
exponent structure within a chunk, so those planes are highly
repetitive and the block compressor (zlib/zstd) that runs after the
codec gets a far easier input than interleaved PLAIN bytes — typically
10-25% smaller on measurement-like doubles at ~memcpy cost.  BSS
itself is size-neutral (n * width bytes either way): its value only
shows POST-compression, which is exactly what the selector's measured
z-comparison ranks.

Pure NumPy transpose both directions — no per-value loops; bit-exact
for every payload including NaN/Inf/-0.0 (bytes are moved, never
interpreted)."""

from __future__ import annotations

import numpy as np


def encode(arr: "np.ndarray") -> bytes:
    """Value-major bytes -> plane-major bytes (n * itemsize total)."""
    a = np.ascontiguousarray(arr)
    n = len(a)
    if n == 0:
        return b""
    w = a.dtype.itemsize
    return a.view(np.uint8).reshape(n, w).T.tobytes()


def decode(buf, n: int, dtype) -> "np.ndarray":
    """Plane-major bytes -> values; inverse of encode."""
    dt = np.dtype(dtype)
    if n == 0:
        return np.empty(0, dtype=dt)
    w = dt.itemsize
    planes = np.frombuffer(buf, dtype=np.uint8, count=n * w).reshape(w, n)
    return np.ascontiguousarray(planes.T).view(dt).reshape(n)
