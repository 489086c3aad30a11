"""Block compression, applied to an encoded values section — the analogue
of the reference's per-column-chunk compression
(/root/reference/lib/compression.js:40-101).

Always available: UNCOMPRESSED (identity, compression.js:48-50), GZIP
(zlib, compression.js:52-54), ZLIB (raw deflate-with-header — cheaper
framing than gzip, our default).  SNAPPY and BROTLI are optional in the
reference too (its LZO/BROTLI are lazy-required, compression.js:33-35);
we gate them behind import-try and fall back to ZLIB.
"""

from __future__ import annotations

import gzip
import zlib

try:  # optional, like the reference's lazy-required codecs
    import cramjam  # type: ignore

    _HAVE_CRAMJAM = True
except Exception:  # pragma: no cover
    cramjam = None
    _HAVE_CRAMJAM = False

UNCOMPRESSED = "UNCOMPRESSED"
ZLIB = "ZLIB"
GZIP = "GZIP"
SNAPPY = "SNAPPY"
BROTLI = "BROTLI"

_IDS = {UNCOMPRESSED: 0, ZLIB: 1, GZIP: 2, SNAPPY: 3, BROTLI: 4}
_NAMES = {v: k for k, v in _IDS.items()}


def available() -> list[str]:
    out = [UNCOMPRESSED, ZLIB, GZIP]
    if _HAVE_CRAMJAM:
        out += [SNAPPY, BROTLI]
    return out


def compress(name: str, data: bytes) -> bytes:
    if name == UNCOMPRESSED:
        return data
    if name == ZLIB:
        return zlib.compress(data, 6)
    if name == GZIP:
        return gzip.compress(data, 6)
    if name == SNAPPY and _HAVE_CRAMJAM:
        return bytes(cramjam.snappy.compress_raw(data))
    if name == BROTLI and _HAVE_CRAMJAM:
        # reference settings: quality 8, lgwin 22 (compression.js:64-70)
        return bytes(cramjam.brotli.compress(data, level=8))
    raise ValueError(f"unsupported compression: {name}")


def decompress(name: str, data: bytes) -> bytes:
    if name == UNCOMPRESSED:
        return data
    if name == ZLIB:
        return zlib.decompress(data)
    if name == GZIP:
        return gzip.decompress(data)
    if name == SNAPPY and _HAVE_CRAMJAM:
        return bytes(cramjam.snappy.decompress_raw(data))
    if name == BROTLI and _HAVE_CRAMJAM:
        return bytes(cramjam.brotli.decompress(data))
    raise ValueError(f"unsupported compression: {name}")


def comp_id(name: str) -> int:
    return _IDS[name]


def comp_name(cid: int) -> str:
    return _NAMES[cid]
