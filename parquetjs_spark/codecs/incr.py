"""INCREMENTAL (front-coded) byte arrays — the Parquet spec's
DELTA_BYTE_ARRAY idea (each value stores only the suffix after its
common prefix with the previous value) re-expressed for our chunk wire.

The reference never had this encoding (its registry is PLAIN and RLE,
/root/reference/lib/codec/index.js:1-2); Parquet added DELTA_BYTE_ARRAY
for exactly the column shapes a source/corpus table is full of: sorted
or clustered paths, URLs, repo ids.  Measured post-zstd on 4096-value
chunks: sorted path-like strings 0.57x of PLAIN, sorted URLs 0.69x,
unsorted strings ~1.03x — so this codec only ever enters through the
MEASURED post-compression selector comparison (like BYTE_STREAM_SPLIT),
which rejects it wherever the prefix structure isn't there.

Wire layout (own format; framing mirrors codecs/strstream):

  u32 LE    len(plens_enc)
  plens_enc FOR+bitpack of the n prefix lengths (lcp with previous)
  u32 LE    len(slens_enc)
  slens_enc FOR+bitpack of the n suffix lengths
  payload   concatenated suffix bytes

Encode: adjacent-pair lcp via one (n-1, m+1) byte gather + argmax
(prefix search capped at PREFIX_CAP bytes — beyond the cap the bytes
simply stay in the suffix); suffix extraction via one fancy-index
gather for short suffixes, or n bounded memcpys when suffixes are long
(the gather's 16-bytes-per-payload-byte index arrays are fresh-page
allocations every chunk — on fault-limited VMs that costs more than
the copy itself).  Decode is inherently sequential (value i needs
value i-1 materialized) — two bounded memcpys per value into one
preallocated output buffer; this is the one string codec whose decode
is not O(1) numpy calls, which is why the selector demands a >8%
post-compression win before choosing it.
"""

from __future__ import annotations

import numpy as np

from . import for_bp

# prefix search window: longer shared prefixes than this stay in the
# suffix (correctness unaffected); bounds the lcp gather matrix to
# (n-1) x 1025 bytes per chunk regardless of value sizes
PREFIX_CAP = 1024


def _as_u8(data) -> np.ndarray:
    if isinstance(data, np.ndarray) and data.dtype == np.uint8:
        return data
    return np.frombuffer(data, dtype=np.uint8)


# first-pass lcp search width: pairs sharing a longer prefix than this
# (rare — means >64 identical leading bytes) fall to a per-pair extension
_PASS_COLS = 64


def _lcp_tail(d: np.ndarray, oa: int, ob: int, m: int, start: int) -> int:
    """Extend an unresolved lcp beyond the first-pass window: stepwise
    vector compares (memcmp-sized blocks), only runs for the rare pairs
    whose shared prefix exceeds _PASS_COLS bytes."""
    p = start
    while p < m:
        step = min(256, m - p)
        a = d[oa + p : oa + p + step]
        b = d[ob + p : ob + p + step]
        if not np.array_equal(a, b):
            return p + int((a != b).argmax())
        p += step
    return m


def prefix_lens(offsets: np.ndarray, data) -> np.ndarray:
    """int64[n] longest-common-prefix of each value with its predecessor
    (first value: 0), capped at PREFIX_CAP.  Vectorized: one capped byte
    gather per side + one argmax; >64-byte prefixes extend per pair."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return out
    d = _as_u8(data)
    if d.size == 0:  # all values empty
        return out
    offs = np.ascontiguousarray(offsets, dtype=np.int64)
    lens = np.diff(offs)
    m = np.minimum(lens[:-1], lens[1:]).clip(0, PREFIX_CAP)
    cols = min(int(m.max()), _PASS_COLS) + 1
    # gather ONCE over all n value heads — the a/b compare sides are
    # adjacent row views of the same matrix.  Positions past a value's
    # end are CLAMPED into bounds rather than padded (padding would copy
    # the whole data buffer): any clamped cell has ii >= m and is forced
    # unequal by the mask, so the garbage it reads never matters.
    ii = np.arange(cols, dtype=np.int64)[None, :]
    hidx = offs[:-1, None] + ii
    np.minimum(hidx, d.size - 1, out=hidx)
    heads = d[hidx]
    neq = (heads[:-1] != heads[1:]) | (ii >= m[:, None])
    first = neq.argmax(axis=1)
    resolved = neq.any(axis=1)  # False only when m > cols and all equal
    out[1:] = np.where(resolved, first, 0)
    if not resolved.all():
        for i in np.nonzero(~resolved)[0]:
            out[i + 1] = _lcp_tail(
                d, int(offs[i]), int(offs[i + 1]), int(m[i]), cols
            )
    return out


def mean_lcp_probe(offsets: np.ndarray, data, k: int = 64) -> float:
    """Mean adjacent-pair lcp over the first k+1 values — the cheap
    selector pre-gate (chunks without prefix structure skip the full
    measured INCR candidate)."""
    n = len(offsets) - 1
    if n < 2:
        return 0.0
    k = min(k + 1, n)
    pl = prefix_lens(offsets[: k + 1], data)
    return float(pl[1:].mean())


def encode_offsets(offsets: np.ndarray, data) -> bytes:
    """offsets are absolute positions into ``data`` (arrow layout:
    int64[n+1], possibly not starting at 0)."""
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    d = _as_u8(data)
    plens = prefix_lens(offsets, d)
    lens = np.diff(offsets)
    slens = lens - plens
    starts = offsets[:-1] + plens
    total = int(slens.sum())
    if not total:
        payload: bytes | np.ndarray = b""
    elif total >= 32 * n:
        # long suffixes: n bounded memcpys into one output buffer.  The
        # fancy-gather alternative materializes 16 index bytes per
        # payload byte — freshly faulted pages on every chunk, which on
        # fault-limited VMs costs seconds per MB-scale chunk.
        out = np.empty(total, dtype=np.uint8)
        ov, dv = memoryview(out), memoryview(d)
        pos = 0
        for s, l in zip(starts.tolist(), slens.tolist()):
            if l:
                ov[pos : pos + l] = dv[s : s + l]
                pos += l
        payload = out
    else:
        # short suffixes (mean < 32 B): index arrays stay small relative
        # to n, one fancy-index gather over per-value ranges
        out_offs = np.zeros(n, dtype=np.int64)
        np.cumsum(slens[:-1], out=out_offs[1:])
        idx = np.arange(total, dtype=np.int64) + np.repeat(starts - out_offs, slens)
        payload = d[idx]
    p_enc = for_bp.encode(plens)
    s_enc = for_bp.encode(slens)
    return b"".join(
        (
            len(p_enc).to_bytes(4, "little"),
            p_enc,
            len(s_enc).to_bytes(4, "little"),
            s_enc,
            payload,
        )
    )


# matrix-decode budget: n * max_len cells; above this the padded
# matrices (~7 bytes/cell transient) would outgrow the chunk itself
_MATRIX_CELLS = 4 << 20


def _decode_matrix(
    plens: np.ndarray, slens: np.ndarray, offsets: np.ndarray, suffix: np.ndarray
) -> bytes:
    """Vectorized reconstruction via per-column forward fill.

    Byte j of value i is either written explicitly by value i's suffix
    (when plens[i] <= j) or inherited from the nearest earlier value
    that wrote byte j — prefix inheritance is transitive, so a single
    maximum.accumulate of writer row indices per column resolves every
    cell at once.  O(columns) numpy ops instead of O(n) Python ones."""
    n = len(plens)
    lens = plens + slens
    max_len = int(lens.max())
    rows32 = np.arange(n, dtype=np.int32)
    total_s = int(slens.sum())
    soffs = np.zeros(n, dtype=np.int64)
    np.cumsum(slens[:-1], out=soffs[1:])
    # flat (row * max_len + col) scatter positions of the explicit
    # suffix bytes: 1-D indexing throughout (2-D advanced indexing costs
    # ~2x in numpy); all flat positions fit int32 because
    # n * max_len <= _MATRIX_CELLS << 2^31
    w_flat = (
        np.arange(total_s, dtype=np.int32)
        - np.repeat(soffs.astype(np.int32), slens)
        + np.repeat((plens + np.arange(n, dtype=np.int64) * max_len).astype(np.int32), slens)
    )
    writer = np.zeros((n, max_len), dtype=np.int32)
    writer.reshape(-1)[w_flat] = np.repeat(rows32, slens)
    np.maximum.accumulate(writer, axis=0, out=writer)
    # gather each output byte STRAIGHT from the suffix stream: the
    # writer row w of cell (i, j) wrote byte j explicitly, so its
    # source is suffix[soffs[w] + (j - plens[w])] — one precomputed
    # adj = soffs - plens turns that into adj[w] + j, saving the whole
    # dense M materialization (a scatter + a gather over n*max_len)
    # the previous version paid
    total = int(offsets[-1])
    cols = np.arange(total, dtype=np.int32) - np.repeat(
        offsets[:-1].astype(np.int32), lens
    )
    out_flat = cols + np.repeat(
        (np.arange(n, dtype=np.int64) * max_len).astype(np.int32), lens
    )
    adj = (soffs - plens).astype(np.int64)
    src = adj[writer.reshape(-1)[out_flat]] + cols
    return suffix[src].tobytes()


def decode_offsets(buf: memoryview | bytes, n: int) -> tuple[np.ndarray, bytes]:
    """-> (offsets int64[n+1] starting at 0, payload bytes) — the fully
    reconstructed concatenation, ready for an arrow buffer."""
    mv = memoryview(buf)
    p_len = int.from_bytes(bytes(mv[:4]), "little")
    plens = for_bp.decode(mv[4 : 4 + p_len], n)
    pos = 4 + p_len
    s_len = int.from_bytes(bytes(mv[pos : pos + 4]), "little")
    slens = for_bp.decode(mv[pos + 4 : pos + 4 + s_len], n)
    suffix = mv[pos + 4 + s_len :]
    lens = plens + slens
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if n == 0 or offsets[-1] == 0:
        return offsets, b""
    max_len = int(lens.max())
    if n * max_len <= _MATRIX_CELLS:
        payload = _decode_matrix(
            plens, slens, offsets, np.frombuffer(suffix, dtype=np.uint8)
        )
        return offsets, payload
    # long-value fallback: sequential two-memcpys-per-value walk
    out = bytearray(int(offsets[-1]))
    out_mv = memoryview(out)
    soffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(slens, out=soffs[1:])
    prev = 0
    for i in range(n):
        start = offsets[i]
        p = plens[i]
        if p:
            out_mv[start : start + p] = out_mv[prev : prev + p]
        sl = slens[i]
        if sl:
            out_mv[start + p : start + p + sl] = suffix[soffs[i] : soffs[i + 1]]
        prev = start
    return offsets, bytes(out)


def encode(values: list[bytes]) -> bytes:
    n = len(values)
    lens = np.fromiter((len(v) for v in values), dtype=np.int64, count=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    return encode_offsets(offsets, b"".join(values))


def decode(buf: memoryview | bytes, n: int) -> list[bytes]:
    offsets, payload = decode_offsets(buf, n)
    return [bytes(payload[offsets[i] : offsets[i + 1]]) for i in range(n)]
