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

# RLE headers repeat heavily (same run shapes chunk after chunk) — a
# precomputed table turns the per-piece varint into one list index
_VARINT_CACHE = [varint_encode(i) for i in range(4096)]


def _varint(value: int) -> bytes:
    if value < 4096:
        return _VARINT_CACHE[value]
    return varint_encode(value)


def encode(values, bit_width: int, disable_envelope: bool = False) -> bytes:
    """Encode non-negative ints with the reference's greedy hybrid.

    Two phases: the segmentation walk does pure integer bookkeeping (it
    only records literal spans and repeats), then ALL literal spans are
    bit-packed in ONE ``pack_bits`` call over their concatenated
    8-padded values — each padded span is byte-aligned (8*width bits per
    group), so the single packed buffer slices back into per-span
    payloads.  Byte-identical to emitting span by span (golden-vector
    parity tests), but without per-span NumPy dispatch.

    The segmentation walk visits only CANDIDATE runs (length >= 2):
    length-1 runs merely extend the pending literal span, whose length
    falls out of run positions (pos - lit_start), so high-entropy data
    — dictionary codes, packed ids — costs O(candidates), not O(runs),
    Python iterations.  Semantics are unchanged from the reference rule
    (rle.js:56-76): a repeat may only start at an 8-boundary of the
    pending literal run (leading values absorb into the literal span),
    and needs >= 2 repeats left after absorption."""
    v = np.ascontiguousarray(np.asarray(values), dtype=np.uint64)
    run_vals, run_lens = run_lengths(v)
    n = len(v)

    # phase 1: segmentation — ints only, candidate runs only
    run_starts = np.empty(len(run_lens), dtype=np.int64)
    if len(run_lens):
        run_starts[0] = 0
        np.cumsum(run_lens[:-1], out=run_starts[1:])
    cand = np.flatnonzero(run_lens >= 2)
    pieces: list[tuple] = []  # ("lit", start, n) | ("rep", value, count)
    lit_start = 0
    for pos, rl, rv in zip(
        run_starts[cand].tolist(), run_lens[cand].tolist(), run_vals[cand].tolist()
    ):
        lit_len = pos - lit_start  # every value since the last rep piece
        absorb = (-lit_len) % 8
        if absorb > rl:
            absorb = rl
        if rl - absorb >= 2:
            lit_len += absorb
            if lit_len:
                pieces.append(("lit", lit_start, lit_len))
            pieces.append(("rep", rv, rl - absorb))
            lit_start = pos + rl
        # else: the whole run stays pending literal (implicit via positions)
    if n - lit_start:
        pieces.append(("lit", lit_start, n - lit_start))

    # phase 2: one batched pack of every literal span
    lit_total = sum((pn + 7) // 8 * 8 for kind, _, pn in pieces if kind == "lit")
    packed = b""
    span_bytes = bit_width  # bytes per 8-value group
    if lit_total:
        allv = np.zeros(lit_total, dtype=np.uint64)
        off = 0
        for kind, a, pn in pieces:
            if kind == "lit":
                allv[off : off + pn] = v[a : a + pn]
                off += (pn + 7) // 8 * 8
        packed = pack_bits(allv, bit_width)

    out: list[bytes] = []
    rep_nbytes = (bit_width + 7) // 8
    boff = 0
    for kind, a, pn in pieces:
        if kind == "lit":
            groups = (pn + 7) // 8
            out.append(_varint(groups << 1 | 1))
            out.append(packed[boff : boff + groups * span_bytes])
            boff += groups * span_bytes
        else:
            out.append(_varint(pn << 1))
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
    """Decode `count` values; returns uint64 ndarray (rle.js:122-150).

    Batched: one cheap header-parse loop (ints + list appends only)
    collects every run, then ALL bit-packed payloads unpack in a single
    ``unpack_bits`` call (the width is constant for the whole stream)
    and ALL repeated runs materialize in one ``np.repeat``, scattered
    into place by a run-kind mask.  The previous per-run
    unpack_bits/np.full calls dominated numeric-table decode (~65% of
    verify CPU): a 4096-value dict-code chunk holds hundreds of runs,
    each paying full NumPy dispatch for a handful of values."""
    offset = 0
    if not disable_envelope:
        offset += 4  # skip the 4-byte LE length prefix (rle.js:127-129)
    nbytes_rep = (bit_width + 7) // 8
    run_kind: list[bool] = []  # True = bit-packed
    run_n: list[int] = []
    packed_spans: list[tuple[int, int]] = []  # (offset, nbytes)
    rep_offs: list[int] = []
    rep_ns: list[int] = []
    got = 0
    while got < count:
        header, offset = varint_decode(buf, offset)
        if header & 1:
            n = (header >> 1) * 8
            nb = bit_width * (n // 8)
            packed_spans.append((offset, nb))
            run_kind.append(True)
            run_n.append(n)
            offset += nb
        else:
            n = header >> 1
            rep_offs.append(offset)
            rep_ns.append(n)
            run_kind.append(False)
            run_n.append(n)
            offset += nbytes_rep
        got += n
    if not run_n:  # count == 0: empty column chunk
        return np.empty(0, dtype=np.uint64)
    if len(run_n) == 1:  # single run: no scatter needed
        if run_kind[0]:
            o, nb = packed_spans[0]
            vals = unpack_bits(memoryview(buf)[o : o + nb], bit_width, run_n[0])
        else:
            o = rep_offs[0]
            value = int.from_bytes(bytes(buf[o : o + nbytes_rep]), "little")
            vals = np.full(run_n[0], value, dtype=np.uint64)
        return vals[:count]  # trim bit-pack padding (rle.js:143)
    kinds = np.array(run_kind, dtype=bool)
    ns = np.array(run_n, dtype=np.int64)
    mask = np.repeat(kinds, ns)
    out = np.empty(got, dtype=np.uint64)
    if packed_spans:
        if len(packed_spans) == 1:
            o, nb = packed_spans[0]
            pbuf = memoryview(buf)[o : o + nb]
        else:
            # flushed literal spans are byte-aligned (multiples of 8
            # values), so their payloads concatenate into one packable
            # stream
            pbuf = b"".join(
                bytes(memoryview(buf)[o : o + nb]) for o, nb in packed_spans
            )
        n_packed = int(ns[kinds].sum())
        out[mask] = unpack_bits(pbuf, bit_width, n_packed)
    if rep_ns:
        # gather every repeated value's LE bytes in nbytes_rep vector
        # passes instead of one int.from_bytes per run
        arr8 = np.frombuffer(buf, dtype=np.uint8, count=len(buf))
        offs = np.array(rep_offs, dtype=np.int64)
        if nbytes_rep:
            vals = arr8[offs].astype(np.uint64)
            for b in range(1, nbytes_rep):
                vals |= arr8[offs + b].astype(np.uint64) << np.uint64(8 * b)
        else:  # width 0: repeated zeros
            vals = np.zeros(len(rep_offs), dtype=np.uint64)
        out[~mask] = np.repeat(vals, np.array(rep_ns, dtype=np.int64))
    return out[:count]  # trim bit-pack padding (rle.js:143)
