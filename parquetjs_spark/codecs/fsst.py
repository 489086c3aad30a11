"""FSST-style symbol-table string compression.

Absent from the reference (SURVEY.md C7) — added per the north rule,
following the published algorithm (FSST: Fast Random Access String
Compression, VLDB 2020; see /root/repo/PAPERS.md): a table of up to 255
symbols, each 1–8 bytes, replaces frequent substrings with 1-byte codes;
byte 255 is the escape marker (escape + literal byte = 2 bytes) so any
input round-trips.

Construction is the paper's bottom-up iteration, simplified: encode a
bounded sample with the current table, count adjacent-token merges and
their byte gains, keep the top-255 candidates, repeat a few rounds.

Encoding is greedy longest-match at each position, realized as a single
compiled regex whose alternatives are the symbols sorted longest-first
(leftmost alternation order == longest match at each position), with a
final catch-all byte alternative → escape.  Decoding is vectorized:
escape/literal/code positions are resolved from runs of 0xFF
(NumPy run-length parity), then one fancy-indexed join.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .util import run_lengths

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
_SINGLE = [bytes([i]) for i in range(256)]
_SINGLE_ARR = np.array(_SINGLE, dtype=object)


_TERM = object()  # trie terminal marker


def _trie_regex(node: dict) -> bytes:
    """Emit a trie-structured alternation.  Children are tried before the
    node's own terminal (the trailing empty alternative), so regex
    backtracking yields exactly greedy longest-match — at a per-position
    cost of the trie depth (<= 8) instead of one try per symbol."""
    branches = []
    for byte, child in node.items():
        if byte is _TERM:
            continue
        sub = _trie_regex(child)
        branches.append(re.escape(bytes([byte])) + sub)
    if not branches:
        return b""
    alt = b"|".join(branches)
    if _TERM in node:
        return b"(?:" + alt + b"|)"
    return b"(?:" + alt + b")"


def _build_pattern(symbols: list[bytes]) -> re.Pattern:
    trie: dict = {}
    for s in symbols:
        node = trie
        for b in s:
            node = node.setdefault(b, {})
        node[_TERM] = True
    # top level: trie alternatives (longest-match), then catch-all byte
    parts = []
    for byte, child in trie.items():
        if byte is _TERM:
            continue
        parts.append(re.escape(bytes([byte])) + _trie_regex(child))
    parts.append(b"(?s:.)")  # catch-all single byte -> escape
    return re.compile(b"|".join(parts))


def _tokenize(data: bytes, symbols: list[bytes]) -> list[bytes]:
    pat = _build_pattern(symbols)
    return [m.group(0) for m in pat.finditer(data)]


def train(sample: bytes, rounds: int = 4, max_sample: int = 1 << 15) -> list[bytes]:
    """Build a symbol table from a sample (bounded cost per SURVEY.md §7.3).

    Gain counting is vectorized: tokens are factorized to integer codes,
    single-token gains come from one bincount, and adjacent-pair merge
    gains from one unique() over packed code pairs — no Python-level
    Counter over the token stream."""
    sample = sample[:max_sample]
    if not sample:
        return []
    symbols: list[bytes] = []
    for _ in range(rounds):
        if symbols:
            tokens = _tokenize(sample, symbols)
        else:
            tokens = [sample[i : i + 1] for i in range(len(sample))]
        tok_arr = np.empty(len(tokens), dtype=object)
        tok_arr[:] = tokens
        codes, uniq = pd.factorize(tok_arr, use_na_sentinel=False)
        uniq_lens = np.fromiter((len(u) for u in uniq), dtype=np.int64, count=len(uniq))
        # singles gain: count * len  (escape 2B -> code 1B per byte covered)
        single_gain = np.bincount(codes, minlength=len(uniq)) * uniq_lens
        gains: dict[bytes, int] = {
            bytes(uniq[i]): int(single_gain[i]) for i in np.flatnonzero(single_gain)
        }
        # merge gains: adjacent code pairs, one unique() pass
        if len(codes) > 1:
            k = len(uniq)
            pair_ids, pair_counts = np.unique(
                codes[:-1].astype(np.int64) * k + codes[1:], return_counts=True
            )
            a_idx = pair_ids // k
            b_idx = pair_ids % k
            pair_lens = uniq_lens[a_idx] + uniq_lens[b_idx]
            ok = pair_lens <= MAX_SYMBOL_LEN
            for ai, bi, cnt, ln in zip(
                a_idx[ok].tolist(),
                b_idx[ok].tolist(),
                pair_counts[ok].tolist(),
                pair_lens[ok].tolist(),
            ):
                cand = bytes(uniq[ai]) + bytes(uniq[bi])
                gains[cand] = gains.get(cand, 0) + cnt * ln
        # keep the best candidates; gain must beat the 1-byte code cost
        ranked = sorted(gains.items(), key=lambda kv: -kv[1])[:MAX_SYMBOLS]
        best = [s for s, g in ranked if g > len(s)]
        if best == symbols:
            break
        symbols = best
    return symbols


def compress(data: bytes, symbols: list[bytes]) -> bytes:
    """Greedy longest-match encode via the trie regex (C-speed matching
    that only visits token boundaries) with an INCREMENTAL output walk:
    one short-lived match object at a time and a single bytearray.

    Deliberately not findall(): materializing every token at once grows
    allocator arenas by ~10x the input size, and under 32-way
    parallelism the resulting mmap/page-fault storm puts 75%+ of CPU in
    the kernel (measured on this host) — the incremental form keeps
    allocations in the free-list and scales linearly."""
    n = len(data)
    if n == 0:
        return b""
    if not symbols:
        # pure escape stream: interleave 0xFF with every byte, vectorized
        arr = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(2 * n, dtype=np.uint8)
        out[0::2] = ESCAPE
        out[1::2] = arr
        return out.tobytes()
    code = {s: i for i, s in enumerate(symbols)}
    out = bytearray()
    ap = out.append
    g = code.get
    for m in _build_pattern(symbols).finditer(data):
        t = m.group(0)
        c = g(t)
        if c is not None:
            ap(c)
        else:  # non-symbol tokens are single bytes by construction
            ap(ESCAPE)
            ap(t[0])
    return bytes(out)


def decompress(payload: bytes, symbols: list[bytes]) -> bytes:
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = len(arr)
    if n == 0:
        return b""
    is_ff = arr == ESCAPE
    # classify positions: walk runs of 0xFF — inside a run that starts at a
    # code position, bytes alternate escape/literal; an odd-length run
    # escapes the first non-FF byte after it.
    # Key invariant: runs are maximal, so the literal carried out of an
    # odd-length FF run is always consumed by the following non-FF byte —
    # it can never reach another FF run.  Hence, inside each FF run,
    # even offsets are escapes and odd offsets are literals, and an
    # odd-length run additionally marks the byte right after it.
    # That makes classification loop-free:
    kind = np.zeros(n, dtype=np.uint8)  # 0=code 1=escape-marker 2=literal
    if is_ff.any():
        rv, rl = run_lengths(is_ff.view(np.uint8))
        run_starts = np.zeros(len(rl), dtype=np.int64)
        np.cumsum(rl[:-1], out=run_starts[1:])
        ffsel = rv == 1
        ff_starts = run_starts[ffsel]
        ff_lens = rl[ffsel]
        pos_ff = np.flatnonzero(is_ff)
        off = pos_ff - np.repeat(ff_starts, ff_lens)
        kind[pos_ff] = np.where(off % 2 == 0, 1, 2).astype(np.uint8)
        ends = ff_starts + ff_lens
        carry = (ff_lens % 2 == 1) & (ends < n)
        kind[ends[carry]] = 2
    # vectorized expansion: per-position output length -> exclusive cumsum
    # -> one grouped scatter per distinct symbol (<= 255 C-speed scatters)
    symlen = np.zeros(256, dtype=np.int64)
    for i, s in enumerate(symbols):
        symlen[i] = len(s)
    code_mask = kind == 0
    lit_mask = kind == 2
    # escapes read symlen[255] == 0 (code 255 is never a symbol)
    lens = symlen[arr]
    lens[kind != 0] = 0
    lens[lit_mask] = 1
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    total = int(starts[-1] + lens[-1]) if n else 0
    out = np.empty(total, dtype=np.uint8)
    out[starts[lit_mask]] = arr[lit_mask]
    codes = arr[code_mask]
    code_starts = starts[code_mask].astype(np.int64)
    # sort-free expansion: pad the symbol table into a (256 x 8) byte
    # matrix; one masked gather pulls every symbol's bytes in stream
    # order, one masked scatter places them
    symmat = np.zeros((256, MAX_SYMBOL_LEN), dtype=np.uint8)
    for i, s in enumerate(symbols):
        symmat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    width = np.arange(MAX_SYMBOL_LEN)
    sel = width[None, :] < symlen[codes][:, None]
    idx_mat = code_starts[:, None] + width[None, :]
    out[idx_mat[sel]] = symmat[codes][sel]
    return out.tobytes()


def serialize_table(symbols: list[bytes]) -> bytes:
    out = [bytes([len(symbols)])]
    for s in symbols:
        out.append(bytes([len(s)]))
        out.append(s)
    return b"".join(out)


def deserialize_table(buf: bytes | memoryview) -> tuple[list[bytes], int]:
    """Return (symbols, bytes_consumed)."""
    b = bytes(buf) if not isinstance(buf, bytes) else buf
    n = b[0]
    pos = 1
    symbols = []
    for _ in range(n):
        ln = b[pos]
        pos += 1
        symbols.append(b[pos : pos + ln])
        pos += ln
    return symbols, pos
