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
from collections import Counter

import numpy as np

from .util import run_lengths

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
_SINGLE = [bytes([i]) for i in range(256)]
_SINGLE_ARR = np.array(_SINGLE, dtype=object)


def _build_pattern(symbols: list[bytes]) -> re.Pattern:
    alts = sorted(symbols, key=len, reverse=True)
    parts = [re.escape(s) for s in alts]
    parts.append(b"(?s:.)")  # catch-all single byte -> escape
    return re.compile(b"|".join(parts))


def _tokenize(data: bytes, symbols: list[bytes]) -> list[bytes]:
    pat = _build_pattern(symbols)
    return [m.group(0) for m in pat.finditer(data)]


def train(sample: bytes, rounds: int = 4, max_sample: int = 1 << 16) -> list[bytes]:
    """Build a symbol table from a sample (bounded cost per SURVEY.md §7.3)."""
    sample = sample[:max_sample]
    if not sample:
        return []
    symbols: list[bytes] = []
    for _ in range(rounds):
        tokens = _tokenize(sample, symbols) if symbols else [
            sample[i : i + 1] for i in range(len(sample))
        ]
        gains: Counter[bytes] = Counter()
        # singles: escape(2B) -> code(1B) saves 1 byte per occurrence
        for t in tokens:
            gains[t] += len(t)
        # merges of adjacent tokens (<= MAX_SYMBOL_LEN)
        for a, b in zip(tokens, tokens[1:]):
            if len(a) + len(b) <= MAX_SYMBOL_LEN:
                gains[a + b] += len(a) + len(b)
        # keep the best candidates; gain must beat the 1-byte code cost
        best = [s for s, g in gains.most_common(MAX_SYMBOLS) if g > len(s)]
        if best == symbols:
            break
        symbols = best
    return symbols


def compress(data: bytes, symbols: list[bytes]) -> bytes:
    if not symbols:
        # pure escape stream: interleave 0xFF with every byte, vectorized
        arr = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(2 * len(arr), dtype=np.uint8)
        out[0::2] = ESCAPE
        out[1::2] = arr
        return out.tobytes()
    code = {s: bytes([i]) for i, s in enumerate(symbols)}
    esc = bytes([ESCAPE])

    def repl(m: re.Match) -> bytes:
        tok = m.group(0)
        c = code.get(tok)
        return c if c is not None else esc + tok

    return _build_pattern(symbols).sub(repl, data)


def decompress(payload: bytes, symbols: list[bytes]) -> bytes:
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = len(arr)
    if n == 0:
        return b""
    is_ff = arr == ESCAPE
    if not is_ff.any():
        symarr = np.empty(len(symbols), dtype=object)
        symarr[:] = symbols
        return b"".join(symarr[arr])
    # classify positions: walk runs of 0xFF — inside a run that starts at a
    # code position, bytes alternate escape/literal; an odd-length run
    # escapes the first non-FF byte after it.
    kind = np.zeros(n, dtype=np.uint8)  # 0=code 1=escape-marker 2=literal
    rv, rl = run_lengths(is_ff.view(np.uint8))
    pos = 0
    carry_literal = False  # previous run of FFs had odd length
    for v, length in zip(rv.tolist(), rl.tolist()):
        end = pos + length
        if v == 0:
            if carry_literal:
                kind[pos] = 2
                carry_literal = False
        else:
            start = pos
            if carry_literal:  # first FF of this run is itself a literal
                kind[start] = 2
                start += 1
                carry_literal = False
            if start < end:
                kind[start:end:2] = 1  # escape markers
                kind[start + 1 : end : 2] = 2  # escaped literals
                if (end - start) % 2 == 1:
                    carry_literal = True
        pos = end
    parts = np.empty(n, dtype=object)
    code_mask = kind == 0
    lit_mask = kind == 2
    if code_mask.any():
        symarr = np.empty(len(symbols), dtype=object)
        symarr[:] = symbols
        parts[code_mask] = symarr[arr[code_mask]]
    parts[lit_mask] = _SINGLE_ARR[arr[lit_mask]]
    parts[kind == 1] = b""
    return b"".join(parts)


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
