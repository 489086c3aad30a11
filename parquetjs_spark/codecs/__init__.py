"""Codec registry — the analogue of /root/reference/lib/codec/index.js:1-2
(which registers only PLAIN and RLE); ours adds DICT_RLE, FOR_BITPACK and
FSST per the north rule."""

from . import (
    bloom, bss, compress, dictionary, for_bp, fsst, incr, plain, rle, strstream,
    util,
)

PLAIN = "PLAIN"
RLE = "RLE"
DICT_RLE = "DICT_RLE"
FOR_BITPACK = "FOR_BITPACK"
FSST = "FSST"
# fixed-length byte arrays: raw concatenation + one u32 width
# (/root/reference/lib/codec/plain.js:179-209 FIXED_LEN_BYTE_ARRAY)
FLBA = "FLBA"
# byte-plane transpose for floats (Parquet spec encoding; codecs/bss.py)
BSS = "BYTE_STREAM_SPLIT"
# 12-byte sign-extended int64 (reference lib/codec/plain.js:70-103
# parity; deprecated in the spec — forced-only interop codec)
INT96 = "INT96"
# front-coded byte arrays (Parquet DELTA_BYTE_ARRAY idea; codecs/incr.py)
INCR = "INCREMENTAL"

CODEC_IDS = {
    PLAIN: 0, RLE: 1, DICT_RLE: 2, FOR_BITPACK: 3, FSST: 4, FLBA: 5, BSS: 6,
    INT96: 7, INCR: 8,
}
CODEC_NAMES = {v: k for k, v in CODEC_IDS.items()}

__all__ = [
    "bloom",
    "bss",
    "compress",
    "dictionary",
    "for_bp",
    "fsst",
    "incr",
    "plain",
    "rle",
    "strstream",
    "util",
    "PLAIN",
    "RLE",
    "DICT_RLE",
    "FOR_BITPACK",
    "FSST",
    "FLBA",
    "BSS",
    "INT96",
    "INCR",
    "CODEC_IDS",
    "CODEC_NAMES",
]
