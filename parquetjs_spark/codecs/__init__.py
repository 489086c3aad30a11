"""Codec registry — the analogue of /root/reference/lib/codec/index.js:1-2
(which registers only PLAIN and RLE); ours adds DICT_RLE, FOR_BITPACK and
FSST per the north rule."""

from . import compress, dictionary, for_bp, fsst, plain, rle, util

PLAIN = "PLAIN"
RLE = "RLE"
DICT_RLE = "DICT_RLE"
FOR_BITPACK = "FOR_BITPACK"
FSST = "FSST"

CODEC_IDS = {PLAIN: 0, RLE: 1, DICT_RLE: 2, FOR_BITPACK: 3, FSST: 4}
CODEC_NAMES = {v: k for k, v in CODEC_IDS.items()}

__all__ = [
    "compress",
    "dictionary",
    "for_bp",
    "fsst",
    "plain",
    "rle",
    "util",
    "PLAIN",
    "RLE",
    "DICT_RLE",
    "FOR_BITPACK",
    "FSST",
    "CODEC_IDS",
    "CODEC_NAMES",
]
