"""Shared constants for the bsalign-tpu framework.

Semantics mirror the reference bsalign (see /root/reference/bsalign.h:30-69),
but the implementation here is an original TPU-first design.
"""

# Alignment modes (bsalign.h:30-38)
MODE_GLOBAL = 0
MODE_OVERLAP = 1
MODE_EXTEND = 2
MODE_KMER = 3
MODEMASK_TYPE = 0x3
MODE_QPROF = 4
MODE_MEMRESV = 8
MODE_CIGRESV = 16


def mode_type(mode: int) -> int:
    return mode & MODEMASK_TYPE


MODE_NAMES = {
    "global": MODE_GLOBAL,
    "overlap": MODE_OVERLAP,
    "extend": MODE_EXTEND,
    "kmer": MODE_KMER,
}


def parse_mode_list(s, allowed=("global", "overlap", "extend")):
    """The reference CLIs' -m parsing (main.c:140-153 and twins): a
    comma-separated list where each token is matched case-insensitively,
    the LAST valid token wins, a trailing comma is ignored, and any
    unknown (or empty non-final) token is a usage error. Returns the
    winning mode name, or None on a usage error."""
    toks = s.split(",")
    if len(toks) > 1 and toks[-1] == "":
        toks = toks[:-1]
    mode = None
    for tok in toks:
        key = tok.lower()
        if key not in allowed:
            return None
        mode = key
    return mode

# Backtrace codes (bsalign.h:40-54)
BT_M = 0
BT_I = 1
BT_D = 2
BT1_IE = 4
BT1_DE = 8
BT2_I1 = 1
BT2_D1 = 2
BT2_I2 = 3
BT2_D2 = 4
BT2_IE1 = 8
BT2_DE1 = 16
BT2_IE2 = 32
BT2_DE2 = 64

# Score ranges (bsalign.h:56-59)
SCORE_EPI8_MIN = -(0x7F >> 1)  # -63
SCORE_EPI8_MAX = 0x7F >> 1  # 63
SCORE_MIN = -(0x7FFFFFFF >> 2)
SCORE_MAX = 0x7FFFFFFF >> 2

# CIGAR op codes, SAM-compatible (bsalign.h:61-69)
CIGAR_M = 0
CIGAR_I = 1
CIGAR_D = 2
CIGAR_N = 3
CIGAR_S = 4
CIGAR_H = 5
CIGAR_P = 6
CIGAR_E = 7  # '='
CIGAR_X = 8

CIGAR_CHARS = "MIDNSHP=X*"

# The reference's striped-SIMD geometry (SSE build: 16 int8 lanes).
# Band layout, per-stripe score anchors and the adaptive-band heuristics all
# depend on this constant; we pin it to the reference's default build so that
# scores/CIGARs are reproduced exactly (bsalign.h:74/136: WORDSIZE 32/16).
WORDSIZE = 16
WORDSHIFT = 4


def roundup(v: int, base: int) -> int:
    return (v + base - 1) // base * base
