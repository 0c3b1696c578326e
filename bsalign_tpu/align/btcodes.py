"""Packed traceback codes: 4 bits/cell instead of full difference planes.

The reference's pairwise driver re-derives the path from stored u/e/q
planes by score identities (backcal, bsalign.h:3704-3852). Shipping those
planes off-device costs ~2.8 bytes/cell (u+e int8 + int32 stripe anchors);
for a TPU the better contract is 4 decision bits per cell, emitted by the
forward kernel from the very identities backcal tests:

  bit0 m  : H(i,p) == H(i-1,p-1) + s(q[p], t[i])       (diagonal identity)
  bit1 d  : H(i,p) == E(i,p)  i.e. h == u + e'          (deletion identity)
  bit2 eo : stored e'(i,p) == GapOE                     (E chain opens at i,
            terminates a D run walking up from row j>i)
  bit3 fo : F(i,p) == H(i,p-1) + GapOE                  (F chain opens at
            p-1, terminates an I run walking left)

The host walker below reproduces backcal's decisions exactly: the same
priority order (D/D2 before M on fresh entry, M first after a match — the
prior_match flag, reset at the band's left edge), and the same run-length
scans (smallest-n score identity == walk until the chain-open bit).
Piecewise 2 (dual affine) keeps the plane path: its I-run identity mixes
both gap chains (max(t1, t2), bsalign.h:3810) and is not per-chain local.

This module holds the scalar reference implementations; the Pallas kernel
emits identical codes on device (ops/banded8_pallas.py), packed two cells
per byte, and native/rowops.cpp walks them in C for the batch driver.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..cigar import AlnResult
from ..constants import MODE_OVERLAP, SCORE_MIN, WORDSIZE, mode_type
from ..oracle import banded8 as O

WS = WORDSIZE
NEG = -(1 << 40)


def _row_habs(st, W: int) -> np.ndarray:
    """Absolute H over natural band positions [BW] from one stored row."""
    arr = st.ubegs[None, :WS].astype(np.int64) \
        + np.cumsum(st.us.astype(np.int64), axis=0)    # [W, WS]
    return arr.T.reshape(-1)                           # pos = y*W + x


def _rowhead(mode: int, piecewise: int, i: int, gapo1, gape1, gapo2, gape2):
    if mode_type(mode) == MODE_OVERLAP or i == 0:
        return 0
    if piecewise < 2:
        return gapo1 + gape1 * i
    return max(gapo1 + gape1 * i, gapo2 + gape2 * i)


def unpack_codes(words: np.ndarray, W: int) -> np.ndarray:
    """[T, ceil(W/8), WS] packed int32 words (8 nibbles along x) ->
    [T, W*WS] uint8 codes in natural band order p = y*W + x."""
    T = words.shape[0]
    x = np.arange(W)
    cx = (words[:, x >> 3, :] >> (4 * (x & 7))[None, :, None]) & 15
    return cx.transpose(0, 2, 1).reshape(T, W * WS).astype(np.uint8)


def codes_from_rows(qseq: np.ndarray, tseq: np.ndarray, init_row, rows,
                    begs: List[int], mode: int, bandwidth: int,
                    mtx: np.ndarray, gapo1: int, gape1: int,
                    gapo2: int, gape2: int) -> np.ndarray:
    """Reference extraction of the per-cell code planes ([tlen, BW] uint8)
    from stored rows — ground truth for the kernel's emitted codes and the
    oracle input for decode_codes tests."""
    piecewise = O.get_piecewise(gapo1, gape1, gapo2, gape2, bandwidth)
    if piecewise == 2:
        raise NotImplementedError("codes cover piecewise 0/1 only")
    W = bandwidth // WS
    BW = bandwidth
    GapOE = gapo1 + gape1
    qlen, tlen = len(qseq), len(tseq)
    codes = np.zeros((tlen, BW), np.uint8)
    prev = init_row
    bprev = 0
    h_prev = _row_habs(init_row, W)
    for i in range(tlen):
        st = rows[i]
        bi = begs[i]
        mov = bi - bprev
        habs = _row_habs(st, W)
        xi = np.arange(BW)
        p = bi + xi
        valid = p < qlen
        x = xi + mov                        # cell-rule x = p - beg(i-1)
        # diagonal predecessor H(i-1, p-1): index x-1 in prev row's band
        dix = np.clip(x - 1, 0, BW - 1)
        hs0 = np.where((x >= 1) & (x - 1 < BW), h_prev[dix], NEG)
        # p == bprev (x == 0): ubegs[0] anchor / row-head cost
        head = int(prev.ubegs[0])
        rh = _rowhead(mode, piecewise, i, gapo1, gape1, gapo2, gape2)
        hs0 = np.where(x == 0, np.where(p > 0, head, rh), hs0)
        s = mtx.reshape(16)[
            np.clip(qseq[np.clip(p, 0, qlen - 1)], 0, 3) * 4
            + int(tseq[i])].astype(np.int64)
        m = (habs - hs0) == s
        # deletion identity h == u + e' at prev-row index x
        ux = np.clip(x, 0, BW - 1)
        u_nat = prev.us.T.reshape(-1).astype(np.int64)
        if prev.es is not None:
            e_nat = prev.es.T.reshape(-1).astype(np.int64)
        else:
            e_nat = np.full(BW, GapOE, np.int64)
        uv = np.where((x >= 0) & (x < BW), u_nat[ux], 0)
        ev = np.where((x >= 0) & (x < BW), e_nat[ux], GapOE)
        d = (habs - hs0) == (uv + ev)
        # E-open: stored e' == GapOE (piecewise 0 chains are length-1)
        if st.es is not None:
            eo = st.es.T.reshape(-1) == GapOE
        else:
            eo = np.ones(BW, bool)
        # F-open: F(i,p) == H(i,p-1) + GapOE along the row, via the
        # telescoped running max F[k] - k*gape = max_j<k (H[j]+GapOE-(j+1)g)
        base = habs + GapOE - (np.arange(BW, dtype=np.int64) + 1) * gape1
        racc = np.maximum.accumulate(base)
        fo = np.zeros(BW, bool)
        fo[1:] = racc[:-1] == base[:-1]
        codes[i] = (m.astype(np.uint8) | (d.astype(np.uint8) << 1)
                    | (eo.astype(np.uint8) << 2) | (fo.astype(np.uint8) << 3))
        codes[i][~valid] = 0
        prev = st
        bprev = bi
        h_prev = habs
    return codes


def decode_codes(qseq: np.ndarray, tseq: np.ndarray, codes: np.ndarray,
                 begs: List[int], init_eo: np.ndarray, mode: int,
                 bandwidth: int, rs: AlnResult) -> List[int]:
    """Walk packed traceback codes into a CIGAR — bit-for-bit the decisions
    of backcal (bsalign.h:3704-3852) without any score arithmetic.

    rs.qe/rs.te hold the 0-based end cell on entry (same contract as
    backcal); init_eo is the E-open bit vector of the init row (row -1).
    """
    BW = bandwidth
    acc = O._CigAcc()
    rs.qb = rs.qe
    rs.qe += 1
    rs.tb = rs.te
    rs.te += 1
    rs.mat = rs.mis = rs.ins = rs.dele = rs.aln = 0
    qb, tb = rs.qb, rs.tb
    prior_match = 0

    def eo_bit(j: int, p: int) -> bool:
        if j <= -2:
            return True
        if j == -1:
            return bool(init_eo[p]) if 0 <= p < BW else True
        xi = p - begs[j]
        if 0 <= xi < BW:
            return bool(codes[j, xi] & 4)
        return True      # out-of-band: open (backcal default e' = GapOE)

    def fo_bit(j: int, p: int) -> bool:
        xi = p - begs[j]
        if 0 <= xi < BW:
            return bool(codes[j, xi] & 8)
        return True

    while qb >= 0 and tb >= 0:
        bprev = begs[tb - 1] if tb >= 1 else 0
        x = qb - bprev
        if qb == bprev and qb > 0:
            prior_match = 0
        ci = int(codes[tb, qb - begs[tb]]) \
            if 0 <= qb - begs[tb] < BW else 0
        m = ci & 1
        d = (ci >> 1) & 1
        if x > BW:
            bt = 1
        elif x == BW:
            bt = 0 if m else 1
        elif prior_match:
            bt = 0 if m else (2 if d else 1)
        else:
            bt = 2 if d else (0 if m else 1)
        prior_match = 1
        if bt == 0:       # M
            if qseq[qb] == tseq[tb]:
                rs.mat += 1
            else:
                rs.mis += 1
            acc.push(0, 1)
            rs.aln += 1
            qb -= 1
            tb -= 1
        elif bt == 2:     # D run: walk up until the E chain opens
            sz = 1
            j = tb - 1
            while not eo_bit(j, qb) and j >= 0:
                sz += 1
                j -= 1
            acc.push(2, sz)
            rs.dele += sz
            rs.aln += sz
            tb -= sz
        else:             # I run: walk left until the F chain opens
            if qb <= 0:
                acc.push(1, 1)
                rs.ins += 1
                rs.aln += 1
                qb -= 1
            else:
                sz = 1
                p = qb
                while not fo_bit(tb, p) and sz + begs[tb] <= qb:
                    sz += 1
                    p -= 1
                acc.push(1, sz)
                rs.ins += sz
                rs.aln += sz
                qb -= sz
    rs.qb, rs.tb = qb, tb
    if mode_type(mode) == MODE_OVERLAP:
        pass
    else:
        if rs.qb >= 0:
            op, sz = 1, rs.qb + 1
            rs.ins += sz
            rs.qb = -1
        elif rs.tb >= 0:
            op, sz = 2, rs.tb + 1
            rs.dele += sz
            rs.tb = -1
        else:
            op = sz = 0
        rs.aln += sz
        if sz:
            acc.push(op, sz)
    cigars = acc.finish()
    rs.qb += 1
    rs.tb += 1
    return cigars
