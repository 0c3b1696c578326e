"""Scalar oracle of the 2-bit bit-parallel edit-distance aligner.

Replicates striped_seqedit_* (bsalign.h:612-1206) and
kmer_striped_seqedit_pairwise (bsalign.h:1209-1536). The reference stores row
deltas u in {-1,0,+1} as two bit-planes and resolves the horizontal carry with
a SWAT convergence loop; since the row values are the unique fixpoint of the
delta recurrence, this oracle computes them directly in natural order. Band
trajectory, boundary conditions, scoring and traceback tie-breaks are
reproduced exactly.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..cigar import AlnResult
from ..constants import (MODE_EXTEND, MODE_GLOBAL, MODE_KMER, MODE_OVERLAP,
                         mode_type, roundup)
from .banded8 import c_div

MAX_B4 = 0x7FFFFFFF


def _row_trans(u_prev: np.ndarray, match: np.ndarray, v_in: int) -> np.ndarray:
    """One edit-DP row in delta form (truth tables bsalign.h:723-765):
    h = 0 if (match or u_prev==-1 or v==-1) else 1; u' = h - v; v' = h - u_prev.
    """
    from ..native import rowops as _NR
    if _NR.available():
        return _NR.edit_row(np.ascontiguousarray(u_prev),
                            np.ascontiguousarray(match, np.uint8), v_in)
    n = len(u_prev)
    u_new = np.empty(n, dtype=np.int8)
    v = v_in
    for x in range(n):
        up = int(u_prev[x])
        h = 0 if (match[x] or up == -1 or v == -1) else 1
        u_new[x] = h - v
        v = h - up
    return u_new


def _select_bandwidth(qlen: int, tlen: int, mode: int, bandwidth: int) -> int:
    """bsalign.h:1055-1067."""
    if mode_type(mode) in (MODE_OVERLAP, MODE_EXTEND):
        return roundup(qlen, 64)
    bandwidth = roundup(bandwidth, 64)
    if bandwidth == 0 or bandwidth > qlen:
        bandwidth = roundup(qlen, 64)
    if bandwidth < qlen:
        if bandwidth < ((qlen + tlen - 1) // tlen) + 1:
            bandwidth = roundup((qlen + tlen - 1) // tlen + 1, 64)
    return bandwidth


def edit_backtrace(uts: np.ndarray, begs: List[int], qseq: np.ndarray,
                   x: int, tseq: np.ndarray, y: int, mode: int,
                   ) -> Tuple[AlnResult, List[int]]:
    """bsalign.h:965-1044. uts[i+1] = u-row after target base i; uts[0] = init.
    Priority: match > I(u==+1) > D(u_prev==-1) > mismatch."""
    rs = AlnResult()
    rs.qe = x + 1
    rs.te = y + 1
    cigars: List[int] = []

    def push(op: int, sz: int = 1) -> None:
        if cigars and (cigars[-1] & 0xF) == op:
            cigars[-1] += sz << 4
        else:
            cigars.append((sz << 4) | op)

    while x >= 0 and y >= 0:
        if qseq[x] == tseq[y]:
            rs.mat += 1
            op = 0
            x -= 1
            y -= 1
        else:
            u_cur = int(uts[y + 1][x - begs[y + 1]])
            if u_cur == 1:
                rs.ins += 1
                op = 1
                x -= 1
            else:
                u_prev = int(uts[y][x - begs[y]])
                if u_prev == -1:
                    rs.dele += 1
                    op = 2
                    y -= 1
                else:
                    rs.mis += 1
                    op = 0
                    x -= 1
                    y -= 1
        push(op)
    rs.qb = x + 1
    rs.tb = y + 1
    if rs.qb:
        push(1, rs.qb)
        rs.ins += rs.qb
        rs.qb = 0
    if mode_type(mode) in (MODE_GLOBAL, MODE_EXTEND) and rs.tb:
        push(2, rs.tb)
        rs.dele += rs.tb
        rs.tb = 0
    rs.aln = rs.mat + rs.mis + rs.ins + rs.dele
    return rs, cigars[::-1]


def edit_pairwise(qseq: np.ndarray, tseq: np.ndarray, mode: int,
                  bandwidth: int) -> Tuple[AlnResult, List[int]]:
    """bsalign.h:1046-1206."""
    qlen, tlen = len(qseq), len(tseq)
    if qlen == 0 or tlen == 0:
        return AlnResult(), []
    from ..native import rowops as _NR
    if _NR.available():
        return _NR.edit_align(qseq, tseq, mode_type(mode), bandwidth)
    bandwidth = _select_bandwidth(qlen, tlen, mode, bandwidth)
    is_overlap = mode_type(mode) == MODE_OVERLAP
    is_extend = mode_type(mode) == MODE_EXTEND
    uts = np.empty((tlen + 1, bandwidth), dtype=np.int8)
    uts[0] = 1  # row_init: u=+1 everywhere (bsalign.h:653-656)
    begs = [0] * (tlen + 1)
    rx, ry = qlen - 1, tlen - 1
    smin = MAX_B4
    sbeg = 0
    rbeg0 = 0
    for i in range(tlen):
        if is_overlap or is_extend:
            rbeg1 = 0
        else:
            rbeg1 = (i * qlen) // tlen
            rbeg1 = 0 if rbeg1 < bandwidth // 2 else rbeg1 - bandwidth // 2
            if rbeg1 + bandwidth > roundup(qlen, 64):
                rbeg1 = roundup(qlen, 64) - bandwidth
        begs[i + 1] = rbeg1
        movx = rbeg1 - rbeg0
        u_old = uts[i]
        # row_movx (bsalign.h:658-721)
        if is_overlap:
            sbeg = 0
            u_shift = u_old
        else:
            if movx:
                mv = min(movx, bandwidth)
                sbeg += int(np.sum(u_old[:mv]))
            sbeg += 1
            if movx == 0:
                u_shift = u_old
            elif movx >= bandwidth:
                u_shift = np.ones(bandwidth, dtype=np.int8)
            else:
                u_shift = np.empty(bandwidth, dtype=np.int8)
                u_shift[: bandwidth - movx] = u_old[movx:]
                u_shift[bandwidth - movx:] = 1
        tbase = int(tseq[i])
        pos = rbeg1 + np.arange(bandwidth)
        match = (pos < qlen) & (qseq[np.minimum(pos, qlen - 1)] == tbase)
        v_in = 0 if is_overlap else 1
        u_new = _row_trans(u_shift, match, v_in)
        uts[i + 1] = u_new
        if is_overlap or is_extend:
            srow = sbeg + int(np.sum(u_new))
            for k in range(rbeg1 + bandwidth, qlen, -1):
                srow -= int(u_new[k - 1 - rbeg1])
            if srow < smin:
                smin = srow
                rx = qlen - 1
                ry = i
        rbeg0 = rbeg1
    u_last = uts[tlen]
    if is_extend:
        # rowmin: first position achieving the row minimum (bsalign.h:813-963)
        pref = sbeg + np.cumsum(u_last.astype(np.int64))
        k = int(np.argmin(pref))
        srow = int(pref[k])
        if srow < smin:
            smin = srow
            rx = k
            ry = tlen - 1
    rs, cigars = edit_backtrace(uts, begs, qseq, rx, tseq, ry, mode)
    if is_overlap:
        rs.score = smin + rs.te - rs.tb
    elif is_extend:
        rs.score = smin
    else:
        score = sbeg + int(np.sum(u_last))
        for k in range(rbeg0 + bandwidth, qlen, -1):
            score -= int(u_last[k - 1 - rbeg0])
        rs.score = score
    return rs, cigars


def _kmer_chain(qseq: np.ndarray, tseq: np.ndarray, ksz: int,
                ) -> Optional[List[Tuple[int, int]]]:
    """Unique-kmer 1:1 matching + LIS chaining + outlier filtering
    (bsalign.h:1219-1434). Returns [(qoff, toff)] or None when coverage is
    too small to trust the chain."""
    qlen, tlen = len(qseq), len(tseq)
    cmin = int(min(qlen, tlen) * 0.05 + 1)
    cmin = min(cmin, 2 * ksz)
    kmk = (1 << (2 * ksz)) - 1
    sft = (ksz - 1) * 2

    def kmerize(seq: np.ndarray):
        # vectorized rolling fwd/rc kmers: values/dirs identical to the
        # scalar recurrence kf=((kf<<2)|b)&kmk, kr=(kr>>2)|(comp(b)<<sft)
        m = len(seq) - ksz + 1
        if m <= 0:
            z = np.zeros(0, np.int64)
            return z, z
        win = np.lib.stride_tricks.sliding_window_view(
            seq.astype(np.int64), ksz)
        wf = (4 ** np.arange(ksz - 1, -1, -1)).astype(np.int64)
        wr = (4 ** np.arange(ksz)).astype(np.int64)
        kf = win @ wf
        kr = (3 - win) @ wr
        dirn = kr < kf
        return np.where(dirn, kr, kf), dirn.astype(np.int64)

    vq, dq = kmerize(qseq)
    vt, dt = kmerize(tseq)
    vals = np.concatenate([vq, vt])
    dirs = np.concatenate([dq, dt])
    flgs = np.concatenate([np.zeros(len(vq), np.int64),
                           np.ones(len(vt), np.int64)])
    offs = np.concatenate([np.arange(len(vq), dtype=np.int64),
                           np.arange(len(vt), dtype=np.int64)])
    # stable sort by kmer value keeps q entries ahead of t entries on ties,
    # matching the reference's stable sort of the combined kmer list
    order = np.argsort(vals, kind="stable")
    v, d, f, o = vals[order], dirs[order], flgs[order], offs[order]
    n = len(v)
    # unique 1:1 pairs: kmer seen exactly twice, once per sequence, same dir
    if n >= 2:
        eq_next = np.zeros(n, bool)
        eq_next[:-1] = v[:-1] == v[1:]
        eq_prev = np.zeros(n, bool)
        eq_prev[1:] = eq_next[:-1]
        i0 = np.flatnonzero(eq_next & ~eq_prev)
        ok = (~eq_next[i0 + 1]) & (f[i0] != f[i0 + 1]) & (d[i0] == d[i0 + 1])
        i0 = i0[ok]
        qoffs, toffs = o[i0], o[i0 + 1]
    else:
        qoffs = toffs = np.zeros(0, np.int64)
    if len(qoffs) * ksz < cmin:
        return None
    order2 = np.argsort(qoffs, kind="stable")
    khits: List[Tuple[int, int]] = list(
        zip(qoffs[order2].tolist(), toffs[order2].tolist()))
    kcnt = len(khits)
    # LIS over target offsets, replicating the reference's exact linking rule
    # (bsalign.h:1285-1330, including its predecessor-of-predecessor link)
    lis0 = [0] * kcnt
    lis1 = [None] * kcnt
    xlen = 1
    for i in range(1, kcnt):
        t_i = khits[i][1]
        e = xlen - 1
        if t_i > khits[lis0[e]][1]:
            lis1[i] = lis0[e]
            lis0[xlen] = i
            xlen += 1
        elif t_i <= khits[lis0[0]][1]:
            lis1[i] = None
            lis0[0] = i
        else:
            lo, hi = 0, xlen
            while lo < hi:
                mid = lo + ((hi - lo) >> 1)
                if t_i > khits[lis0[mid]][1]:
                    lo = mid + 1
                elif t_i < khits[lis0[mid]][1]:
                    hi = mid
                else:
                    lo = mid
                    break
            lis1[i] = lis1[lis0[lo - 1]]
            lis0[lo] = i
    flags = [False] * kcnt
    cov = 0
    e = None
    m = lis0[xlen - 1]
    while m is not None:
        flags[m] = True
        toff = khits[m][1]
        if e is None or toff + ksz <= e:
            cov += ksz
        else:
            cov += e - toff
        e = toff
        m = lis1[m]
    if cov < cmin:
        return None
    # iterative mean/median outlier filter (bsalign.h:1346-1393)
    while True:
        deltas = [khits[i][0] - khits[i][1] for i in range(kcnt) if flags[i]]
        e = len(deltas)
        if e * ksz < cmin:
            break
        tot = sum(deltas)
        mean = c_div(tot, e)
        median = int(np.partition(np.asarray(deltas, dtype=np.int64),
                                  e // 2)[e // 2])
        var = abs(median - mean) * 3
        var = max(var, 50)
        removed = 0
        for i in range(kcnt):
            if not flags[i]:
                continue
            delta = khits[i][0] - khits[i][1]
            if abs(delta - mean) > var:
                flags[i] = False
                removed += 1
        if removed == 0:
            break
    chain = [khits[i] for i in range(kcnt) if flags[i]]
    # coverage over target offsets with overlap dedup (bsalign.h:1402-1415)
    m = 0
    e = 0
    for (_, toff) in chain:
        if toff >= e + ksz:
            m += ksz
        else:
            m += toff + ksz - e
        e = toff + ksz
    if m < cmin:
        return None
    return chain


def kmer_edit_pairwise(ksz: int, qseq: np.ndarray, tseq: np.ndarray,
                       ) -> Tuple[AlnResult, List[int]]:
    """bsalign.h:1209-1536: segmented edit alignment guided by kmer synteny."""
    if ksz > 15:
        ksz = 15
    from ..native import rowops as _NR
    if _NR.available():
        return _NR.kmer_edit(ksz, qseq, tseq)
    qlen, tlen = len(qseq), len(tseq)
    chain = _kmer_chain(qseq, tseq, ksz)
    if not chain:
        return edit_pairwise(qseq, tseq, MODE_GLOBAL, 0)
    RS = AlnResult()
    cigars: List[int] = []

    def push(op: int, sz: int) -> None:
        if cigars and (cigars[-1] & 0xF) == op:
            cigars[-1] += sz << 4
        else:
            cigars.append((sz << 4) | op)

    qb = tb = ml = 0
    mode = MODE_KMER
    kmap = len(chain)
    for i in range(kmap + 1):
        if i == kmap:
            qe, te = qlen, tlen
            mode = MODE_EXTEND
        else:
            qe = chain[i][0] + ksz // 2
            te = chain[i][1] + ksz // 2
            ml += 1
        if not (qb == qe and tb == te):
            if ml:
                push(0, ml)
                RS.mat += ml
                RS.aln += ml
                ml = 0
            if mode == MODE_KMER:
                rq = qseq[:qe][::-1].copy()
                rt = tseq[:te][::-1].copy()
                rs2, cg2 = edit_pairwise(rq[qb:], rt[tb:], MODE_EXTEND, 0)
                cigars.extend(cg2)
                cigars.reverse()
                RS.qb = qe - rs2.qe
                RS.tb = te - rs2.te
                RS.qe = qe
                RS.te = te
            else:
                rs2, cg2 = edit_pairwise(qseq[qb:qe], tseq[tb:te], mode, 0)
                for cg in cg2:
                    push(cg & 0xF, cg >> 4)
                RS.qe = qb + rs2.qe
                RS.te = tb + rs2.te
            RS.mat += rs2.mat
            RS.mis += rs2.mis
            RS.ins += rs2.ins
            RS.dele += rs2.dele
            RS.aln += rs2.aln
            RS.score += rs2.score
        qb = qe + 1
        tb = te + 1
        mode = MODE_GLOBAL
    return RS, cigars
