"""`bsalign-tpu cat` — concatenate sequence pieces by overlap alignment.

Mirrors main_cat (main.c:559-647) + cat_cns_seqs / revise_seq_joint_point
(bspoa.h:5567-5632): overlap-align tail(cns, W) x head(next, W) with the
8-bit engine, retry with a 4x window on weak joins, snap the joint into the
longest match run, insert 6 N's when the join is untrustworthy.
"""
from __future__ import annotations

import argparse
import sys
from typing import List, Tuple

import numpy as np

from .. import seqs as S
from ..cigar import AlnResult
from ..oracle import banded8 as B8


def revise_seq_joint_point(cigars: List[int], qe: int, te: int
                           ) -> Tuple[int, int]:
    q = t = 0
    qq = tt = 0
    mx = 0
    for i in range(1, len(cigars) + 1):
        cg = cigars[len(cigars) - i]
        op = cg & 0xF
        ln = cg >> 4
        if op == 0:
            if ln > mx:
                qq, tt = q, t
                mx = ln
            q += ln
            t += ln
        elif op == 1:
            q += ln
        else:
            t += ln
    return qe - qq, te - tt


def cat_cns_seqs(seq1: np.ndarray, seq2: np.ndarray, overlap: int,
                 M: int, X: int, O: int, E: int
                 ) -> Tuple[AlnResult, List[int], int, int]:
    if len(seq1) == 0 or len(seq2) == 0:
        return AlnResult(), [], len(seq1), 0
    mtx = B8.set_score_matrix(M, X)
    qb, qe = 0, len(seq1)
    tb, te = 0, len(seq2)
    if qe > overlap:
        qb = qe - overlap
    if te > overlap:
        te = overlap
    rs, cigars = B8.pairwise(seq1[qb:qe], seq2[tb:te], 1, 0, mtx, O, E, 0, 0)
    if rs.aln < int(0.5 * overlap) or rs.mat < int(rs.aln * 0.9):
        maxl = min(len(seq1), len(seq2), overlap * 4)
        qb, qe = 0, len(seq1)
        tb, te = 0, len(seq2)
        if qe > maxl:
            qb = qe - maxl
        if te > maxl:
            te = maxl
        rs, cigars = B8.pairwise(seq1[qb:qe], seq2[tb:te], 1, 0, mtx, O, E,
                                 0, 0)
    rs.qb += qb
    rs.qe += qb
    rs.tb += tb
    rs.te += tb
    j0, j1 = revise_seq_joint_point(cigars, rs.qe, rs.te)
    return rs, cigars, j0, j1


def run_cat(argv):
    ap = argparse.ArgumentParser(prog="bsalign-tpu cat")
    ap.add_argument("-o", dest="outf", default=None)
    ap.add_argument("-W", type=int, default=1024)
    ap.add_argument("-M", type=int, default=2)
    ap.add_argument("-X", type=int, default=-6)
    ap.add_argument("-O", type=int, default=-3)
    ap.add_argument("-E", type=int, default=-2)
    ap.add_argument("-v", action="count", default=0)
    ap.add_argument("inputs", nargs="*")
    args = ap.parse_args(argv)
    out = open(args.outf, "w") if args.outf else sys.stdout
    cns: List[int] = []
    for path in args.inputs:
        for rec in S.read_fastx(path):
            from ..seqs import encode_dna
            ctg = encode_dna(rec.seq, mask_n=False)
            ol = args.W
            if rec.desc and "overlap=" in rec.desc.lower():
                idx = rec.desc.lower().index("overlap=")
                try:
                    ol = int(rec.desc[idx + 8:].split()[0].split(",")[0])
                except ValueError:
                    pass
            if len(cns) == 0:
                cns = list(ctg)
            else:
                cnsa = np.array(cns, np.uint8)
                rs, cigars, j0, j1 = cat_cns_seqs(cnsa, ctg, ol, args.M,
                                                  args.X, args.O, args.E)
                del cns[j0:]
                if j1 < len(ctg):
                    if rs.aln == 0 or (rs.aln < ol // 2 and rs.aln < 50) \
                            or rs.mat < rs.aln // 2:
                        cns.extend([4] * 6)
                        j1 = 0
                    cns.extend(int(b) for b in ctg[j1:])
    out.write(f">cns len={len(cns)}\n")
    for b in range(0, len(cns), 100):
        out.write("".join("ACGTN-"[c] for c in cns[b:b + 100]) + "\n")
    if args.outf:
        out.close()
    return 0
