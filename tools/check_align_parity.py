#!/usr/bin/env python
"""Compare the oracle `align` output vs the compiled reference binary."""
from __future__ import annotations

import argparse
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from bsalign_tpu import cigar as C  # noqa: E402
from bsalign_tpu import seqs as S  # noqa: E402
from bsalign_tpu.constants import MODE_NAMES, roundup  # noqa: E402
from bsalign_tpu.oracle import banded8 as B8  # noqa: E402

REF_BIN = "/root/build/reference/bsalign"


def format_align_output(qtag, ttag, qseq, tseq, rs, cigars):
    q, m, t = C.cigar2alnstr(qseq, tseq, rs, cigars, rs.aln)
    head = (f"{qtag}\t{len(qseq)}\t+\t{rs.qb}\t{rs.qe}\t{ttag}\t{len(tseq)}"
            f"\t+\t{rs.tb}\t{rs.te}\t{rs.score}\t{1.0 * rs.mat / rs.aln:.3f}"
            f"\t{rs.mat}\t{rs.mis}\t{rs.ins}\t{rs.dele}")
    return f"{head}\n{q}\n{m}\n{t}\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("fasta")
    ap.add_argument("-m", default="overlap")
    ap.add_argument("-W", type=int, default=0)
    ap.add_argument("-M", type=int, default=2)
    ap.add_argument("-X", type=int, default=6)
    ap.add_argument("-O", type=int, default=3)
    ap.add_argument("-E", type=int, default=2)
    ap.add_argument("-Q", type=int, default=0)
    ap.add_argument("-P", type=int, default=0)
    args = ap.parse_args()

    ref_out = subprocess.run(
        [REF_BIN, "align", "-m", args.m, "-W", str(args.W), "-M", str(args.M),
         "-X", str(args.X), "-O", str(args.O), "-E", str(args.E),
         "-Q", str(args.Q), "-P", str(args.P), args.fasta],
        capture_output=True, text=True, check=True).stdout

    mode = MODE_NAMES[args.m]
    mtx = B8.set_score_matrix(args.M, -args.X)
    recs = list(S.read_fastx(args.fasta))
    mine = []
    for i in range(0, len(recs) - 1, 2):
        q, t = recs[i], recs[i + 1]
        qseq, tseq = q.codes, t.codes
        W = args.W if args.W > 0 else roundup(len(qseq), 16)
        rs, cigars = B8.pairwise(qseq, tseq, mode, W, mtx, -args.O, -args.E,
                                 -args.Q, -args.P)
        if rs.mat:
            mine.append(format_align_output(q.tag, t.tag, qseq, tseq, rs, cigars))
    mine = "".join(mine)
    if mine == ref_out:
        print(f"PARITY OK ({len(recs)//2} pairs, mode={args.m} W={args.W})")
        return 0
    # show first diff
    a = ref_out.splitlines()
    b = mine.splitlines()
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            print(f"DIFF at line {i}:\nref : {x[:200]}\nmine: {y[:200]}")
            break
    else:
        print(f"length mismatch ref={len(a)} mine={len(b)}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
