#!/usr/bin/env python
"""Compare the oracle `edit` output vs the compiled reference binary."""
from __future__ import annotations

import argparse
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from bsalign_tpu import cigar as C  # noqa: E402
from bsalign_tpu import seqs as S  # noqa: E402
from bsalign_tpu.constants import MODE_NAMES  # noqa: E402
from bsalign_tpu.oracle import edit as E  # noqa: E402

REF_BIN = "/root/build/reference/bsalign"


def format_edit_output(qtag, ttag, qseq, tseq, rs, cigars):
    q, m, t = C.cigar2alnstr(qseq, tseq, rs, cigars, rs.aln)
    head = (f"{qtag}\t{len(qseq)}\t+\t{rs.qb}\t{rs.qe}\t{ttag}\t{len(tseq)}"
            f"\t+\t{rs.tb}\t{rs.te}\t{rs.score}\t{1.0 * rs.mat / rs.aln:.3f}"
            f"\t{rs.mat}\t{rs.mis}\t{rs.ins}\t{rs.dele}")
    return f"{head}\n{q}\n{m}\n{t}\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("fasta")
    ap.add_argument("-m", default="global")
    ap.add_argument("-W", type=int, default=0)
    ap.add_argument("-k", type=int, default=13)
    args = ap.parse_args()

    ref_out = subprocess.run(
        [REF_BIN, "edit", "-m", args.m, "-W", str(args.W), "-k", str(args.k),
         args.fasta], capture_output=True, text=True, check=True).stdout

    mode = MODE_NAMES[args.m]
    recs = list(S.read_fastx(args.fasta))
    mine = []
    for i in range(0, len(recs) - 1, 2):
        q, t = recs[i], recs[i + 1]
        qseq, tseq = q.codes, t.codes
        if args.m == "kmer":
            rs, cigars = E.kmer_edit_pairwise(args.k, qseq, tseq)
        else:
            rs, cigars = E.edit_pairwise(qseq, tseq, mode, args.W)
        if rs.mat:
            mine.append(format_edit_output(q.tag, t.tag, qseq, tseq, rs, cigars))
    mine = "".join(mine)
    if mine == ref_out:
        print(f"PARITY OK ({len(recs)//2} pairs, edit mode={args.m} W={args.W} k={args.k})")
        return 0
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
