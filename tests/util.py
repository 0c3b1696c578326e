import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bsalign_tpu import cigar as C
from bsalign_tpu import seqs as S


def gen_pair(rng, length, err, mix=(0.23, 0.31, 0.46)):
    ref = rng.integers(0, 4, length).astype(np.uint8)
    psub, pins, pdel = (err * m / sum(mix) for m in mix)
    out = []
    i = 0
    while i < length:
        r = rng.random()
        if r < psub:
            out.append((int(ref[i]) + rng.integers(1, 4)) & 3)
            i += 1
        elif r < psub + pins:
            out.append(rng.integers(0, 4))
        elif r < psub + pins + pdel:
            i += 1
        else:
            out.append(int(ref[i]))
            i += 1
    return np.array(out, dtype=np.uint8), ref


def write_pairs_fasta(path, pairs):
    bases = "ACGT"
    with open(path, "w") as f:
        for i, (q, t) in enumerate(pairs):
            f.write(f">p{i}_q\n" + "".join(bases[b] for b in q) + "\n")
            f.write(f">p{i}_t\n" + "".join(bases[b] for b in t) + "\n")


def run_ref(ref_bin, sub, *args):
    return subprocess.run([ref_bin, sub, *map(str, args)],
                          capture_output=True, text=True, check=True).stdout


def format_pairwise_output(qtag, ttag, qseq, tseq, rs, cigars):
    q, m, t = C.cigar2alnstr(qseq, tseq, rs, cigars, rs.aln)
    head = (f"{qtag}\t{len(qseq)}\t+\t{rs.qb}\t{rs.qe}\t{ttag}\t{len(tseq)}"
            f"\t+\t{rs.tb}\t{rs.te}\t{rs.score}\t{1.0 * rs.mat / rs.aln:.3f}"
            f"\t{rs.mat}\t{rs.mis}\t{rs.ins}\t{rs.dele}")
    return f"{head}\n{q}\n{m}\n{t}\n"
