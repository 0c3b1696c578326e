#!/usr/bin/env python
"""Generate simulated read pairs (pbsim2-style error profile) as FASTA.

Mirrors the reference's benchmark data recipe (example/ScriptsForPaper.txt:1-15):
a random 'reference' sequence plus a mutated copy at a target identity with
sub/ins/del mix (ONT-ish 23:31:46 by default).
"""
from __future__ import annotations

import argparse
import numpy as np


def mutate(rng: np.random.Generator, seq: np.ndarray, err: float,
           mix=(0.23, 0.31, 0.46)) -> np.ndarray:
    out = []
    psub, pins, pdel = (err * m / sum(mix) for m in mix)
    i = 0
    n = len(seq)
    while i < n:
        r = rng.random()
        if r < psub:
            out.append((int(seq[i]) + rng.integers(1, 4)) & 3)
            i += 1
        elif r < psub + pins:
            out.append(rng.integers(0, 4))
        elif r < psub + pins + pdel:
            i += 1
        else:
            out.append(int(seq[i]))
            i += 1
    return np.array(out, dtype=np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=10, help="number of pairs")
    ap.add_argument("-l", type=int, default=1000, help="approx length")
    ap.add_argument("-e", type=float, default=0.1, help="error rate")
    ap.add_argument("-s", type=int, default=42, help="seed")
    ap.add_argument("--jitter", type=float, default=0.2)
    ap.add_argument("-o", default="/dev/stdout")
    args = ap.parse_args()
    rng = np.random.default_rng(args.s)
    bases = "ACGT"
    with open(args.o, "w") as out:
        for i in range(args.n):
            ln = int(args.l * (1 + rng.uniform(-args.jitter, args.jitter)))
            ref = rng.integers(0, 4, ln).astype(np.uint8)
            mut = mutate(rng, ref, args.e)
            out.write(f">p{i}_q\n" + "".join(bases[b] for b in mut) + "\n")
            out.write(f">p{i}_t\n" + "".join(bases[b] for b in ref) + "\n")


if __name__ == "__main__":
    main()
