#!/usr/bin/env python
"""POA window throughput bench.

Generates N independent ONT-like read windows (20 reads x 800 bp, 15% error)
and runs the full BSPOA pipeline (end + tidy_msa + call_snvs) over them,
printing windows/s and per-window latency. `--nproc` fans windows out over
worker processes (poa/batch.py); on a multi-core production host this scales
near-linearly since windows share nothing.

Reference point: the reference binary does one such window in ~50 ms of
single-thread CPU (bspoa.h end_bspoa path); it has no batch mode at all
(SURVEY.md section 2.6) -- throughput there means one process per window.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bsalign_tpu.poa.batch import run_windows  # noqa: E402
from bsalign_tpu.poa.core import BSPOAPar  # noqa: E402


def gen_window(rng, nreads=20, reflen=800, err=0.15):
    ref = rng.integers(0, 4, reflen)
    reads = []
    sub = ins = err / 3
    dele = err / 3
    for _ in range(nreads):
        out = []
        for b in ref.tolist():
            r = rng.random()
            if r < dele:
                continue
            if r < dele + sub:
                out.append(int(rng.integers(0, 4)))
            else:
                out.append(b)
            if rng.random() < ins:
                out.append(int(rng.integers(0, 4)))
        reads.append("".join("ACGT"[b] for b in out))
    return reads


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--nwin", type=int, default=8)
    ap.add_argument("-p", "--nproc", type=int, default=0)
    ap.add_argument("-r", "--nreads", type=int, default=20)
    ap.add_argument("-l", "--reflen", type=int, default=800)
    args = ap.parse_args(argv)
    rng = np.random.default_rng(7)
    wins = [gen_window(rng, args.nreads, args.reflen)
            for _ in range(args.nwin)]
    # warm the native lib build outside the timed region
    run_windows(wins[:1], BSPOAPar())
    t0 = time.time()
    res = run_windows(wins, BSPOAPar(), nproc=args.nproc)
    dt = time.time() - t0
    ok = sum(1 for r in res if len(r.cns))
    print(f"{ok}/{args.nwin} windows, {dt:.2f}s total, "
          f"{dt / args.nwin * 1e3:.0f} ms/window, "
          f"{args.nwin / dt:.2f} windows/s (nproc={args.nproc or 1})")


if __name__ == "__main__":
    main()
