#!/usr/bin/env python
"""Benchmark: DP cell-updates/s/chip for the 8-bit banded pairwise engine.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the Pallas forward kernel (the flagship compute path) with
device-resident operands and a forced host fetch of the (small) score output
after a queue of back-to-back launches — i.e. honest device throughput, with
per-launch host/tunnel latency amortized the way a streaming aligner would.
vs_baseline compares against the reference bsalign binary compiled on this
machine (single-threaded SSE4.2, timed via its own -R repeat loop).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REF_SRC = "/root/reference"
REF_BUILD = "/root/build/reference"
REF_BIN = os.path.join(REF_BUILD, "bsalign")

B, L, BW, QUEUE = 256, 2000, 128, 10


def gen_pairs(n, length, err=0.10, seed=0):
    rng = np.random.default_rng(seed)
    qs, ts = [], []
    for _ in range(n):
        t = rng.integers(0, 4, length).astype(np.uint8)
        q = []
        i = 0
        while i < length:
            r = rng.random()
            if r < err * 0.23:
                q.append((int(t[i]) + rng.integers(1, 4)) & 3)
                i += 1
            elif r < err * 0.54:
                q.append(rng.integers(0, 4))
            elif r < err:
                i += 1
            else:
                q.append(int(t[i]))
                i += 1
        qs.append(np.array(q, np.uint8))
        ts.append(t)
    return qs, ts


def bench_tpu(qs, ts):
    import jax
    from bsalign_tpu.align import pairwise as P
    from bsalign_tpu.oracle import banded8 as O
    mtx = O.set_score_matrix(2, -6)
    qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, BW)
    us0, es0, qs0, ub0, _ = P._init_state(0, BW, 1, 2, -6, -3, -2, 0, 0,
                                          len(qs))
    args = (qpad, qlens, tpad, tlens, P._mtx5(mtx), rby, us0, es0, qs0, ub0)
    eng = P._engine()
    fwd = eng.make_forward(T, BW // 16, 0, 1, -3, -2, 0, 0, 2, -6)
    if hasattr(fwd, "prepare"):      # Pallas path: device-resident operands
        call, ops, _meta = fwd.prepare(*args)
        dev = [jax.device_put(a) for a in ops]
        outs = call(*dev)
        np.asarray(outs[-1])         # warm + force completion
        t0 = time.time()
        for _ in range(QUEUE):
            outs = call(*dev)
        np.asarray(outs[-1])
        dt = (time.time() - t0) / QUEUE
    else:                            # XLA engine fallback
        import jax
        dev = [jax.device_put(a) for a in args]
        res = fwd(*dev)
        np.asarray(res.score)
        t0 = time.time()
        for _ in range(QUEUE):
            res = fwd(*dev)
        np.asarray(res.score)
        dt = (time.time() - t0) / QUEUE
    cells = float(np.sum(tlens)) * BW
    return cells / dt


def bench_reference(qs, ts):
    if not os.path.exists(REF_BIN):
        if not os.path.isdir(REF_SRC):
            return None
        os.makedirs(REF_BUILD, exist_ok=True)
        subprocess.run(f"cp -r {REF_SRC}/* {REF_BUILD}/", shell=True,
                       check=True)
        subprocess.run(["make"], cwd=REF_BUILD, check=True,
                       capture_output=True)
    bases = "ACGT"
    fa = "/tmp/bench_pairs.fa"
    n = min(16, len(qs))
    with open(fa, "w") as f:
        for i in range(n):
            f.write(f">q{i}\n" + "".join(bases[b] for b in qs[i]) + "\n")
            f.write(f">t{i}\n" + "".join(bases[b] for b in ts[i]) + "\n")
    R = 20
    t0 = time.time()
    subprocess.run([REF_BIN, "align", "-m", "global", "-W", str(BW),
                    "-R", str(R), fa], capture_output=True, check=True)
    dt = time.time() - t0
    cells = sum(len(t) for t in ts[:n]) * BW * R
    return cells / dt


def main():
    qs, ts = gen_pairs(B, L)
    tpu_cells = bench_tpu(qs, ts)
    ref_cells = bench_reference(qs, ts)
    vs = (tpu_cells / ref_cells) if ref_cells else -1.0
    print(json.dumps({
        "metric": "dp_cell_updates_per_s_per_chip_banded8",
        "value": round(tpu_cells, 1),
        "unit": "cells/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
