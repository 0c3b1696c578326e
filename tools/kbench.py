#!/usr/bin/env python
"""Quick banded-8 kernel sweep on the real chip: Gcells/s across
BL (batch lanes per block), Rs (rows per chunk), defer on/off, emit mode.

Usage: python tools/kbench.py [--B 256] [--L 2000] [--W 128]
       [--sweep "BL=128,Rs=16,defer=1;BL=256,Rs=16,defer=0"]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--L", type=int, default=2000)
    ap.add_argument("--W", type=int, default=128)
    ap.add_argument("--queue", type=int, default=10)
    ap.add_argument("--emit", default="planes")
    ap.add_argument("--sweep", default="BL=128,Rs=16,defer=1;"
                                       "BL=128,Rs=16,defer=0")
    args = ap.parse_args()

    import jax
    from bsalign_tpu.align import pairwise as P
    from bsalign_tpu.oracle import banded8 as O
    from bsalign_tpu.ops import banded8_pallas as K

    print("backend:", jax.default_backend(), flush=True)
    qs, ts = gen_pairs(args.B, args.L)
    BW = args.W
    mtx = O.set_score_matrix(2, -6)
    qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, BW)
    us0, es0, qs0, ub0, _ = P._init_state(0, BW, 1, 2, -6, -3, -2, 0, 0,
                                          len(qs))
    base_args = (qpad, qlens, tpad, tlens, P._mtx5(mtx), rby,
                 us0, es0, qs0, ub0)
    cells = float(np.sum(tlens)) * BW

    for spec in args.sweep.split(";"):
        kw = {}
        for kv in spec.split(","):
            k, v = kv.split("=")
            kw[k] = int(v)
        BL = kw.pop("BL", 128)
        Rs = kw.pop("Rs", 16)
        defer = bool(kw.pop("defer", 1))
        S = kw.pop("S", 1)
        ek = {}
        if args.emit == "codes":
            ek["codes"] = True
        elif args.emit == "none":
            ek["scores_only"] = True
        try:
            fwd = K.make_forward(T, BW // 16, 0, 1, -3, -2, 0, 0, 2, -6,
                                 BL=BL, Rs=Rs, S=S, defer=defer,
                                 interpret=False, **ek)
            call, ops, _meta = fwd.prepare(*base_args)
            dev = [jax.device_put(a) for a in ops]
            t0 = time.time()
            outs = call(*dev)
            np.asarray(outs[-1])
            tc = time.time() - t0
            t0 = time.time()
            for _ in range(args.queue):
                outs = call(*dev)
            np.asarray(outs[-1])
            dt = (time.time() - t0) / args.queue
            print(f"BL={BL} Rs={Rs} defer={int(defer)} S={S} "
                  f"emit={args.emit}: {cells / dt / 1e9:.2f} Gcells/s "
                  f"({dt * 1e3:.1f} ms/call, compile+1st {tc:.1f}s)",
                  flush=True)
        except Exception as e:
            print(f"BL={BL} Rs={Rs} defer={int(defer)} S={S}: "
                  f"FAIL {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
