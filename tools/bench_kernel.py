#!/usr/bin/env python
"""Micro-bench harness for banded8 Pallas kernel variants.

Usage: python tools/bench_kernel.py [module_path ...]
Each module must expose make_forward(...) with the banded8_pallas signature.
Times the forward with device-resident operands, QUEUE launches amortized,
host fetch of the last (small) output forcing completion.
"""
import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, L, BW, QUEUE = 256, 2000, 128, 10


def load(path):
    if "/" not in path and not path.endswith(".py"):
        import importlib as il
        return il.import_module(path)
    name = os.path.basename(path)[:-3]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def bench(mod, qs, ts, piecewise=1, **mkkw):
    import jax
    from bsalign_tpu.align import pairwise as P
    from bsalign_tpu.oracle import banded8 as O
    mtx = O.set_score_matrix(2, -6)
    qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, BW)
    us0, es0, qs0, ub0, _ = P._init_state(0, BW, piecewise, 2, -6, -3, -2,
                                          0, 0, len(qs))
    args = (qpad, qlens, tpad, tlens, P._mtx5(mtx), rby, us0, es0, qs0, ub0)
    fwd = mod.make_forward(T, BW // 16, 0, piecewise, -3, -2, 0, 0, 2, -6,
                           **mkkw)
    call, ops, _meta = fwd.prepare(*args)
    dev = [jax.device_put(a) for a in ops]
    outs = call(*dev)
    np.asarray(outs[-1])
    t0 = time.time()
    for _ in range(QUEUE):
        outs = call(*dev)
    np.asarray(outs[-1])
    dt = (time.time() - t0) / QUEUE
    cells = float(np.sum(tlens)) * BW
    return cells / dt


def main():
    from bench import gen_pairs
    qs, ts = gen_pairs(B, L)
    for path in sys.argv[1:] or ["bsalign_tpu.ops.banded8_pallas"]:
        mod = load(path)
        g = bench(mod, qs, ts) / 1e9
        print(f"{path}: {g:.2f} Gcells/s")


if __name__ == "__main__":
    main()
