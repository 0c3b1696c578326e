#!/usr/bin/env python
"""Data-parallel scaling measurement over the device mesh.

Runs the sharded banded-8 forward at batch = PAIRS_PER_DEV * n for n = 1..N
devices and reports cells/s at each point (the BASELINE.json measurement
points: 1 chip / 1 host / N hosts — on a pod slice this script covers the
single-host axis; multi-host runs launch it under jax.distributed with the
same flags).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bsalign_tpu.parallel import dist
    if dist.enabled_by_env():
        # multi-host: every process runs this script under jax.distributed
        # (BSA_COORD/BSA_NPROCS/BSA_PROC_ID or TPU-pod autodetection)
        dist.init()
    import jax
    from bsalign_tpu.align import pairwise as P
    from bsalign_tpu.oracle import banded8 as O
    from bsalign_tpu.parallel import mesh as M

    L, BW, PER_DEV = 2000, 128, 128
    devs = jax.devices()
    rng = np.random.default_rng(0)
    pid, pcnt = dist.process_info()
    print(f"devices: {len(devs)} x {devs[0].device_kind}"
          f"  (process {pid}/{pcnt})")
    for n in sorted({1, max(1, len(devs) // 2), len(devs)}):
        B = PER_DEV * n
        qs, ts = [], []
        for _ in range(B):
            t = rng.integers(0, 4, L).astype(np.uint8)
            q = t.copy()
            idx = rng.random(L) < 0.1
            q[idx] = (q[idx] + rng.integers(1, 4, int(idx.sum()))) & 3
            qs.append(q)
            ts.append(t)
        mtx = O.set_score_matrix(2, -6)
        qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, BW)
        us0, es0, qs0, ub0, _ = P._init_state(0, BW, 1, 2, -6, -3, -2, 0, 0,
                                              B)
        msh = M.make_mesh(devs[:n])
        fwd = M.make_sharded_forward(T, BW // 16, 0, 1, -3, -2, 0, 0, 2, -6,
                                     msh)
        args = (qpad, qlens, tpad, tlens, P._mtx5(mtx), rby, us0, es0, qs0,
                ub0)
        res = fwd(*args)
        np.asarray(res.score)
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            res = fwd(*args)
        np.asarray(res.score)
        dt = (time.time() - t0) / reps
        cells = float(np.sum(tlens)) * BW
        print(f"n={n:3d} devices  B={B:5d}: {cells/dt/1e9:8.2f} Gcells/s "
              f"({dt*1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
