#!/usr/bin/env python
"""Compile-only VMEM probe for the banded-8 Pallas kernel.

Builds make_forward for a (W stripes, qlen, Rs, defer) combo and AOT
compiles it against ShapeDtypeStructs (no data transfer, no execution).
Mosaic's scoped-VMEM check fails at compile time, so "does this config
fit the 16 MB VMEM on a real chip" is answerable without moving a byte
over the (sometimes very slow) dev tunnel.

Usage: python tools/vmem_probe.py --specs "W=32,L=2000,Rs=8,defer=1;..."
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--specs", required=True)
    ap.add_argument("--BL", type=int, default=128)
    ap.add_argument("--B", type=int, default=0,
                    help="batch size (default: one BL block)")
    args = ap.parse_args()

    import jax
    from bsalign_tpu.align import pairwise as P
    from bsalign_tpu.oracle import banded8 as O
    from bsalign_tpu.ops import banded8_pallas as K

    print("backend:", jax.default_backend(), flush=True)
    mtx = O.set_score_matrix(2, -6)
    rng = np.random.default_rng(0)
    for spec in args.specs.split(";"):
        kv = dict(p.split("=") for p in spec.split(","))
        W = int(kv["W"]); L = int(kv["L"])
        Rs = int(kv["Rs"]) if "Rs" in kv else None
        defer = bool(int(kv["defer"])) if "defer" in kv else None
        BW = W * 16
        B = args.B or args.BL
        qs = [rng.integers(0, 4, L).astype(np.uint8) for _ in range(B)]
        ts = [rng.integers(0, 4, L).astype(np.uint8) for _ in range(B)]
        try:
            qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, BW)
            us0, es0, qs0, ub0, _ = P._init_state(
                0, BW, 1, 2, -6, -3, -2, 0, 0, B)
            fwd = K.make_forward(T, W, 0, 1, -3, -2, 0, 0, 2, -6,
                                 BL=args.BL, Rs=Rs, defer=defer,
                                 interpret=False)
            call, ops, meta = fwd.prepare(
                qpad, qlens, tpad, tlens, P._mtx5(mtx), rby,
                us0, es0, qs0, ub0)
            shapes = [jax.ShapeDtypeStruct(np.asarray(a).shape,
                                           np.asarray(a).dtype)
                      for a in ops]
            t0 = time.time()
            call.lower(*shapes).compile()
            print(f"{spec}: FITS (compile {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:4000]
            print(f"{spec}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
