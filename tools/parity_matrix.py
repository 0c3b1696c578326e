#!/usr/bin/env python
"""On-hardware engine parity matrix: `bsalign-tpu align` (device engine path,
NOT the oracle) vs the reference binary over the paper's band widths
(example/ScriptsForPaper.txt:17-22: bands {none,128,256,512,1024}).

Unlike tools/check_align_parity.py (oracle-vs-binary), this drives the CLI
in-process so the batch is aligned by whatever engine the backend selects
(the Pallas kernel on TPU, with the wide-band auto-tuning and the XLA-scan
fallback for bands past the VMEM limit).

Usage: python tools/parity_matrix.py [-n 8] [-l 2000] [--bands 0,128,...]
"""
from __future__ import annotations

import argparse
import io
import os
import subprocess
import sys
import tempfile
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF_BIN = os.environ.get("BSA_REF_BIN", "/root/build/reference/bsalign")
BASES = "ACGT"


def gen(path, n, L, err, seed):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n):
            t = rng.integers(0, 4, L)
            q = []
            j = 0
            while j < L:
                r = rng.random()
                if r < err * 0.23:
                    q.append((int(t[j]) + int(rng.integers(1, 4))) & 3)
                    j += 1
                elif r < err * 0.54:
                    q.append(int(rng.integers(0, 4)))
                elif r < err:
                    j += 1
                else:
                    q.append(int(t[j]))
                    j += 1
            f.write(f">q{i}\n" + "".join(BASES[b] for b in q) + "\n")
            f.write(f">t{i}\n" + "".join(BASES[b] for b in t) + "\n")


def ours_align(args_list):
    from bsalign_tpu import cli as C
    buf = io.StringIO()
    with redirect_stdout(buf):
        C.main_align(args_list)
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=8)
    ap.add_argument("-l", type=int, default=2000)
    ap.add_argument("-e", type=float, default=0.10)
    ap.add_argument("--bands", default="0,128,256,512,1024")
    ap.add_argument("--modes", default="global,overlap")
    args = ap.parse_args()

    if not os.path.exists(REF_BIN):
        print(f"ERROR: reference binary not found at {REF_BIN} "
              "(set BSA_REF_BIN)", file=sys.stderr)
        return 2
    fd, fa = tempfile.mkstemp(suffix=".fa")
    os.close(fd)
    ok = True
    try:
        gen(fa, args.n, args.l, args.e, 42)
        for mode in args.modes.split(","):
            for w in (int(x) for x in args.bands.split(",")):
                cfg = ["-m", mode, "-W", str(w), "-M", "2", "-X", "2",
                       "-O", "4", "-E", "2", "-Q", "0", "-P", "0"]
                ref = subprocess.run([REF_BIN, "align", *cfg, fa],
                                     capture_output=True, text=True,
                                     check=True).stdout
                t0 = time.time()
                mine = ours_align(cfg + [fa])
                dt = time.time() - t0
                if mine == ref:
                    print(f"OK   align -m {mode} -W {w}  ({dt:.1f}s)")
                else:
                    ok = False
                    a, b = ref.splitlines(), mine.splitlines()
                    for i, (x, y) in enumerate(zip(a, b)):
                        if x != y:
                            print(f"FAIL align -m {mode} -W {w} @ line {i}\n"
                                  f"  ref : {x[:160]}\n  mine: {y[:160]}")
                            break
                    else:
                        print(f"FAIL align -m {mode} -W {w}: "
                              f"lines ref={len(a)} mine={len(b)}")
    finally:
        os.unlink(fa)
    print("PARITY MATRIX:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
