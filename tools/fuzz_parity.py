#!/usr/bin/env python
"""Byte-exact CLI parity fuzz vs the reference bsalign binary.

Sweeps align/edit/poa configs over randomized inputs and diffs full stdout.
Usage: python tools/fuzz_parity.py [--quick] [--seed N]
"""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_BIN = "/root/build/reference/bsalign"
BASES = "ACGT"


def gen_pairs(path, n, lens, err, seed):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n):
            L = int(rng.integers(lens[0], lens[1] + 1))
            t = rng.integers(0, 4, L)
            q = []
            j = 0
            while j < L:
                r = rng.random()
                if r < err * 0.3:
                    q.append((int(t[j]) + rng.integers(1, 4)) & 3)
                    j += 1
                elif r < err * 0.6:
                    q.append(int(rng.integers(0, 4)))
                elif r < err:
                    j += 1
                else:
                    q.append(int(t[j]))
                    j += 1
            f.write(f">q{i}\n" + "".join(BASES[b] for b in q) + "\n")
            f.write(f">t{i}\n" + "".join(BASES[b] for b in t) + "\n")


def gen_contigs(path, n, L, ov, seed):
    """Chain of contigs with ov-bp true overlaps (for `cat`)."""
    rng = np.random.default_rng(seed)
    full = rng.integers(0, 4, L * n - ov * (n - 1))
    with open(path, "w") as f:
        step = L - ov
        for i in range(n):
            seg = full[i * step: i * step + L]
            f.write(f">c{i}\n" + "".join(BASES[b] for b in seg) + "\n")


def gen_msa(path, n, L, err, seed):
    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 4, L)
    with open(path, "w") as f:
        for i in range(n):
            q = []
            for b in ref:
                r = rng.random()
                if r < err * 0.3:
                    q.append(int(rng.integers(0, 4)))
                elif r < err * 0.6:
                    q.append(int(b))
                    q.append(int(rng.integers(0, 4)))
                elif r < err:
                    continue
                else:
                    q.append(int(b))
            f.write(f">r{i}\n" + "".join(BASES[b] for b in q) + "\n")


def run_ref(cmd):
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed:\n{r.stderr[-500:]}")
    return r.stdout


def run_ours(sub, args, fa):
    # in-process so jit/kernel compile caches persist across configs
    import contextlib
    import io as _io
    from bsalign_tpu import cli as C
    from bsalign_tpu.poa import cli as PC
    from bsalign_tpu.poa import cat as CC
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        if sub == "align":
            C.main_align(args + [fa])
        elif sub == "edit":
            C.main_edit(args + [fa])
        elif sub == "poa":
            PC.run_poa(args + [fa])
        else:
            CC.run_cat(args + [fa])
    return buf.getvalue()


def check(name, sub, args, fa):
    ours = run_ours(sub, args, fa)
    refs = run_ref([REF_BIN, sub] + args + [fa])
    if ours != refs:
        ol, rl = ours.splitlines(), refs.splitlines()
        for k, (a, b) in enumerate(zip(ol, rl)):
            if a != b:
                print(f"FAIL {name}: first diff at line {k}:\n  ours: {a[:100]}\n  ref : {b[:100]}")
                return False
        print(f"FAIL {name}: length differs ({len(ol)} vs {len(rl)} lines)")
        return False
    print(f"OK   {name}")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    ok = True
    fa1 = "/tmp/fuzz_pairs.fa"
    gen_pairs(fa1, 4 if a.quick else 8, (200, 700), 0.14, a.seed)
    fa2 = "/tmp/fuzz_short.fa"
    gen_pairs(fa2, 4, (40, 90), 0.25, a.seed + 1)
    fam = "/tmp/fuzz_msa.fa"
    gen_msa(fam, 8, 300, 0.12, a.seed + 2)
    fam2 = "/tmp/fuzz_msa_big.fa"
    gen_msa(fam2, 12, 500, 0.15, a.seed + 43)  # caught the f32 dptable bug

    align_cfgs = [
        ("align glob W128", ["-m", "global", "-W", "128"]),
        ("align glob full paper-scores",
         ["-m", "global", "-W", "0", "-M", "2", "-X", "2", "-O", "4",
          "-E", "2", "-Q", "0", "-P", "0"]),
        ("align overlap W64", ["-m", "overlap", "-W", "64"]),
        ("align extend", ["-m", "extend", "-W", "128"]),
        ("align 2piece", ["-m", "global", "-W", "128", "-O", "3", "-E", "2",
                          "-Q", "8", "-P", "1"]),
    ]
    edit_cfgs = [
        ("edit global full", ["-m", "global", "-W", "0"]),
        ("edit global W64", ["-m", "global", "-W", "64"]),
        ("edit overlap", ["-m", "overlap"]),
        ("edit extend", ["-m", "extend"]),
        ("edit kmer k13", ["-m", "kmer", "-k", "13"]),
    ]
    poa_cfgs = [
        ("poa default", []),
        ("poa refmode W64", ["-W", "64", "-G", "refmode=1"]),
        ("poa global noshuffle", ["-m", "global", "-G", "shuffle=0"]),
        ("poa realn1 editbw32", ["-G", "realn=1", "-G", "editbw=32"]),
        ("poa nrec5 ksz11", ["-G", "nrec=5", "-G", "kmer=11"]),
        ("poa scores2piece", ["-M", "2", "-X", "4", "-O", "2", "-E", "1",
                              "-Q", "6", "-P", "1"]),
    ]
    fac = "/tmp/fuzz_contigs.fa"
    gen_contigs(fac, 4, 400, 120, a.seed + 3)
    for name, args in align_cfgs:
        ok &= check(name, "align", args, fa1)
        if not a.quick:
            ok &= check(name + " (short/hi-err)", "align", args, fa2)
    for name, args in edit_cfgs:
        ok &= check(name, "edit", args, fa1)
        ok &= check(name + " (short)", "edit", args, fa2)
    for name, args in poa_cfgs:
        ok &= check(name, "poa", args, fam)
        if not a.quick:
            ok &= check(name + " (big)", "poa", args, fam2)
    if a.quick:
        ok &= check("poa default (big)", "poa", [], fam2)
    ok &= check("poa colorful", "poa", ["-C"], fam)
    ok &= check("cat W256", "cat", ["-W", "256"], fac)
    print("ALL PARITY OK" if ok else "PARITY FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
