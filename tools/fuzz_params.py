#!/usr/bin/env python
"""Randomized parameter+data fuzzing vs the reference binary.

tools/fuzz_parity.py drives a FIXED config matrix over random sequences;
this harness also randomizes the parameters themselves — mode, bandwidth,
scores, gap models (incl. 2-piece), POA -G extras — sampling from the
reference CLI's valid domains, then diffs our CLI stdout against the
compiled reference binary byte-for-byte. Parameter randomization reaches
tie-break- and geometry-sensitive paths the fixed matrix misses (the
remsa scratch-clear divergence only fires when (mlen+editbw/2) % 16 != 0).

Usage: python tools/fuzz_params.py [--iters N] [--seed S] [--sub poa|align|edit]
Failing cases are left under /tmp/fuzzp_fail_* with a repro command line.
"""
import argparse
import contextlib
import io
import os
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_BIN = "/root/build/reference/bsalign"
BASES = "ACGT"


def mutate(rng, ref, err):
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
    if not q:
        q = [int(rng.integers(0, 4))]
    return q


def gen_pairs_fa(path, rng, n, lo, hi, err):
    with open(path, "w") as f:
        for i in range(n):
            L = int(rng.integers(lo, hi))
            t = rng.integers(0, 4, L)
            q = mutate(rng, t, err)
            f.write(f">p{i}a\n" + "".join(BASES[b] for b in q) + "\n")
            f.write(f">p{i}b\n" + "".join(BASES[int(b)] for b in t) + "\n")


def gen_msa_fa(path, rng, n, L, err):
    ref = rng.integers(0, 4, L)
    with open(path, "w") as f:
        for i in range(n):
            q = mutate(rng, ref, err)
            f.write(f">r{i}\n" + "".join(BASES[b] for b in q) + "\n")


def sample_scores(rng, small=False):
    """Positive-penalty CLI score set; 2-piece sampled ~40% of the time
    (needs Q > O and P < E to activate the reference's piecewise test)."""
    M = int(rng.integers(1, 5))
    X = int(rng.integers(max(2, M), 9))
    O = int(rng.integers(0, 5))
    E = int(rng.integers(1, 4))
    args = ["-M", str(M), "-X", str(X), "-O", str(O), "-E", str(E)]
    if rng.random() < 0.4 and E >= 2:
        Q = int(rng.integers(O + 2, O + 12))
        P = int(rng.integers(1, E))
        args += ["-Q", str(Q), "-P", str(P)]
    else:
        args += ["-Q", "0", "-P", "0"]
    return args


def _mode_arg(rng, modes):
    """Sometimes a comma list (the reference keeps the LAST valid one)."""
    m = str(rng.choice(modes))
    if rng.random() < 0.15:
        return str(rng.choice(modes)) + "," + m
    return m


def sample_case(rng, it, force_sub=None):
    sub = force_sub or rng.choice(["poa", "poa", "poa", "edit", "edit",
                                   "align", "cat"])
    fa = f"/tmp/fuzzp_{it}.fa"
    if sub == "align":
        mode = _mode_arg(rng, ["global", "overlap", "extend"])
        W = int(rng.choice([16, 32, 64, 128]))
        args = ["-m", mode, "-W", str(W)] + sample_scores(rng)
        if rng.random() < 0.2:
            args += ["-L", "1"]
        gen_pairs_fa(fa, rng, int(rng.integers(2, 5)), 40, 400,
                     float(rng.uniform(0.05, 0.3)))
    elif sub == "edit":
        mode = _mode_arg(rng, ["global", "overlap", "extend", "kmer"])
        args = ["-m", mode]
        if mode.split(",")[-1] == "kmer":
            args += ["-k", str(int(rng.integers(9, 16)))]
        else:
            args += ["-W", str(int(rng.choice([0, 16, 64, 128, 256])))]
        gen_pairs_fa(fa, rng, int(rng.integers(2, 6)), 40, 500,
                     float(rng.uniform(0.05, 0.3)))
    elif sub == "cat":
        args = ["-W", str(int(rng.choice([256, 512, 1024])))]
        # cat takes signed scores directly (main.c main_cat: plain atoi)
        args += ["-M", str(int(rng.integers(1, 4))),
                 "-X", str(-int(rng.integers(2, 8))),
                 "-O", str(-int(rng.integers(0, 5))),
                 "-E", str(-int(rng.integers(1, 4)))]
        L = int(rng.integers(300, 700))
        ov = int(rng.integers(60, 200))
        ref = rng.integers(0, 4, L)
        n = int(rng.integers(2, 5))
        step = max(1, (L - ov) // n)
        with open(fa, "w") as f:
            for i in range(n):
                b = min(i * step, max(0, L - ov - 1))
                e = min(L, b + step + ov)
                piece = mutate(rng, ref[b:e], 0.03)
                f.write(f">c{i}\n" + "".join(BASES[c] for c in piece)
                        + "\n")
    else:
        args = sample_scores(rng)
        if rng.random() < 0.5:
            args += ["-W", str(int(rng.choice([0, 64, 128])))]
        if rng.random() < 0.4:
            args += ["-m", str(rng.choice(["global", "overlap"]))]
        gextras = []
        if rng.random() < 0.5:
            gextras.append(f"realn={int(rng.integers(0, 4))}")
        if rng.random() < 0.5:
            gextras.append(f"editbw={int(rng.choice([16, 32, 48, 64, -16, -32, -64]))}")
        if rng.random() < 0.3:
            gextras.append(f"nrec={int(rng.integers(0, 7))}")
        if rng.random() < 0.3:
            gextras.append(f"kmer={int(rng.choice([0, 9, 11, 13, 15]))}")
        if rng.random() < 0.2:
            gextras.append(f"shuffle={int(rng.integers(0, 2))}")
        if rng.random() < 0.2:
            gextras.append(f"trigger={int(rng.integers(0, 2))}")
        if rng.random() < 0.15:
            gextras.append("refmode=1")
        for ge in gextras:
            args += ["-G", ge]
        gen_msa_fa(fa, rng, int(rng.integers(2, 13)),
                   int(rng.integers(60, 550)),
                   float(rng.uniform(0.05, 0.25)))
    return sub, args, fa


def run_ours(sub, args, fa):
    from bsalign_tpu import cli as C
    from bsalign_tpu.poa import cat as CC
    from bsalign_tpu.poa import cli as PC
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        if sub == "align":
            C.main_align(args + [fa])
        elif sub == "edit":
            C.main_edit(args + [fa])
        elif sub == "cat":
            CC.run_cat(args + [fa])
        else:
            PC.run_poa(args + [fa])
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sub", default=None,
                    choices=[None, "poa", "align", "edit", "cat"])
    a = ap.parse_args()
    rng = np.random.default_rng(a.seed)
    fails = 0
    t00 = time.time()
    for it in range(a.iters):
        sub, args, fa = sample_case(rng, it, a.sub)
        label = f"[{it}] {sub} {' '.join(args)}"
        r = subprocess.run([REF_BIN, sub] + args + [fa],
                           capture_output=True, text=True)
        if r.returncode != 0:
            # the reference itself rejects or aborts on this config (e.g.
            # editbw<0 outside refmode corrupts its graph and trips the
            # check_unvisited abort) — nothing to be byte-exact against
            print(f"SKIP {label}: reference rejected (rc={r.returncode})")
            os.unlink(fa)
            continue
        try:
            ours = run_ours(sub, args, fa)
        except Exception as exc:  # crash = failure too
            print(f"FAIL {label}: ours raised {type(exc).__name__}: {exc}")
            shutil.copy(fa, f"/tmp/fuzzp_fail_{it}.fa")
            fails += 1
            continue
        if ours != r.stdout:
            ol, rl = ours.splitlines(), r.stdout.splitlines()
            msg = f"length {len(ol)} vs {len(rl)}"
            for k, (x, y) in enumerate(zip(ol, rl)):
                if x != y:
                    msg = f"line {k}: ours={x[:80]!r} ref={y[:80]!r}"
                    break
            print(f"FAIL {label}: {msg}")
            shutil.copy(fa, f"/tmp/fuzzp_fail_{it}.fa")
            with open(f"/tmp/fuzzp_fail_{it}.cmd", "w") as f:
                f.write(f"{sub} {' '.join(args)} /tmp/fuzzp_fail_{it}.fa\n")
            fails += 1
        else:
            print(f"OK   {label}")
            os.unlink(fa)
        sys.stdout.flush()
    dt = time.time() - t00
    print(f"{a.iters - fails}/{a.iters} OK in {dt:.0f}s")
    print("ALL PARITY OK" if fails == 0 else f"{fails} PARITY FAILURES")
    return 0 if fails == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
