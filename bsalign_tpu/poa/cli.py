"""`bsalign-tpu poa` — mirrors main_poa (main.c:387-557)."""
from __future__ import annotations

import argparse
import re
import sys

from .. import seqs as S
from ..constants import MODE_NAMES
from .core import BSPOA, BSPOAPar


def default_poa_par() -> BSPOAPar:
    par = BSPOAPar()
    par.ksz = 13
    par.alnmode = MODE_NAMES["overlap"]
    par.M, par.X, par.O, par.E, par.Q, par.P, par.T = 2, -6, -3, -2, 0, 0, 20
    return par


def run_poa(argv):
    ap = argparse.ArgumentParser(prog="bsalign-tpu poa")
    ap.add_argument("-o", dest="cnsfn", default=None)
    # NOTE: usage text says [global] but main.c:400 leaves OVERLAP unless -m
    ap.add_argument("-m", default=None)
    ap.add_argument("-W", type=int, default=None)
    ap.add_argument("-M", default=None)
    ap.add_argument("-X", default=None)
    ap.add_argument("-O", default=None)
    ap.add_argument("-E", default=None)
    ap.add_argument("-Q", default=None)
    ap.add_argument("-P", default=None)
    ap.add_argument("-G", action="append", default=None)
    ap.add_argument("-T", action="append", default=None)
    ap.add_argument("-L", action="store_true")
    ap.add_argument("-C", action="store_true")
    ap.add_argument("-R", type=int, default=1)
    ap.add_argument("-v", action="count", default=0)
    ap.add_argument("inputs", nargs="+")
    args = ap.parse_args(argv)
    par = default_poa_par()
    if args.m:
        par.alnmode = MODE_NAMES[args.m.lower()]
    if args.W is not None:
        par.bandwidth = args.W
    for attr, val, neg in (("M", args.M, 1), ("X", args.X, -1),
                           ("O", args.O, -1), ("E", args.E, -1),
                           ("Q", args.Q, -1), ("P", args.P, -1)):
        if val is not None:
            setattr(par, attr, neg * int(val.split(",")[0]))
    msabeg, msaend, msacnt = 0, -1, 3
    if args.T:
        # debug triggers (main.c:477-497): msabeg/msaend/msacnt -> DOT dump
        for m in re.finditer(r"([a-zA-Z_]+)=([.0-9]+)", ",".join(args.T)):
            tag, val = m.group(1).lower(), int(float(m.group(2)))
            if tag == "msabeg":
                msabeg = val
            elif tag == "msaend":
                msaend = val
            elif tag == "msacnt":
                msacnt = val
    if args.G:
        for m in re.finditer(r"([a-zA-Z_]+)=([.0-9]+)", ",".join(args.G)):
            tag, val = m.group(1).lower(), m.group(2)
            key = {"kmer": "ksz", "trigger": "bwtrigger",
                   "varcnt": "min_varcnt", "snvqlt": "min_snvqlt",
                   "covfrq": "min_covfrq"}.get(tag, tag)
            cur = getattr(par, key)
            setattr(par, key, type(cur)(float(val) if "." in val else val))
    g = BSPOA(par)
    g.beg()
    for path in args.inputs:
        for rec in S.read_fastx(path):
            if rec.seq:
                g.push(rec.seq)
    g.end()
    for _ in range(1, max(1, args.R)):   # -R benchmarking re-runs (main.c:521)
        g.keep_seqs = True
        g.beg()
        g.end()
    if args.cnsfn:
        with open(args.cnsfn, "w") as f:
            f.write(">cns_seq\n" + "".join("ACGTN-"[b] for b in g.cns) + "\n")
    g.tidy_msa()
    g.call_snvs()
    mline = 0 if args.L else 1
    g.print_msa("BSALIGN", sys.stdout, mline * 100, 1 if args.C else 0)
    g.print_snvs("BSALIGN", sys.stdout)
    if msaend >= msabeg:
        from .extras import print_dot
        with open("1.dot", "w") as f:
            print_dot(g, f, msabeg, msaend, msacnt)
    return 0
