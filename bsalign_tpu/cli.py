"""bsalign-tpu command line: align / edit / poa / cat.

Output format is byte-compatible with the reference bsalign CLI (main.c) so
downstream tooling can switch transparently. Input pairs are read as
consecutive FASTA/Q records (q, t, q, t, ...); batching/bucketing happens
behind the scenes before device dispatch.
"""
from __future__ import annotations

import argparse
import sys
from typing import List

from .utils import metrics

import numpy as np

from . import cigar as C
from . import seqs as S
from .constants import parse_mode_list, MODE_NAMES, roundup
from .oracle import banded8 as B8

USE_DEVICE = True  # flip off to run the scalar oracle engines (debug)


def _fmt_pairwise(qtag, ttag, qseq, tseq, rs, cigars, line=0):
    q, m, t = C.cigar2alnstr(qseq, tseq, rs, cigars, rs.aln)
    head = (f"{qtag}\t{len(qseq)}\t+\t{rs.qb}\t{rs.qe}\t{ttag}\t{len(tseq)}"
            f"\t+\t{rs.tb}\t{rs.te}\t{rs.score}\t{1.0 * rs.mat / rs.aln:.3f}"
            f"\t{rs.mat}\t{rs.mis}\t{rs.ins}\t{rs.dele}")
    if line <= 0:
        return f"{head}\n{q}\n{m}\n{t}\n"
    # -L > 0: wrap alnstr in 100-char chunks with running coordinates
    # (main.c:349-363; the chunk width is hardcoded 100 upstream)
    out = [head]
    qn, tn = rs.qb, rs.tb
    for b in range(0, rs.aln, 100):
        e = min(b + 100, rs.aln)
        qn += sum(1 for ch in q[b:e] if ch != "-")
        tn += sum(1 for ch in t[b:e] if ch != "-")
        out.append(f"{q[b:e]}\tQ[{qn}]")
        out.append(m[b:e])
        out.append(f"{t[b:e]}\tT[{tn}]")
    return "\n".join(out) + "\n"


def _read_pairs(paths: List[str]):
    recs = []
    for p in paths:
        recs.extend(S.read_fastx(p))
    recs = [r for r in recs if len(r.seq)]
    pairs = []
    for i in range(0, len(recs) - 1, 2):
        pairs.append((recs[i], recs[i + 1]))
    return pairs


def main_align(argv):
    ap = argparse.ArgumentParser(prog="bsalign-tpu align")
    ap.add_argument("-m", default="overlap", help="global/extend/overlap")
    ap.add_argument("-W", type=int, default=0, help="bandwidth, 0=full")
    ap.add_argument("-M", type=int, default=2)
    ap.add_argument("-X", type=int, default=6)
    ap.add_argument("-O", type=int, default=3)
    ap.add_argument("-E", type=int, default=2)
    ap.add_argument("-Q", type=int, default=0)
    ap.add_argument("-P", type=int, default=0)
    ap.add_argument("-L", type=int, default=0)
    ap.add_argument("-R", type=int, default=1)
    ap.add_argument("-v", action="count", default=0)
    ap.add_argument("--dist", action="store_true",
                    help="multi-host data parallel (jax.distributed)")
    ap.add_argument("inputs", nargs="+")
    args = ap.parse_args(argv)
    metrics.set_verbose(args.v)
    mname = parse_mode_list(args.m)
    if mname is None:
        sys.stderr.write("bad -m mode list\n")
        return 1
    mode = MODE_NAMES[mname]
    mtx = B8.set_score_matrix(args.M, -args.X)
    gaps = (-args.O, -args.E, -args.Q, -args.P)
    pairs = _read_pairs(args.inputs)
    out = sys.stdout

    from .parallel import dist
    dist_on = args.dist or dist.enabled_by_env()
    n_total = len(pairs)
    if dist_on:
        dist.init()
        pairs = [pairs[i] for i in dist.process_shard(n_total)]

    if USE_DEVICE:
        from .align.pairwise import align_batch
        # bucket by effective bandwidth (full-band pairs share a bucket only
        # when their rounded qlen matches the reference's per-pair band)
        buckets = {}
        for idx, (q, t) in enumerate(pairs):
            bw = args.W if args.W > 0 else roundup(len(q.seq), 128)
            buckets.setdefault(bw, []).append(idx)
        results = [None] * len(pairs)
        for bw, idxs in buckets.items():
            qs = [pairs[i][0].codes for i in idxs]
            ts = [pairs[i][1].codes for i in idxs]
            outs = align_batch(qs, ts, mode, bw, mtx, *gaps)
            for i, r in zip(idxs, outs):
                results[i] = r
    else:
        results = []
        for (q, t) in pairs:
            bw = args.W if args.W > 0 else roundup(len(q.seq), 128)
            results.append(B8.pairwise(q.codes, t.codes, mode, bw, mtx, *gaps))

    texts = [_fmt_pairwise(q.tag, t.tag, q.codes, t.codes, rs, cg, args.L)
             if rs.mat else ""
             for (q, t), (rs, cg) in zip(pairs, results)]
    if dist_on:
        full = dist.distribute_texts(n_total, texts)
        if full is not None:
            out.write("".join(full))
    else:
        out.write("".join(texts))
    return 0


def main_edit(argv):
    ap = argparse.ArgumentParser(prog="bsalign-tpu edit")
    ap.add_argument("-m", default="global", help="global/extend/overlap/kmer")
    ap.add_argument("-W", type=int, default=0)
    ap.add_argument("-k", type=int, default=13)
    ap.add_argument("-R", type=int, default=1)
    ap.add_argument("-v", action="count", default=0)
    ap.add_argument("--dist", action="store_true",
                    help="multi-host data parallel (jax.distributed)")
    ap.add_argument("inputs", nargs="+")
    args = ap.parse_args(argv)
    mode_name = parse_mode_list(args.m, ("global", "overlap", "extend",
                                         "kmer"))
    if mode_name is None:
        sys.stderr.write("bad -m mode list\n")
        return 1
    W = args.W
    if mode_name == "overlap" and W:
        sys.stderr.write(" ** disable band in bsalign-edit's overlap mode ** \n")
        W = 0
    pairs = _read_pairs(args.inputs)
    out = sys.stdout
    from .parallel import dist
    dist_on = args.dist or dist.enabled_by_env()
    n_total = len(pairs)
    if dist_on:
        dist.init()
        pairs = [pairs[i] for i in dist.process_shard(n_total)]
    if USE_DEVICE:
        from .align.editdist import edit_batch, kmer_edit_batch
        qs = [p[0].codes for p in pairs]
        ts = [p[1].codes for p in pairs]
        if mode_name == "kmer":
            results = kmer_edit_batch(args.k, qs, ts)
        else:
            results = edit_batch(qs, ts, MODE_NAMES[mode_name], W)
    else:
        from .oracle import edit as E
        results = []
        for (q, t) in pairs:
            if mode_name == "kmer":
                results.append(E.kmer_edit_pairwise(args.k, q.codes, t.codes))
            else:
                results.append(E.edit_pairwise(q.codes, t.codes,
                                               MODE_NAMES[mode_name], W))
    texts = [_fmt_pairwise(q.tag, t.tag, q.codes, t.codes, rs, cg)
             if rs.mat else ""
             for (q, t), (rs, cg) in zip(pairs, results)]
    if dist_on:
        full = dist.distribute_texts(n_total, texts)
        if full is not None:
            out.write("".join(full))
    else:
        out.write("".join(texts))
    return 0


def main_poa(argv):
    from .poa.cli import run_poa
    return run_poa(argv)


def main_cat(argv):
    from .poa.cat import run_cat
    return run_cat(argv)


def main():
    if len(sys.argv) < 2:
        sys.stderr.write(
            "Usage: bsalign-tpu <align|edit|poa|cat> [options] <fasta>\n")
        return 1
    cmd = sys.argv[1].lower()
    argv = sys.argv[2:]
    # BSA_PROFILE_DIR=<dir> captures a jax profiler trace of the whole run
    with metrics.profile_trace():
        if cmd == "align":
            rc = main_align(argv)
            if metrics.verbose():
                metrics.report()
            return rc
        if cmd == "edit":
            rc = main_edit(argv)
            if metrics.verbose():
                metrics.report()
            return rc
        if cmd == "poa":
            return main_poa(argv)
        if cmd == "cat":
            return main_cat(argv)
    sys.stderr.write(f" -- Unknown command '{cmd}' --\n")
    return 1


if __name__ == "__main__":
    sys.exit(main())
