"""Batched POA: align many independent read windows.

The reference processes one MSA per process; production consensus workloads
(assembly polishing, read correction) run thousands of independent windows.
This driver fans windows out over worker processes (the graph surgery is
Python/native-CPU work; zlib-style GIL release does not apply), keeping the
per-window engine byte-identical to the single-window path.

On a TPU pod the same function runs per host with the window list sharded by
process index (jax.distributed), mirroring the data-parallel pairwise story
(SURVEY.md §2.6): windows are embarrassingly parallel, no collectives.
"""
from __future__ import annotations

import io
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from .core import BSPOA, BSPOAPar


@dataclass
class WindowResult:
    cns: np.ndarray
    qlt: np.ndarray
    alt: np.ndarray
    snvs: str
    msa: Optional[str] = None


def _run_window(args) -> WindowResult:
    seqs, par, want_msa = args
    g = BSPOA(par)
    g.beg()
    for s in seqs:
        if isinstance(s, str):
            g.push(s)
        else:
            g.push_codes(np.asarray(s, np.uint8))
    g.end()
    g.tidy_msa()
    g.call_snvs()
    snv = io.StringIO()
    g.print_snvs("W", snv)
    msa = None
    if want_msa:
        buf = io.StringIO()
        g.print_msa("W", buf)
        msa = buf.getvalue()
    return WindowResult(g.cns.copy(), g.qlt.copy(), g.alt.copy(),
                        snv.getvalue(), msa)


def run_windows(windows: Sequence[Sequence], par: Optional[BSPOAPar] = None,
                nproc: int = 0, want_msa: bool = False) -> List[WindowResult]:
    """POA every window (a list of reads, str or 0-3 code arrays).

    nproc > 1 forks worker processes; 0/1 runs inline. Results keep window
    order either way.
    """
    par = par or BSPOAPar()
    tasks = [(list(w), par, want_msa) for w in windows]
    if nproc and nproc > 1 and len(tasks) > 1:
        import multiprocessing as mp
        with mp.get_context("fork").Pool(nproc) as pool:
            return pool.map(_run_window, tasks)
    return [_run_window(t) for t in tasks]
