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
    return _window_result(g, want_msa)


def _window_result(g: BSPOA, want_msa: bool) -> WindowResult:
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


def run_windows_lockstep(windows: Sequence[Sequence],
                         par: Optional[BSPOAPar] = None,
                         want_msa: bool = False) -> List[WindowResult]:
    """POA many windows with the remsa profile DP batched on the device:
    all windows advance through end_bspoa's realignment rounds in lockstep,
    and each round's per-read forward DPs — across EVERY window — run as a
    single Pallas kernel call (SURVEY.md §7 stage 5: host graph surgery per
    window, device DP batched across windows). Byte-identical per-window
    results to run_windows."""
    from ..native import rowops as NR
    from ..ops.pedit_pallas import pedit_forward_batch

    par = par or BSPOAPar()
    if par.editbw < 0 or not NR.available():
        return run_windows(windows, par, want_msa=want_msa, device=False)
    gs = []
    for w in windows:
        g = BSPOA(par)
        g.beg()
        for s in w:
            if isinstance(s, str):
                g.push(s)
            else:
                g.push_codes(np.asarray(s, np.uint8))
        gs.append(g)
    active = [g.end_begin() for g in gs]
    for i in range(par.realn):
        pend = []       # (graph, ctx, spec, all_, job slice) awaiting mats
        jobs = []
        for g, a in zip(gs, active):
            if not a:
                continue
            g.msa()
            g.cns_call()
            all_ = 1 if (i + 1 == par.realn) else 0
            ctx = g._remsa_prepare(par.editbw // 2, 1)
            if ctx is None:
                continue
            gj, spec = g._remsa_dev_build(ctx, all_)
            pend.append((g, ctx, spec, all_, len(jobs), len(gj)))
            jobs.extend(gj)
        mats = pedit_forward_batch(jobs) if jobs else []
        for g, ctx, spec, all_, off, n in pend:
            g._remsa_dev_apply(ctx, spec, mats[off:off + n], all_)
    for g, a in zip(gs, active):
        if a:
            g.end_finish()
    return [_window_result(g, want_msa) for g in gs]


def run_windows(windows: Sequence[Sequence], par: Optional[BSPOAPar] = None,
                nproc: int = 0, want_msa: bool = False,
                device: Optional[bool] = None) -> List[WindowResult]:
    """POA every window (a list of reads, str or 0-3 code arrays).

    device=True (opt-in, default host; BSA_PEDIT_DEVICE=1 flips the
    default when >1 window) batches each realignment round's profile DP
    across all windows into one device call — wins on a fast host<->device
    link, loses through a slow tunnel; nproc > 1 forks worker processes;
    0/1 runs inline. Results keep window order either way.
    """
    from .core import pedit_device_default

    par = par or BSPOAPar()
    if device is None:
        device = len(windows) > 1 and pedit_device_default()
    if device:
        return run_windows_lockstep(windows, par, want_msa=want_msa)
    tasks = [(list(w), par, want_msa) for w in windows]
    if nproc and nproc > 1 and len(tasks) > 1:
        import multiprocessing as mp
        with mp.get_context("fork").Pool(nproc) as pool:
            return pool.map(_run_window, tasks)
    return [_run_window(t) for t in tasks]
