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


# Process-wide cache of the lockstep probe verdict: does the batched device
# remsa beat the per-window host C engine on THIS host/link?  None = not yet
# probed; the first multi-window lockstep run times one real round both ways
# (compile excluded) and caches the winner — the empirical selection the
# round-3 backend-name heuristic got wrong (it shipped a 36x regression when
# the device sat behind a slow tunnel).  BSA_PEDIT_DEVICE=force pins device.
_PEDIT_DEV_WINS: Optional[bool] = None

# timing breakdown of the most recent device-vs-host probe round (seconds
# per window): host C engine vs the device path split into build (host
# packing), kernel (device compute only) and apply (fetch + traceback +
# graph surgery).  Read by bench.py to report whether the device KERNEL
# beats host C per round even when the link makes the total lose.
last_probe: dict = {}


def _dev_round(pend, pedit_forward_batch):
    """Run one realignment round for `pend` [(g, ctx, all_)] with every
    window's profile DPs batched into one device call."""
    jobs, spans = [], []
    for g, ctx, all_ in pend:
        gj, spec = g._remsa_dev_build(ctx, all_)
        spans.append((g, ctx, spec, all_, len(jobs), len(gj)))
        jobs.extend(gj)
    mats = pedit_forward_batch(jobs) if jobs else []
    for g, ctx, spec, all_, off, n in spans:
        g._remsa_dev_apply(ctx, spec, mats[off:off + n], all_)
    return jobs


def run_windows_lockstep(windows: Sequence[Sequence],
                         par: Optional[BSPOAPar] = None,
                         want_msa: bool = False) -> List[WindowResult]:
    """POA many windows with the remsa profile DP batched on the device:
    all windows advance through end_bspoa's realignment rounds in lockstep,
    and each round's per-read forward DPs — across EVERY window — run as a
    single Pallas kernel call (SURVEY.md §7 stage 5: host graph surgery per
    window, device DP batched across windows). Byte-identical per-window
    results to run_windows.

    The first multi-window call probes device-vs-host empirically (one
    round: window 0 on the host C engine, the rest in one device call,
    compile time excluded) and caches the winner for the process; on a
    slow host<->device link the whole thing degrades gracefully to the
    host engine instead of shipping a regression."""
    import os
    import time as _time

    from ..native import rowops as NR
    from ..ops.pedit_pallas import pedit_forward_batch

    global _PEDIT_DEV_WINS
    par = par or BSPOAPar()
    if par.editbw < 0 or not NR.available():
        return run_windows(windows, par, want_msa=want_msa, device=False)
    _env = os.environ.get("BSA_PEDIT_DEVICE")
    if _env == "force":
        _PEDIT_DEV_WINS = True
    elif _env == "0":        # explicit host pin beats the probe
        _PEDIT_DEV_WINS = False
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
        pend = []       # (graph, ctx, all_) windows with work this round
        for g, a in zip(gs, active):
            if not a:
                continue
            g.msa()
            g.cns_call()
            all_ = 1 if (i + 1 == par.realn) else 0
            ctx = g._remsa_prepare(par.editbw // 2, 1)
            if ctx is None:
                continue
            pend.append((g, ctx, all_))
        if not pend:
            continue
        use_dev = _PEDIT_DEV_WINS
        if use_dev is None and len(pend) >= 2:
            # probe round: window 0 host (timed) vs the rest batched on
            # device (timed; a throwaway warm-up call excludes compile)
            g0, ctx0, all0 = pend[0]
            t0 = _time.perf_counter()
            g0._remsa_host_run(ctx0, all0)
            t_host = _time.perf_counter() - t0
            # Time the device side end-to-end: build + forward + apply, the
            # same work _dev_round does per round (a forward-only timing is
            # biased toward device verdicts that lose once the host-side
            # build/apply costs are paid).  Warm-up excludes compile only.
            t0 = _time.perf_counter()
            jobs, spans = [], []
            for g, ctx, all_ in pend[1:]:
                gj, spec = g._remsa_dev_build(ctx, all_)
                spans.append((g, ctx, spec, all_, len(jobs), len(gj)))
                jobs.extend(gj)
            t_build = _time.perf_counter() - t0
            t_fwd = 0.0
            mats = []
            if jobs:
                pedit_forward_batch(jobs)    # compile at these exact shapes
                t0 = _time.perf_counter()
                mats = pedit_forward_batch(jobs)
                t_fwd = _time.perf_counter() - t0
            # Apply runs unconditionally: even a zero-job window must see
            # del_msanodes/nrds bookkeeping or later rounds corrupt.
            t0 = _time.perf_counter()
            for g, ctx, spec, all_, off, n in spans:
                g._remsa_dev_apply(ctx, spec, mats[off:off + n], all_)
            t_apply = _time.perf_counter() - t0
            if jobs:
                from ..ops import pedit_pallas as _PP
                nw = len(pend) - 1
                t_dev = (t_build + t_fwd + t_apply) / nw
                # 10% margin: on a marginal link, prefer the engine whose
                # cost we did not just estimate from a single round.
                _PEDIT_DEV_WINS = t_dev <= t_host * 0.9
                last_probe.clear()
                last_probe.update({
                    "host_s_per_window": t_host,
                    "dev_total_s_per_window": t_dev,
                    "dev_build_s_per_window": t_build / nw,
                    "dev_kernel_s_per_window":
                        _PP.last_timings.get("kernel_s", t_fwd) / nw,
                    "dev_fetch_s_per_window":
                        _PP.last_timings.get("fetch_s", 0.0) / nw,
                    "dev_apply_s_per_window": t_apply / nw,
                    "n_windows_dev": nw,
                    "njobs": len(jobs),
                })
            continue
        if use_dev or (use_dev is None and len(pend) >= 2):
            _dev_round(pend, pedit_forward_batch)
        else:
            for g, ctx, all_ in pend:
                g._remsa_host_run(ctx, all_)
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
