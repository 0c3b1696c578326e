"""Batched pairwise alignment driver: device forward DP + host traceback.

The device computes every DP row (scores, difference planes, band anchors)
for a batch of pairs; the host decodes CIGARs from the stored planes with the
reference's exact backcal tie-break rules (bsalign.h:3704-3852). CIGAR decode
is O(alignment length) and irregular — a poor fit for the TPU — while the
O(tlen * bandwidth) cell updates stay on device.
"""
from __future__ import annotations

import time
from typing import List, Sequence, Tuple

import numpy as np

from ..cigar import AlnResult
from ..constants import (MODE_GLOBAL, MODE_OVERLAP, SCORE_EPI8_MIN,
                         WORDSIZE, mode_type, roundup)
from ..oracle import banded8 as O

WS = WORDSIZE


def _pack_batch(qseqs: Sequence[np.ndarray], tseqs: Sequence[np.ndarray],
                bandwidth: int):
    B = len(qseqs)
    qlens = np.array([len(q) for q in qseqs], np.int32)
    tlens = np.array([len(t) for t in tseqs], np.int32)
    C = 1
    while C < bandwidth + bandwidth // WS:
        C *= 2
    QP = roundup(int(qlens.max()) + bandwidth + WS + 1, C)
    # bucket the row count so nearby batch shapes share compiled kernels
    T = roundup(int(tlens.max()), 128)
    qpad = np.full((B, QP), 4, np.int32)
    tpad = np.zeros((B, T), np.int32)
    for i, (q, t) in enumerate(zip(qseqs, tseqs)):
        qpad[i, : len(q)] = q
        tpad[i, : len(t)] = t
    # host-precomputed double-rounded diagonal targets (bsalign.h:4009)
    i_idx = np.arange(T, dtype=np.float64)[:, None]
    rby = ((i_idx / tlens[None, :].astype(np.float64))
           * qlens[None, :].astype(np.float64)).astype(np.int32)
    return qpad, qlens, tpad, tlens, rby, T


def _mtx5(mtx: np.ndarray) -> np.ndarray:
    m5 = np.full((5, 4), SCORE_EPI8_MIN, np.int32)
    m5[:4, :] = mtx.reshape(4, 4)
    return m5


def _init_state(mode, bandwidth, piecewise, smax, smin, gapo1, gape1, gapo2,
                gape2, B):
    st = O.row_init(mode, bandwidth, smax, smin, gapo1, gape1, gapo2, gape2)
    W = bandwidth // WS
    us = np.broadcast_to(st.us.astype(np.int32)[:, :, None], (W, WS, B)).copy()
    ub = np.broadcast_to(st.ubegs.astype(np.int32)[:, None], (WS + 1, B)).copy()
    es = qs = None
    if piecewise:
        es = np.broadcast_to(st.es.astype(np.int32)[:, :, None], (W, WS, B)).copy()
    if piecewise == 2:
        qs = np.broadcast_to(st.qs.astype(np.int32)[:, :, None], (W, WS, B)).copy()
    return us, es, qs, ub, st


DEVICE_CHUNK = 256  # pairs per forward call: peak VPU throughput, fits VMEM
T_CHUNK = 4096      # rows per device call for long targets (bounds the HBM
                    # held by traceback planes: T_CHUNK*BW*B bytes per plane)
REALIGN_T = 16384   # beyond this many rows, score first and re-forward row
                    # chunks on demand for the traceback (two-pass mode;
                    # override with BSA_REALIGN_T, 0 disables)


def _forward_chunked(eng, T, W, mode, piecewise, gapo1, gape1, gapo2, gape2,
                     smax, smin, qpad, qlens, tpad, tlens, mtx5, rby,
                     us0, es0, qs0, ub0, Tc, codes=False):
    """Run the Pallas forward in row chunks with device-state carry.

    Long-read memory story (SURVEY.md §7 hard part 7): the stored
    difference planes are O(T*BW*B) int8 — chunking keeps only Tc rows
    in flight per call while the DP state (planes, anchors, band
    registers) resumes exactly, so 50-100 kb targets run at full batch
    without holding multi-GB plane buffers on device."""
    fwd = eng.make_forward(Tc, W, mode, piecewise, gapo1, gape1, gapo2,
                           gape2, smax, smin, codes=codes)
    us, es, qs, ub = us0, es0, qs0, ub0
    reg = None
    res = None
    parts = []
    for c0 in range(0, T, Tc):
        c1 = min(c0 + Tc, T)
        res = fwd(qpad, qlens, tpad[:, c0:c1], tlens, mtx5, rby[c0:c1],
                  us, es, qs, ub, init_reg=reg, row0=c0)
        parts.append(res.planes)
        fp = res.final_planes
        us = fp[0]
        es = fp[1] if piecewise >= 1 else None
        qs = fp[2] if piecewise == 2 else None
        ub_full = np.zeros((WS + 1, us.shape[2]), np.int32)
        ub_full[:] = res.final_ubegs
        ub = ub_full
        reg = res.final_reg
    from ..ops.banded8_jax import RowPlanes

    def _cat(field, want):
        if not want:
            return None
        return np.concatenate([getattr(p, field) for p in parts], axis=0)[:T]

    planes = RowPlanes(
        _cat("us", not codes), _cat("es", not codes and piecewise >= 1),
        _cat("qs", not codes and piecewise == 2), _cat("ubegs", not codes),
        _cat("begs", True), _cat("codes", codes))
    return res._replace(planes=planes)


def _engine():
    """Forward-pass engine: the Pallas Mosaic kernel on TPU (≈18× the XLA
    scan engine), the XLA engine elsewhere. BSA_FORWARD_ENGINE=jax|pallas
    overrides."""
    import os

    import jax

    from ..ops import banded8_jax, banded8_pallas
    sel = os.environ.get("BSA_FORWARD_ENGINE")
    if sel == "jax":
        return banded8_jax
    if sel == "pallas":
        return banded8_pallas
    return (banded8_pallas if jax.default_backend() == "tpu"
            else banded8_jax)


def _engine_for_band(W: int, qp: int = 0):
    """Engine for a band of W stripes (band = W*16) over padded queries of
    length qp: the Pallas kernel when it fits VMEM, else the XLA scan
    engine.

    Wide bands and long queries cannot fit the 16 MB scoped VMEM on a
    real chip (probed on v5e — see banded8_pallas.fits_hw_vmem), so such
    configs fall back to the XLA engine instead of failing Mosaic
    compilation: the reference runs any -W (main.c:268-281) and its paper
    benchmarks bands up to 1024 (example/ScriptsForPaper.txt:17-22). An
    explicit BSA_FORWARD_ENGINE=pallas override is respected (and will
    raise BandTooWideError / OOM past the hardware limit)."""
    import os

    import jax

    eng = _engine()
    if (getattr(eng, "__name__", "").endswith("banded8_pallas")
            and os.environ.get("BSA_FORWARD_ENGINE") != "pallas"):
        # W=1 (band 16) makes zero-size [W-1, ...] slices in the kernel's
        # stripe shifts; the scan engine covers that corner too
        hw = jax.default_backend() != "cpu"   # interpret mode: no VMEM cap
        if W < 2 or (hw and not eng.fits_hw_vmem(W, qp)):
            from ..ops import banded8_jax
            return banded8_jax
    return eng


def align_batch(qseqs: Sequence[np.ndarray], tseqs: Sequence[np.ndarray],
                mode: int, bandwidth: int, mtx: np.ndarray, gapo1: int,
                gape1: int, gapo2: int, gape2: int,
                ) -> List[Tuple[AlnResult, List[int]]]:
    """Align a batch of (query, target) pairs; same bandwidth for all.

    bandwidth == 0 means full band per pair (only valid when all queries pad
    to one bucket; the CLI buckets by rounded qlen first). Batches larger
    than DEVICE_CHUNK are processed in chunks to stay in VMEM.
    """
    if len(qseqs) > DEVICE_CHUNK:
        # Depth-2 pipeline: the device forward for chunk k+1 is dispatched
        # (async) before chunk k's host-side fetch + traceback, so the TPU
        # computes while the host walks CIGARs — the compute/transfer
        # overlap the serial per-chunk loop lacked.
        out: List[Tuple[AlnResult, List[int]]] = []
        pending = None
        for c in range(0, len(qseqs), DEVICE_CHUNK):
            nxt = _launch_batch(qseqs[c:c + DEVICE_CHUNK],
                                tseqs[c:c + DEVICE_CHUNK], mode, bandwidth,
                                mtx, gapo1, gape1, gapo2, gape2)
            if pending is not None:
                out.extend(pending())
            pending = nxt
        out.extend(pending())
        return out
    return _launch_batch(qseqs, tseqs, mode, bandwidth, mtx, gapo1, gape1,
                         gapo2, gape2)()


def _launch_batch(qseqs, tseqs, mode, bandwidth, mtx, gapo1, gape1, gapo2,
                  gape2):
    """Dispatch the device forward for one batch and return a zero-arg
    finisher that fetches results and runs the host traceback."""
    B = len(qseqs)
    if bandwidth == 0:
        bandwidth = max(len(q) for q in qseqs)
    bandwidth = roundup(bandwidth, WS)
    W = bandwidth // WS
    piecewise = O.get_piecewise(gapo1, gape1, gapo2, gape2, bandwidth)
    smax = int(mtx.max())
    smin = int(mtx.min())
    qpad, qlens, tpad, tlens, rby, T = _pack_batch(qseqs, tseqs, bandwidth)
    us0, es0, qs0, ub0, _ = _init_state(mode, bandwidth, piecewise, smax,
                                        smin, gapo1, gape1, gapo2, gape2, B)
    eng = _engine_for_band(W, qpad.shape[1])
    import os
    # Packed 4-bit traceback codes (align/btcodes.py): the kernel emits 0.5
    # bytes/cell instead of ~2.5 (u/e planes + anchors) — a ~5x cut in
    # device->host traffic, decoded by the native walker in O(path).
    use_codes = (piecewise < 2
                 and getattr(eng, "__name__", "").endswith("banded8_pallas")
                 and os.environ.get("BSA_BT_CODES", "1") != "0")
    from ..utils import metrics
    chunked = (T > T_CHUNK
               and getattr(eng, "__name__", "").endswith("banded8_pallas"))
    fwd_cells = float(np.sum(tlens)) * bandwidth
    t_launch = time.time()
    fwd_args = (qpad, qlens, tpad, tlens, _mtx5(mtx), rby, us0, es0, qs0,
                ub0)
    if chunked:
        rt = int(os.environ.get("BSA_REALIGN_T", str(REALIGN_T)))
        if use_codes and rt and T > rt:
            from ..native import rowops as NR
            if NR.available():
                # two-pass long-read mode: scores-only forward now, codes
                # re-forwarded chunk by chunk inside the finisher
                return lambda: _twopass_batch(
                    eng, T, W, mode, bandwidth, piecewise, mtx, gapo1,
                    gape1, gapo2, gape2, smax, smin, qseqs, tseqs,
                    fwd_args, T_CHUNK, fwd_cells, t_launch)
        res0 = _forward_chunked(eng, T, W, mode, piecewise, gapo1, gape1,
                                gapo2, gape2, smax, smin, *fwd_args,
                                Tc=T_CHUNK, codes=use_codes)
        get_res = lambda: res0                               # noqa: E731
    else:
        fwd = eng.make_forward(T, W, mode, piecewise, gapo1, gape1,
                               gapo2, gape2, smax, smin, codes=use_codes)
        if hasattr(fwd, "prepare"):
            # async dispatch: the device starts now; the host fetch (and
            # the blocking wait) happens in the finisher
            call, ops, meta = fwd.prepare(*fwd_args)
            outs = call(*ops)
            get_res = lambda: fwd.unpack(outs, *meta)        # noqa: E731
        else:
            res0 = fwd(*fwd_args)
            get_res = lambda: res0                           # noqa: E731
    return lambda: _finish_batch(
        get_res, qseqs, tseqs, mode, bandwidth, W, piecewise, mtx, gapo1,
        gape1, gapo2, gape2, smax, smin, tlens, use_codes, fwd_cells,
        t_launch)


def _finish_batch(get_res, qseqs, tseqs, mode, bandwidth, W, piecewise, mtx,
                  gapo1, gape1, gapo2, gape2, smax, smin, tlens, use_codes,
                  fwd_cells, t_launch):
    from ..utils import metrics
    B = len(qseqs)
    res = get_res()
    planes = res.planes
    metrics.add("banded8_fwd", fwd_cells, time.time() - t_launch)
    t_f0 = time.time()
    if use_codes:
        codes_w = np.ascontiguousarray(planes.codes)
        us_p = es_p = qs_p = ub_p = None
        fetch_bytes = codes_w.nbytes
    else:
        us_p = np.asarray(planes.us)
        es_p = None if planes.es is None else np.asarray(planes.es)
        qs_p = None if planes.qs is None else np.asarray(planes.qs)
        ub_p = np.asarray(planes.ubegs)
        fetch_bytes = (us_p.nbytes + ub_p.nbytes
                       + (0 if es_p is None else es_p.nbytes)
                       + (0 if qs_p is None else qs_p.nbytes))
    begs_p = np.asarray(planes.begs)
    # device->host traffic accounting ("cells" = bytes): rate ~= link
    # bandwidth when arrays were not already fetched by a chunked driver
    metrics.add("e2e_fetch", fetch_bytes + begs_p.nbytes,
                time.time() - t_f0)

    out = []
    init_row = O.row_init(mode, bandwidth, smax, smin, gapo1, gape1, gapo2,
                          gape2)
    from ..align import btcodes as BC
    from ..native import rowops as NR
    use_native = NR.available()
    begs_p = np.ascontiguousarray(begs_p, np.int32)
    if use_native and not use_codes:
        us_p = np.ascontiguousarray(us_p)
        es_p = None if es_p is None else np.ascontiguousarray(es_p)
        qs_p = None if qs_p is None else np.ascontiguousarray(qs_p)
        ub_p = np.ascontiguousarray(ub_p, np.int32)
        mtx8 = np.ascontiguousarray(mtx, np.int8)
    if use_codes:
        if piecewise and init_row.es is not None:
            init_eo = (init_row.es.T.reshape(-1)
                       == gapo1 + gape1).astype(np.uint8)
        else:
            init_eo = np.ones(bandwidth, np.uint8)
    is_overlap = mode_type(mode) == MODE_OVERLAP
    rss = _base_results(res, mode, W, tlens)
    t_tb0 = time.time()
    for b in range(B):
        tl = int(tlens[b])
        rs = rss[b]
        if use_codes:
            if use_native:
                cigars = NR.decode_codes(qseqs[b], tseqs[b], codes_w, begs_p,
                                         init_eo, b, is_overlap, bandwidth,
                                         rs)
            else:
                nat = BC.unpack_codes(codes_w[:tl, :, :, b], W)
                begs = [int(x) for x in begs_p[:tl, b]]
                cigars = BC.decode_codes(qseqs[b], tseqs[b], nat, begs,
                                         init_eo, mode, bandwidth, rs)
        elif use_native:
            cigars = NR.backcal(qseqs[b], tseqs[b], init_row, us_p, es_p,
                                qs_p, ub_p, begs_p, b, is_overlap, bandwidth,
                                mtx8, gapo1, gape1, gapo2, gape2, piecewise,
                                rs)
        else:
            rows = []
            for i in range(tl):
                st = O.RowState.__new__(O.RowState)
                st.us = us_p[i, :, b].reshape(W, WS)
                st.es = None if es_p is None else es_p[i, :, b].reshape(W, WS)
                st.qs = None if qs_p is None else qs_p[i, :, b].reshape(W, WS)
                st.ubegs = ub_p[i, :, b].astype(np.int64)
                rows.append(st)
            begs = [int(x) for x in begs_p[:tl, b]]
            cigars = O.backcal(qseqs[b], tseqs[b], init_row, rows, begs,
                               mode, bandwidth, mtx, gapo1, gape1, gapo2,
                               gape2, rs)
        out.append((rs, cigars))
    metrics.add("e2e_traceback", B, time.time() - t_tb0)
    return out


def _base_results(res, mode, W, tlens):
    """Per-pair AlnResult seeded from the forward's score/end positions,
    including the non-global final-row row_max candidate
    (bsalign.h:4039-4044)."""
    score = np.asarray(res.score)
    qe = np.asarray(res.qe)
    te = np.asarray(res.te)
    fin_us = np.asarray(res.final_us)
    fin_ub = np.asarray(res.final_ubegs)
    fin_rbeg = np.asarray(res.final_rbeg)
    rss = []
    for b in range(len(score)):
        rs = AlnResult(score=int(score[b]), qe=int(qe[b]), te=int(te[b]))
        if mode_type(mode) != MODE_GLOBAL:
            stf = O.RowState.__new__(O.RowState)
            stf.us = fin_us[:, :, b].astype(np.int8)
            stf.es = stf.qs = None
            stf.ubegs = fin_ub[:, b].astype(np.int64)
            rmax, max_score = O.row_max(stf, W)
            if max_score > rs.score:
                rs.score = max_score
                rs.qe = int(fin_rbeg[b]) + rmax
                rs.te = int(tlens[b]) - 1
        rss.append(rs)
    return rss


def _twopass_batch(eng, T, W, mode, bandwidth, piecewise, mtx, gapo1, gape1,
                   gapo2, gape2, smax, smin, qseqs, tseqs, fwd_args, Tc,
                   fwd_cells, t_launch):
    """Two-pass long-read alignment (VERDICT r2 #9): a scores-only chunked
    forward checkpoints each chunk's entry state (planes + band registers,
    O(BW*B) per chunk), then chunks are re-forwarded in REVERSE order
    emitting packed traceback codes, which the native resumable walker
    consumes incrementally. Peak memory is O(Tc*B) codes + O(T/Tc) small
    checkpoints instead of O(T*B) codes/planes, so 100 kb targets run at
    full batch. The chunk k-1 re-forward is dispatched before walking
    chunk k's codes, overlapping device DP with the host traceback."""
    from ..native import rowops as NR
    from ..utils import metrics
    (qpad, qlens, tpad, tlens, mtx5, rby, us0, es0, qs0, ub0) = fwd_args
    B = len(qseqs)

    # ---- pass 1: scores-only forward, checkpointing chunk-entry state ----
    fwd_s = eng.make_forward(Tc, W, mode, piecewise, gapo1, gape1, gapo2,
                             gape2, smax, smin, scores_only=True)
    ck = []
    us, es, qs, ub, reg = us0, es0, qs0, ub0, None
    res = None
    for c0 in range(0, T, Tc):
        c1 = min(c0 + Tc, T)
        ck.append((us, es, qs, ub, reg))
        res = fwd_s(qpad, qlens, tpad[:, c0:c1], tlens, mtx5, rby[c0:c1],
                    us, es, qs, ub, init_reg=reg, row0=c0)
        fp = res.final_planes
        us = fp[0]
        es = fp[1] if piecewise >= 1 else None
        qs = fp[2] if piecewise == 2 else None
        ub_full = np.zeros((WS + 1, us.shape[2]), np.int32)
        ub_full[:] = res.final_ubegs
        ub = ub_full
        reg = res.final_reg
    metrics.add("banded8_fwd", fwd_cells, time.time() - t_launch)

    rss = _base_results(res, mode, W, tlens)
    init_row = O.row_init(mode, bandwidth, smax, smin, gapo1, gape1, gapo2,
                          gape2)
    if piecewise and init_row.es is not None:
        init_eo = np.ascontiguousarray(
            (init_row.es.T.reshape(-1) == gapo1 + gape1), np.uint8)
    else:
        init_eo = np.ones(bandwidth, np.uint8)
    is_overlap = mode_type(mode) == MODE_OVERLAP

    qflat = np.ascontiguousarray(np.concatenate(
        [np.asarray(q, np.uint8) for q in qseqs]))
    tflat = np.ascontiguousarray(np.concatenate(
        [np.asarray(t, np.uint8) for t in tseqs]))
    qoffs = np.zeros(B + 1, np.int64)
    qoffs[1:] = np.cumsum([len(q) for q in qseqs])
    toffs = np.zeros(B + 1, np.int64)
    toffs[1:] = np.cumsum([len(t) for t in tseqs])
    st = NR.walk_init([rs.qe for rs in rss], [rs.te for rs in rss])
    cg_buf = np.zeros((B, 2 * Tc + 64), np.uint32)
    parts = [[] for _ in range(B)]

    def _walk_chunk(pend):
        get, c0, c1, regk = pend
        with metrics.timed("banded8_refwd", float(B) * (c1 - c0) * bandwidth):
            r = get()
            codes_c = np.ascontiguousarray(r.planes.codes)
            begs_c = np.ascontiguousarray(r.planes.begs, np.int32)
        if regk is not None:
            beg_prev = np.ascontiguousarray(np.asarray(regk)[0], np.int32)
        else:
            beg_prev = np.zeros(B, np.int32)
        NR.walk_codes_chunk(qflat, qoffs, tflat, toffs, codes_c, begs_c,
                            beg_prev, init_eo, c0, c1, is_overlap,
                            bandwidth, st, cg_buf)
        for b in range(B):
            n = int(st[b, NR.WK_NCG])
            if n:
                parts[b].append(cg_buf[b, :n].copy())

    # ---- pass 2: reverse chunk re-forward (codes) + incremental walk ----
    fwd_c = eng.make_forward(Tc, W, mode, piecewise, gapo1, gape1, gapo2,
                             gape2, smax, smin, codes=True)
    pend = None
    for k in range(-(-T // Tc) - 1, -1, -1):
        c0 = k * Tc
        c1 = min(c0 + Tc, T)
        usk, esk, qsk, ubk, regk = ck[k]
        if hasattr(fwd_c, "prepare"):
            call, ops, meta = fwd_c.prepare(
                qpad, qlens, tpad[:, c0:c1], tlens, mtx5, rby[c0:c1], usk,
                esk, qsk, ubk, regk, c0)
            outs = call(*ops)
            get = (lambda outs=outs, meta=meta: fwd_c.unpack(outs, *meta))
        else:
            r0 = fwd_c(qpad, qlens, tpad[:, c0:c1], tlens, mtx5, rby[c0:c1],
                       usk, esk, qsk, ubk, init_reg=regk, row0=c0)
            get = (lambda r0=r0: r0)
        if pend is not None:
            _walk_chunk(pend)
        pend = (get, c0, c1, regk)
    _walk_chunk(pend)

    out = []
    for b in range(B):
        s = st[b]
        if int(s[NR.WK_DONE]) != 1:
            raise RuntimeError("chunked codes walk did not complete")
        rs = rss[b]
        rs.qb = int(s[NR.WK_QB]) + 1
        rs.tb = int(s[NR.WK_TB]) + 1
        rs.qe += 1
        rs.te += 1
        rs.mat = int(s[NR.WK_MAT])
        rs.mis = int(s[NR.WK_MIS])
        rs.ins = int(s[NR.WK_INS])
        rs.dele = int(s[NR.WK_DEL])
        rs.aln = int(s[NR.WK_ALN])
        words = (np.concatenate(parts[b]) if parts[b]
                 else np.zeros(0, np.uint32))
        out.append((rs, [int(x) for x in words[::-1]]))
    return out
