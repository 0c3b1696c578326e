"""Pallas TPU kernel for the batched remsa pedit profile DP.

The reference's remsa_pedits realigns each read against the MSA
column base-count profile with an anti-diagonal unsigned-8-bit max-match
DP (/root/reference/bspoa.h:3856-3896, driver :3916-4046). The DP is
embarrassingly parallel across (window, read) jobs and its access
pattern is uniform: in the forward pass x - y is always 0 or 1, so every
per-step operand window shifts by exactly one lane on alternating steps.

Kernel layout: jobs on the sublane axis (R per call), band positions on
the lane axis. Ten operand windows (read/cns base strings + 4+4 per-base
count planes) live in VMEM scratch and shift one lane per step; the
values entering at the window edge are precomputed on host into small
"feed" arrays ([steps/2, R] per plane) block-mapped per grid chunk, so
the kernel needs no dynamic lane slicing (unsupported unaligned on this
Mosaic build). Outputs are the same matrix0/matrix1 diagonal planes the
native driver writes (uint8 u/v difference rows), byte-exact, consumed
by the existing host traceback (which mutates the POA graph).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
NPL = 10          # seqs0, mats0 x4 (x-planes); seqs1, mats1 x4 (y-planes)
LW = 128          # lane width


@functools.lru_cache(maxsize=16)
def _get_call(bw, HW, R, Rs, NT, interpret):
    """Rs = steps per grid chunk (even); NT = number of chunks.

    The returned callable yields (o0, o1) sliced on-device to the
    bw + 2 lanes the traceback actually reads — the other ~half of the
    LW=128 lane axis never crosses the host link."""
    assert Rs % 2 == 0 and bw + 2 <= LW
    Half = Rs // 2
    RL = bw + 2

    def kernel(init_ref, feed_ref, o0_ref, o1_ref, *scratch):
        wins = scratch[:NPL]
        prev0, prev1 = scratch[NPL:NPL + 2]
        tc = pl.program_id(0)

        @pl.when(tc == 0)
        def _init():
            for p in range(NPL):
                wins[p][:] = init_ref[p].astype(I32)

        lane = jax.lax.broadcasted_iota(I32, (R, LW), 1)
        body_m = (lane >= 1) & (lane < 1 + bw)

        def select4(bases, plane_list):
            out = jnp.zeros((R, LW), I32)
            for b in range(4):
                out = jnp.where(bases == b, plane_list[b], out)
            return out

        for r in range(Rs):
            # out row g = tc*Rs + r; row 0 = init diag, row g = step g-1
            if r == 0:
                @pl.when(tc == 0)
                def _seed():
                    z0 = jnp.where(lane == HW, 255, 0)
                    z1 = jnp.where(lane == HW + 1, 255, 0)
                    o0_ref[0] = z0.astype(jnp.uint8)
                    o1_ref[0] = z1.astype(jnp.uint8)
                    prev0[:] = z0
                    prev1[:] = z1
                # row 0 of chunk tc>0 is step tc*Rs-1 (odd since Rs even)
                dirn = 1
                slot = 0
            else:
                dirn = (r - 1) & 1
                slot = (r - 1) // 2 + 1
            p0 = prev0[:]
            p1 = prev1[:]

            def _step(r=r, dirn=dirn, slot=slot, p0=p0, p1=p1):
                w_xseq = wins[0][:]
                w_xm = [wins[1 + b][:] for b in range(4)]
                w_yseq = wins[5][:]
                w_ym = [wins[6 + b][:] for b in range(4)]
                # xs: read-side counts selected by cns base; ys: cns-side
                # counts selected by read base (bspoa.h:3856-3896)
                xs = select4(w_yseq, w_xm)
                ys = select4(w_xseq, w_ym)
                h = jnp.minimum(xs + ys, 255)
                sh_u = 2 if dirn else 1
                sh_v = 1 if dirn else 0
                zpad = jnp.zeros((R, 2), I32)
                pu = jnp.concatenate([p0[:, sh_u:], zpad[:, :sh_u]], axis=1) \
                    if sh_u else p0
                pv = jnp.concatenate([p1[:, sh_v:], zpad[:, :sh_v]], axis=1) \
                    if sh_v else p1
                h = jnp.maximum(h, pu)
                h = jnp.maximum(h, pv)
                # band value for position i lives at lane i; the c-row
                # stores it at lane 1+i -> shift right one lane
                d0 = h - pv
                d1 = h - pu
                z1 = jnp.zeros((R, 1), I32)
                c0 = jnp.where(body_m,
                               jnp.concatenate([z1, d0[:, :LW - 1]], axis=1),
                               0)
                c1 = jnp.where(body_m,
                               jnp.concatenate([z1, d1[:, :LW - 1]], axis=1),
                               0)
                # boundary cells (bspoa.h driver edge writes); lanes
                # outside [1, 1+bw) are already zero via body_m
                if dirn:
                    c0 = jnp.where(lane == 0, 255, c0)
                else:
                    c1 = jnp.where(lane == 1 + bw, 255, c1)
                o0_ref[r] = c0.astype(jnp.uint8)
                o1_ref[r] = c1.astype(jnp.uint8)
                prev0[:] = c0
                prev1[:] = c1
                # post-step window shift + feed insertion
                if dirn == 0:     # x advanced: x-planes shift left
                    for p in range(5):
                        col = feed_ref[0, p, :, slot:slot + 1].astype(I32)
                        wins[p][:] = jnp.concatenate(
                            [wins[p][:, 1:], col], axis=1)
                else:             # y advanced: y-planes shift right
                    for p in range(5, NPL):
                        col = feed_ref[0, p, :, slot:slot + 1].astype(I32)
                        wins[p][:] = jnp.concatenate(
                            [col, wins[p][:, :-1]], axis=1)

            if r == 0:
                pl.when(tc > 0)(_step)
            else:
                _step()

    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((NPL, R, LW), lambda tc: (0, 0, 0), memory_space=vm),
        pl.BlockSpec((1, NPL, R, Half + 1), lambda tc: (tc, 0, 0, 0),
                     memory_space=vm),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((NT * Rs, R, LW), jnp.uint8),
        jax.ShapeDtypeStruct((NT * Rs, R, LW), jnp.uint8),
    ]
    out_specs = [
        pl.BlockSpec((Rs, R, LW), lambda tc: (tc, 0, 0), memory_space=vm),
        pl.BlockSpec((Rs, R, LW), lambda tc: (tc, 0, 0), memory_space=vm),
    ]
    scratch = [pltpu.VMEM((R, LW), I32) for _ in range(NPL + 2)]
    call = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=bool(interpret),
    )

    @jax.jit
    def run(init, feed):
        o0, o1 = call(init, feed)
        return o0[:, :, :RL], o1[:, :, :RL]

    return run


class PeditJob:
    """One (read, window) realignment job, same operands as
    core._pedit_rd / native bsa_pedit_forward."""

    __slots__ = ("seqs0", "seqs1", "mats0", "mats1", "mlen", "mbeg", "mend",
                 "bw", "HW")

    def __init__(self, seqs0, seqs1, mats0, mats1, mlen, mbeg, mend, bw, HW):
        self.seqs0 = seqs0
        self.seqs1 = seqs1
        self.mats0 = mats0
        self.mats1 = mats1
        self.mlen = mlen
        self.mbeg = mbeg
        self.mend = mend
        self.bw = bw
        self.HW = HW


def pack_jobs(jobs, R, Rs, NT):
    """Pack job operands into the kernel's (init, feed) arrays."""
    bw = jobs[0].bw
    assert all(j.bw == bw and j.HW == jobs[0].HW for j in jobs)
    Half = Rs // 2

    init = np.zeros((NPL, R, LW), np.uint8)
    feed = np.zeros((NT, NPL, R, Half + 1), np.uint8)
    # defaults outside valid range: read-side bases are 4 (the driver's
    # seqs0[:]=4 refill); cns-side seqs1 buffer defaults to 0
    init[0] = 4
    feed[:, 0] = 4

    def xplane(j, p):
        """x-side raw plane p for job j (index base = raw idx x+i)."""
        if p == 0:
            return j.seqs0
        return j.mats0[p - 1]

    def yplane(j, p):
        if p == 5:
            return j.seqs1
        return j.mats1[p - 6]

    nfeed = NT * Half  # global shift slots
    # chunk tcb local slot sl holds global slot k = tcb*Half - 1 + sl
    # (the boundary slot duplicates into the next chunk's slot 0)
    gk = (np.arange(NT)[:, None] * Half - 1
          + np.arange(Half + 1)[None, :])               # [NT, Half+1]
    ok = (gk >= 0) & (gk < nfeed)
    gkc = np.clip(gk, 0, max(nfeed - 1, 0))

    def spread(vals, default):
        """vals [nfeed] -> per-chunk slot matrix [NT, Half+1]."""
        return np.where(ok, vals[gkc], default)

    idx_x = np.arange(nfeed)
    for ji, j in enumerate(jobs):
        pad = len(j.seqs0)
        s0 = j.mlen - 1 - j.mbeg
        ix = j.mbeg + LW + idx_x
        ix_ok = ix < pad
        ixc = np.minimum(ix, pad - 1)
        iy = s0 - 1 - idx_x
        iy_ok = (iy >= 0) & (iy < pad)
        iyc = np.clip(iy, 0, pad - 1)
        for p in range(5):
            pl_ = xplane(j, p)
            # init window: raw [mbeg, mbeg+LW)
            lo = j.mbeg
            hi = min(j.mbeg + LW, pad)
            if hi > lo:
                init[p, ji, :hi - lo] = pl_[lo:hi]
            # feed slot k (global) inserts raw [mbeg + k + LW]
            vals = np.where(ix_ok, pl_[ixc], 4 if p == 0 else 0)
            feed[:, p, ji, :] = spread(vals, 4 if p == 0 else 0)
        for p in range(5, NPL):
            pl_ = yplane(j, p)
            lo = s0
            hi = min(s0 + LW, pad)
            if hi > lo and lo >= 0:
                init[p, ji, :hi - lo] = pl_[lo:hi]
            elif lo < 0:
                lo2 = max(lo, 0)
                if hi > lo2:
                    init[p, ji, lo2 - lo:hi - lo] = pl_[lo2:hi]
            # feed slot k inserts raw [s0 - k - 1]
            vals = np.where(iy_ok, pl_[iyc], 0)
            feed[:, p, ji, :] = spread(vals, 0)
    return jnp.asarray(init), jnp.asarray(feed)


def unpack_jobs(jobs, o0, o1):
    """Scatter kernel output rows into per-job native-layout matrices."""
    bw = jobs[0].bw
    rowlen = bw + 2
    outs = []
    for ji, j in enumerate(jobs):
        ndiag = 2 * j.mlen + 2
        m0 = np.zeros(ndiag * rowlen, np.uint8)
        m1 = np.zeros(ndiag * rowlen, np.uint8)
        nrows = 2 * (j.mend - j.mbeg)   # init + steps .. diag 2*mbeg+nrows-1
        base = 2 * j.mbeg
        rows0 = o0[:nrows, ji, :rowlen]
        rows1 = o1[:nrows, ji, :rowlen]
        m0[base * rowlen:(base + nrows) * rowlen] = rows0.ravel()
        m1[base * rowlen:(base + nrows) * rowlen] = rows1.ravel()
        outs.append((m0, m1))
    return outs


# fixed job-capacity bucket on hardware: every realignment round / window
# count shares ONE compiled Mosaic program (round-3/4 finding: a
# next-pow2(len(jobs)) R recompiled per round as jobs shrank -- 1,680 pjit
# cache misses per window). 256 jobs x 12 scratch planes x 128 lanes x 4 B
# = 1.5 MB VMEM scratch; larger batches run in R-sized chunks.
R_BUCKET = 256


def _nt_bucket(NT):
    """Quantize chunk count to {8, 32, 128, pow2} so at most ~3 programs
    exist across all realistic window lengths (wasted columns are masked)."""
    for b in (8, 32, 128):
        if NT <= b:
            return b
    return 1 << max(NT - 1, 0).bit_length()


# timing breakdown of the most recent pedit_forward_batch call (seconds):
# pack (host packing), kernel (device compute, block_until_ready, no
# fetch), fetch+unpack (device->host transfer + scatter).  Read by the
# POA lockstep probe / bench to separate kernel speed from link cost.
last_timings = {}


def pedit_forward_batch(jobs, Rs=64, interpret=None):
    """Run the pedit forward DP for a batch of jobs on the TPU; returns
    per-job (matrix0, matrix1) uint8 arrays identical to the native
    bsa_pedit_forward layout ([2*mlen+1+1, rowlen] flattened)."""
    import time

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert jobs
    bw = jobs[0].bw
    HW = jobs[0].HW
    if interpret:
        # interpret mode (CPU tests): padding to the hardware bucket would
        # multiply the python-loop runtime for nothing
        R = max(8, 1 << (len(jobs) - 1).bit_length())
    else:
        R = R_BUCKET
    tm = {"pack_s": 0.0, "kernel_s": 0.0, "fetch_s": 0.0,
          "njobs": len(jobs), "ncalls": 0}
    # launch every R-chunk first (jax dispatch is async), then fetch/unpack
    # in order: the device computes chunk k+1 while the host scatters chunk
    # k's matrices
    launched = []
    t0 = time.perf_counter()
    for lo in range(0, len(jobs), R):
        chunk = jobs[lo:lo + R]
        nsteps = max(2 * (j.mend - j.mbeg) - 1 for j in chunk)
        NT = _nt_bucket(-(-(nsteps + 1) // Rs))
        init, feed = pack_jobs(chunk, R, Rs, NT)
        call = _get_call(bw, HW, R, Rs, NT, bool(interpret))
        launched.append((chunk, call(init, feed)))
        tm["ncalls"] += 1
    tm["pack_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready([p[1] for p in launched])
    tm["kernel_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = []
    for chunk, (o0, o1) in launched:
        outs.extend(unpack_jobs(chunk, np.asarray(o0), np.asarray(o1)))
    tm["fetch_s"] = time.perf_counter() - t0
    last_timings.clear()
    last_timings.update(tm)
    return outs
