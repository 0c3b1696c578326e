"""Batched 8-bit banded striped pairwise DP — JAX engine.

TPU-first redesign of the reference engine (bsalign.h:2084-4050): the unit of
work is a *batch* of pairs. Layout is batch-minor: band state lives in
[W, WS, B] tensors (stripe, lane, pair) so the TPU's 128-lane axis is the
batch and every elementwise op runs at full VPU utilization; the W-step
stripe recurrence is a lax.scan over [WS, B] slices. All int8 saturating
arithmetic is emulated in int32 so results are bit-exact vs the scalar
oracle (and hence vs the reference binary). Rows past a pair's tlen freeze
its state (variable lengths by masking, not dynamic shapes).

Per-pair dynamic shifts (band movement, query-window extraction) are
implemented as selects over static rolls / chunked two-gathers — TPU gathers
along wide or minor axes are catastrophically slow and are avoided entirely.

Each row stores its u/e/q difference planes + int32 stripe anchors to HBM for
the host-side "backcal" traceback (bsalign.h:3704-3852 re-derives the path
from exactly these).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (MODE_GLOBAL, MODE_OVERLAP, SCORE_EPI8_MAX,
                         SCORE_EPI8_MIN, SCORE_MIN, WORDSIZE, mode_type)

WS = WORDSIZE  # 16
I32 = jnp.int32
MIN8 = SCORE_EPI8_MIN  # -63


def _adds8(a, b):
    return jnp.clip(a + b, -128, 127)


def _subs8(a, b):
    return jnp.clip(a - b, -128, 127)


def _wrap8(x):
    """C narrowing int->int8 (wraps)."""
    return ((x + 128) & 0xFF) - 128


class RowPlanes(NamedTuple):
    us: jax.Array            # [T, W*WS, B] int8 (None in codes mode)
    es: Optional[jax.Array]  # [T, W*WS, B] int8 or None
    qs: Optional[jax.Array]
    ubegs: jax.Array         # [T, WS+1, B] int32 (None in codes mode)
    begs: jax.Array          # [T, B] int32
    # Pallas codes mode: packed 4-bit traceback codes [T, ceil(W/8), WS, B]
    # int32, 8 cells per word along the stripe axis (align/btcodes.py)
    codes: Optional[jax.Array] = None


class ForwardResult(NamedTuple):
    planes: RowPlanes
    score: jax.Array   # [B] int32 (GLOBAL: corner score; else best-so-far)
    qe: jax.Array      # [B] int32
    te: jax.Array      # [B] int32
    final_us: jax.Array     # [W, WS, B] int32 (state at last active row)
    final_ubegs: jax.Array  # [WS+1, B] int32
    final_rbeg: jax.Array   # [B] int32
    # Pallas engine extras for T-chunked resume (None on the XLA engine):
    final_planes: object = None   # [us, es?, qs?] each [W, WS, B] int32
    final_reg: object = None      # [8, B] int32 raw register dump


def _sel_roll(x, amt, axis, n):
    """x rolled by per-pair amt (in [0, n)) along `axis`, as selects over the
    n static rolls. amt is [B] and batch is the minor axis of x."""
    out = x
    shape = [1] * x.ndim
    shape[-1] = -1
    amt_b = amt.reshape(shape)
    for k in range(1, n):
        out = jnp.where(amt_b == k, jnp.roll(x, -k, axis=axis), out)
    return out


def _shift_lanes(x, k):
    """out[..., j, :] = x[..., j+k, :] (zero fill); lanes = axis -2; k [B]."""
    n = x.shape[-2]
    rolled = _sel_roll(x, k, x.ndim - 2, n)
    j = jnp.arange(n).reshape((n, 1) if x.ndim == 2 else (1, n, 1))
    return jnp.where(j < n - k.reshape((1, -1) if x.ndim == 2 else (1, 1, -1)),
                     rolled, 0)


def _getscore_vec(us, ubegs, pos):
    """Absolute H at natural band position pos per pair.
    us [W, WS, B], ubegs [WS+1, B], pos [B] -> [B] int32."""
    W = us.shape[0]
    x = pos % W
    y = pos // W
    cums = jnp.cumsum(us, axis=0)  # [W, WS, B]
    mask = (jnp.arange(W)[:, None, None] == x[None, None, :]) \
        & (jnp.arange(WS)[None, :, None] == y[None, None, :])
    s = jnp.sum(jnp.where(mask, cums, 0), axis=(0, 1))
    ub = jnp.sum(jnp.where(jnp.arange(WS + 1)[:, None] == y[None, :],
                           ubegs, 0), axis=0)
    return ub + s


def _movx(us, es, qs, ubegs, movx, piecewise, nt_max, nt_min, gapo1, gape1,
          gapo2, gape2, W):
    """Vectorized banded_striped_epi8_seqalign_piecex_row_movx
    (bsalign.h:2244-2392) for per-pair movx in [0, bandwidth]."""
    B = us.shape[-1]
    BW = W * WS
    cyc = movx // W
    mov = movx % W
    div = W - mov
    is_zero = (movx == 0)
    is_full = (movx >= BW)

    i_ax = jnp.arange(W)[:, None, None]

    def plane_shift(x, fast):
        # new[i] = lanes_dn(old[i+mov], cyc) for i<div; lanes_dn(old[i-div],
        # cyc+1) for i>=div. Rolling stripes by mov gives old[(i+mov)%W],
        # which equals old[i+mov] for i<div and old[i-div] for i>=div. ✓
        rolled = _sel_roll(x, mov, 0, W)
        if fast:  # cyc == 0 for the whole batch: lane shift 0 / 1 (static)
            lo = rolled
            hi = jnp.concatenate([rolled[:, 1:], jnp.zeros_like(rolled[:, :1])],
                                 axis=1)
        else:
            lo = _shift_lanes(rolled, cyc)
            hi = _shift_lanes(rolled, cyc + 1)
        return jnp.where(i_ax < div[None, None, :], lo, hi)

    # ubegs: ubt[j] = ubegs[j] + sum_{i<mov} us[i, j] (only when mov>0)
    summ = jnp.sum(jnp.where(i_ax < mov[None, None, :], us, 0), axis=0)  # [WS, B]
    ubt = jnp.where(mov > 0, ubegs[:WS] + summ, ubegs[:WS])  # [WS, B]
    ubt_pad = jnp.concatenate([ubt, jnp.zeros((1, B), I32)], axis=0)

    planes = [p for p in (us, es, qs) if p is not None]

    def branch(fast):
        def run(args):
            ps, ubt_pad = args
            outs = [plane_shift(p, fast) for p in ps]
            # new ubegs[k] = ubt[k+cyc] for k < WS-cyc else ubegs[WS]
            shifted = ubt_pad if fast else _sel_roll(ubt_pad, cyc, 0, WS + 1)
            k = jnp.arange(WS + 1)[:, None]
            ub = jnp.where(k < (WS - cyc)[None, :], shifted,
                           ubegs[WS][None, :])
            return outs, ub
        return run

    outs, ub_n = jax.lax.cond(jnp.any(cyc > 0), branch(False), branch(True),
                              (planes, ubt_pad))
    outs = [jnp.where(is_zero, p, o) for p, o in zip(planes, outs)]
    us_n = outs[0]
    es_n = outs[1] if es is not None else None
    qs_n = outs[2] if qs is not None else None
    ub_n = jnp.where(is_zero, ubegs, ub_n)

    # mimic-insertion overhang over natural positions p >= BW - movx
    # (bsalign.h:2357-2390): us[p0] = c0; gape1 for p0 < p < p0+d; gape2 after
    if piecewise == 2:
        d = (gapo1 - gapo2) // (gape2 - gape1)  # both positive
        c0 = min(nt_min, gapo2 + gape2) - 1 - nt_max + (gapo2 + gape2)
    else:
        d = BW + 1
        c0 = min(nt_min, gapo1 + gape1) - 1 - nt_max + (gapo1 + gape1)
    c0 = ((c0 + 128) & 0xFF) - 128
    # natural position of slot [i, j] is j*W + i
    p = jnp.asarray(np.arange(BW).reshape(WS, W).T[:, :, None], I32)  # [W, WS, 1]
    p0 = (BW - movx)[None, None, :]
    fill = jnp.where(p < p0 + d, gape1, gape2)
    fill = jnp.where(p == p0, c0, fill)
    us_n = jnp.where((p >= p0) & ~is_zero, fill, us_n)
    # ubegs[b+1] += running overhang cost at end of lane block b
    pos = jnp.arange(BW)[:, None]  # [BW, 1] natural
    cost = jnp.where(pos < (BW - movx)[None, :] + d, gape1, gape2)
    cost = jnp.where(pos == (BW - movx)[None, :], c0, cost)
    cost = jnp.where(pos >= (BW - movx)[None, :], cost, 0)
    csum = jnp.cumsum(cost, axis=0)  # [BW, B]
    adj = csum[W - 1::W]  # [WS, B] running cost at each lane end
    lane0 = (BW - movx) // W
    lane_ok = jnp.arange(WS)[:, None] >= lane0[None, :]
    ub_adj = jnp.where(lane_ok & ~is_zero, adj, 0)
    ub_n = ub_n.at[1:].add(ub_adj)

    # movx >= bandwidth: full reset (bsalign.h:2253-2259)
    us_n = jnp.where(is_full, 0, us_n)
    if es_n is not None:
        es_n = jnp.where(is_full, 0, es_n)
    if qs_n is not None:
        qs_n = jnp.where(is_full, 0, qs_n)
    ub_n = jnp.where(is_full, SCORE_MIN, ub_n)
    return us_n, es_n, qs_n, ub_n


def _fpen(f, ubegs, gape, W):
    """Active F-loop prefix scan over lanes (bsalign.h:2639-2652).
    f [WS, B], ubegs [WS+1, B]."""
    fs0 = jnp.concatenate([jnp.full_like(f[:1], MIN8), f[:-1]], axis=0)
    t = W * gape

    def body(s, xs):
        fi, du = xs  # [B], [B]
        fi2 = jnp.where(fi < s, _wrap8(s), fi)
        s2 = t + fi2 - du
        return s2, fi2

    s0 = t + fs0[0] - (ubegs[1] - ubegs[0])
    du = ubegs[2:WS + 1] - ubegs[1:WS]  # [WS-1, B]
    _, fs_rest = jax.lax.scan(body, s0, (fs0[1:], du))
    return jnp.concatenate([fs0[:1], fs_rest], axis=0)


def _batched_window(qpad, start, win):
    """qpad[b, start_b : start_b + win] -> [B, win].

    Two adjacent-chunk gathers along a short chunk axis + log2 static rolls.
    Requires win <= chunk size C and qpad width % C == 0."""
    B, QP = qpad.shape
    C = 1
    while C < win:
        C *= 2
    assert QP % C == 0, (QP, C)
    NC = QP // C
    qv = qpad.reshape(B, NC, C)
    ci = start // C
    idx = jnp.stack([ci, jnp.minimum(ci + 1, NC - 1)], axis=1)  # [B, 2]
    g = jnp.take_along_axis(qv, idx[:, :, None], axis=1).reshape(B, 2 * C)
    off = start % C
    k = 1
    while k < C:
        g = jnp.where((off[:, None] & k) != 0, jnp.roll(g, -k, axis=1), g)
        k *= 2
    return g[:, :win]


def _qprof_row(qpad, rbeg, tbase, mtx5, W):
    """qprof stripes for the current row: [W+1, WS, B] int32.
    value(i, j, b) = mtx5[qpad[b, rbeg_b + i + j*W], tbase_b]."""
    B = qpad.shape[0]
    BW = W * WS
    win = _batched_window(qpad, rbeg, BW + W)  # [B, BW + W] codes
    srow = mtx5[:, tbase]  # [5, B] per-code score vs this row's target base
    sc = jnp.full_like(win, SCORE_EPI8_MIN)
    for v in range(4):
        sc = jnp.where(win == v, srow[v][:, None], sc)
    scT = sc.T  # [BW + W, B]
    main = scT[:BW].reshape(WS, W, B).transpose(1, 0, 2)  # [W, WS, B]
    last = scT[W:BW + W:W].reshape(1, WS, B)  # stripe W: positions (j+1)*W
    return jnp.concatenate([main, last], axis=0)


def make_forward(T: int, W: int, mode: int, piecewise: int, gapo1: int,
                 gape1: int, gapo2: int, gape2: int, nt_max: int, nt_min: int,
                 jit: bool = True, codes: bool = False):
    """Build the (jitted) batched forward pass for fixed geometry/costs.

    `codes` (packed traceback emission) is a Pallas-engine feature; this
    engine accepts the kwarg for signature compatibility but only the
    default False."""
    if codes:
        raise ValueError("codes mode is only supported by the Pallas engine")
    BW = W * WS
    GapE = gape1
    GapOE = gapo1 + gape1
    GapP = gape2
    GapQP = gapo2 + gape2
    GapOQ = max(-128, min(127, GapOE - GapQP))  # mm_subs_epi8 of constants
    mt = mode_type(mode)

    def row_cal(qprof_row, us0, es0, qs0, ub0, rh):
        """One batched row update; state [W, WS, B]; returns next state."""
        if piecewise == 0:
            t0 = us0[0, 0] + GapE
        elif piecewise == 1:
            t0 = us0[0, 0] + es0[0, 0]
        else:
            t0 = us0[0, 0] + jnp.maximum(es0[0, 0], qs0[0, 0])
        h0 = (rh - ub0[0]) + qprof_row[0, 0]
        h0 = jnp.where(h0 >= t0, jnp.minimum(h0, SCORE_EPI8_MAX), MIN8)
        h0 = _wrap8(h0)  # mm_insert_epi8 narrowing
        qp0 = qprof_row[0].at[0].set(h0)  # [WS, B]
        qp_next = qprof_row[1:]  # [W, WS, B]

        # --- pass 1: f (and g) entering each lane block ---
        if piecewise == 0:
            def p1(carry, xs):
                h, f = carry
                u, qn = xs
                e = _adds8(u, GapE)
                h = jnp.maximum(e, h)
                h = jnp.maximum(f, h)
                f = _adds8(h, GapE)
                f = _subs8(f, u)
                return (qn, f), None
            (_, f), _ = jax.lax.scan(
                p1, (qp0, jnp.full_like(qp0, MIN8)), (us0, qp_next))
            g = None
        elif piecewise == 1:
            def p1(carry, xs):
                h, f = carry
                u, e0, qn = xs
                e = _adds8(e0, u)
                h = jnp.maximum(e, h)
                h = jnp.maximum(f, h)
                f = _adds8(f, GapE)
                h = _adds8(h, GapOE)
                f = jnp.maximum(f, h)
                f = _subs8(f, u)
                return (qn, f), None
            (_, f), _ = jax.lax.scan(
                p1, (qp0, jnp.full_like(qp0, MIN8)), (us0, es0, qp_next))
            g = None
        else:
            def p1(carry, xs):
                h, f, g = carry
                u, e0, q0, qn = xs
                e = _adds8(e0, u)
                q = _adds8(q0, u)
                h = jnp.maximum(e, h)
                h = jnp.maximum(q, h)
                h = jnp.maximum(f, h)
                h = jnp.maximum(g, h)
                f = _adds8(f, GapE)
                h = _adds8(h, GapOE)
                f = jnp.maximum(f, h)
                f = _subs8(f, u)
                g = _adds8(g, GapP)
                h = _subs8(h, GapOQ)
                g = jnp.maximum(g, h)
                g = _subs8(g, u)
                return (qn, f, g), None
            (_, f, g), _ = jax.lax.scan(
                p1, (qp0, jnp.full_like(qp0, MIN8), jnp.full_like(qp0, MIN8)),
                (us0, es0, qs0, qp_next))
        f = _fpen(f, ub0, GapE, W)
        if piecewise == 2:
            g = _fpen(g, ub0, GapP, W)

        # --- pass 2 ---
        zero = jnp.zeros_like(qp0)
        if piecewise == 0:
            def p2(carry, xs):
                z, f, v, _, _ = carry
                u, qn = xs
                e = _adds8(u, GapE)
                h = jnp.maximum(e, z)
                h = jnp.maximum(f, h)
                us1 = _subs8(h, v)
                v = _subs8(h, u)
                f = _adds8(h, GapE)
                f = _subs8(f, u)
                return (qn, f, v, u, h), (us1,)
            (_, _, v, u_l, h_l), (us1,) = jax.lax.scan(
                p2, (qp0, f, zero, zero, zero), (us0, qp_next))
            es1 = qs1 = None
            h_fin = h_l
        elif piecewise == 1:
            def p2(carry, xs):
                z, f, v, _, _ = carry
                u, e0, qn = xs
                e = _adds8(e0, u)
                h = jnp.maximum(e, z)
                h = jnp.maximum(f, h)
                us1 = _subs8(h, v)
                v = _subs8(h, u)
                e = _adds8(e, GapE)
                e = _subs8(e, h)
                e = jnp.maximum(e, GapOE)
                f = _adds8(f, GapE)
                h = _adds8(h, GapOE)
                f = jnp.maximum(f, h)
                f = _subs8(f, u)
                return (qn, f, v, u, h), (us1, e)
            (_, _, v, u_l, h_l), (us1, es1) = jax.lax.scan(
                p2, (qp0, f, zero, zero, zero), (us0, es0, qp_next))
            qs1 = None
            h_fin = _subs8(h_l, GapOE)
        else:
            def p2(carry, xs):
                z, f, g, v, _, _ = carry
                u, e0, q0, qn = xs
                e = _adds8(e0, u)
                h = jnp.maximum(e, z)
                q = _adds8(q0, u)
                h = jnp.maximum(q, h)
                h = jnp.maximum(f, h)
                h = jnp.maximum(g, h)
                us1 = _subs8(h, v)
                v = _subs8(h, u)
                e = _adds8(e, GapE)
                e = _subs8(e, h)
                e = jnp.maximum(e, GapOE)
                q = _adds8(q, GapP)
                q = _subs8(q, h)
                q = jnp.maximum(q, GapQP)
                f = _adds8(f, GapE)
                h = _adds8(h, GapOE)
                f = jnp.maximum(f, h)
                f = _subs8(f, u)
                g = _adds8(g, GapP)
                h = _subs8(h, GapOQ)
                g = jnp.maximum(g, h)
                g = _subs8(g, u)
                return (qn, f, g, v, u, h), (us1, e, q)
            (_, _, _, v, u_l, h_l), (us1, es1, qs1) = jax.lax.scan(
                p2, (qp0, f, g, zero, zero, zero), (us0, es0, qs0, qp_next))
            h_fin = _subs8(h_l, GapQP)

        # --- tail codes (bsalign.h:2618-2636) ---
        v2 = _subs8(h_fin, u_l)  # [WS, B]
        ub1 = jnp.concatenate([ub0[:1], ub0[1:] + v2], axis=0)
        v3 = jnp.concatenate([jnp.zeros_like(v2[:1]), v2[:-1]], axis=0)
        us1_0 = _subs8(us1[0], v3)
        ub1 = ub1.at[0].set(ub0[0] + us1_0[0])
        us1_0 = us1_0.at[0].set(0)
        us1 = us1.at[0].set(us1_0)
        return us1, es1, qs1, ub1

    def band_mov_vec(ub, tidx, qoff, qlen):
        noisy = jnp.sum(jnp.abs(ub[1:] - ub[:-1]), axis=0)
        noisy = jnp.maximum(WS, noisy // WS // W * WS // 2)
        mov = jnp.where(ub[0] + noisy < ub[WS], 2,
                        jnp.where(ub[0] > ub[WS] + noisy, 0, 1))
        mov = jnp.where(tidx <= BW // 4, 0, mov)
        mov = jnp.where(qoff + BW >= qlen, 0, mov)
        return mov

    def forward(qpad, qlen, tseq, tlen, mtx5, rby, init_us, init_es, init_qs,
                init_ub):
        """qpad [B, QP] int32 (codes, 4-padded); tseq [B, T] int32;
        rby [T, B] int32 host-precomputed diagonal targets;
        init state batch-minor [W, WS, B] / [WS+1, B]."""
        B = qpad.shape[0]

        def step(carry, xs):
            us, es, qs, ub, rbeg, mov, best_s, best_qe, best_te = carry
            i, tbase, rby_i = xs
            active = i < tlen
            cond_move = (mov > 0) & (rbeg + BW < qlen)
            mov_eff = jnp.where(
                cond_move,
                jnp.minimum(mov, jnp.maximum(0, qlen - (rbeg + BW))), 0)
            rbeg_n = rbeg + mov_eff
            rh_move = _getscore_vec(us, ub, jnp.maximum(mov_eff - 1, 0))
            if mt == MODE_OVERLAP:
                rh_nomove = jnp.where(rbeg > 0, SCORE_MIN, 0)
            else:
                if piecewise < 2:
                    base_rh = gapo1 + gape1 * i
                else:
                    base_rh = jnp.maximum(gapo1 + gape1 * i, gapo2 + gape2 * i)
                rh_nomove = jnp.where(rbeg > 0, SCORE_MIN,
                                      jnp.where(i == 0, 0, base_rh))
            rh = jnp.where(cond_move, rh_move, rh_nomove)

            us0, es0, qs0, ub0 = _movx(us, es, qs, ub, mov_eff, piecewise,
                                       nt_max, nt_min, gapo1, gape1, gapo2,
                                       gape2, W)
            qprof_row = _qprof_row(qpad, rbeg_n, tbase, mtx5, W)
            us1, es1, qs1, ub1 = row_cal(qprof_row, us0, es0, qs0, ub0, rh)

            # adaptive band + global diagonal steering (bsalign.h:4006-4021)
            rbx = band_mov_vec(ub1, i, rbeg_n, qlen)
            if mt == MODE_GLOBAL:
                rbz = 2 * jnp.maximum(tlen // qlen, 1)
                m1 = tlen - i - 1
                D = qlen + rbz - 1 - rbeg_n - BW
                quick = (D >= 0) & (m1 <= D // rbz)
                movq = 1 + (qlen - (rbeg_n + BW)).astype(jnp.uint32) \
                    // jnp.maximum(1, m1).astype(jnp.uint32)
                mov_n = jnp.where(
                    quick, movq.astype(I32),
                    jnp.where(rbeg_n < rby_i - BW, rbx + 1,
                              jnp.where(rbeg_n > rby_i,
                                        jnp.maximum(0, rbx - 1), rbx)))
            else:
                mov_n = rbx

            # best-end tracking for overlap/extend (bsalign.h:4023-4032)
            if mt != MODE_GLOBAL:
                reach = rbeg_n + BW >= qlen
                sc = _getscore_vec(us1, ub1, jnp.maximum(qlen - 1 - rbeg_n, 0))
                upd = active & reach & (sc > best_s)
                best_s = jnp.where(upd, sc, best_s)
                best_qe = jnp.where(upd, qlen - 1, best_qe)
                best_te = jnp.where(upd, i, best_te)

            # freeze inactive pairs
            us_o = jnp.where(active, us1, us)
            es_o = None if es is None else jnp.where(active, es1, es)
            qs_o = None if qs is None else jnp.where(active, qs1, qs)
            ub_o = jnp.where(active, ub1, ub)
            rbeg_o = jnp.where(active, rbeg_n, rbeg)
            mov_o = jnp.where(active, mov_n, mov)
            # planes stored lane-aligned: [W*WS, B] int8, ubegs [WS+1, B]
            ys = (us1.astype(jnp.int8).reshape(BW, B),
                  None if es is None else es1.astype(jnp.int8).reshape(BW, B),
                  None if qs is None else qs1.astype(jnp.int8).reshape(BW, B),
                  ub1, rbeg_n)
            return (us_o, es_o, qs_o, ub_o, rbeg_o, mov_o, best_s, best_qe,
                    best_te), ys

        init_best = jnp.full((B,), SCORE_MIN, I32)
        zi = jnp.zeros((B,), I32)
        carry0 = (init_us, init_es, init_qs, init_ub, zi, zi,
                  init_best, zi, zi)
        xs = (jnp.arange(T, dtype=I32), jnp.moveaxis(tseq, 0, 1)[:T], rby)
        carry, ys = jax.lax.scan(step, carry0, xs)
        us_f, es_f, qs_f, ub_f, rbeg_f, _, best_s, best_qe, best_te = carry
        us_p, es_p, qs_p, ub_p, begs_p = ys
        if mt == MODE_GLOBAL:
            score = _getscore_vec(us_f, ub_f, qlen - 1 - rbeg_f)
            qe = qlen - 1
            te = tlen - 1
        else:
            score, qe, te = best_s, best_qe, best_te
        planes = RowPlanes(us_p, es_p, qs_p, ub_p, begs_p)
        return ForwardResult(planes, score, qe, te, us_f, ub_f, rbeg_f)

    return jax.jit(forward) if jit else forward
