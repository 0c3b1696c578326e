"""Batched bit-parallel edit-distance rows — JAX engine.

The reference computes edit rows as ±1 difference bit-planes with a SWAT
convergence loop for the horizontal carry (bsalign.h:766-810). The row values
are the unique fixpoint of that recurrence, which equals Myers' closed-form
bit-vector step (Myers 1999): the carry chain is one binary addition. Here
the band is packed 32 cells/lane-word in [NW, B] uint32 tensors (batch
minor); the addition's cross-word carry is a short scan over NW words, and
the per-row band shift (whose trajectory is data-independent,
bsalign.h:1108-1117) is an elementwise bit-shift plus a word roll.

Bit conventions match the reference: plane pm = "u == -1", pp = "u == +1";
row boundary v=+1 for global/extend, v=0 for overlap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import MODE_OVERLAP, mode_type

U32 = jnp.uint32
I32 = jnp.int32
FULL = jnp.uint32(0xFFFFFFFF)


class EditResult(NamedTuple):
    pm: jax.Array      # [T, NW, B] uint32 minus-planes per row
    pp: jax.Array      # [T, NW, B] uint32 plus-planes per row
    sbeg: jax.Array    # [T, B] int32 H at band-left boundary per row
    smin: jax.Array    # [B] best overlap/extend row score
    ry: jax.Array      # [B] row of best score
    final_score: jax.Array  # [B] global score (H(qlen-1, tlen-1))
    final_sbeg: jax.Array   # [B]


def _word_roll(x, k, NW):
    """x[(i+k) % NW] along axis 0 via selects over static rolls; k [B]."""
    out = x
    for c in range(1, NW):
        out = jnp.where(k[None, :] == c, jnp.roll(x, -c, axis=0), out)
    return out


def _shift_planes(pm, pp, movx, NW, bw):
    """Band shift: new bit p = old bit p+movx; overhang (p >= bw-movx) gets
    u=+1 (striped_seqedit_row_movx, bsalign.h:658-721)."""
    wsh = movx // 32
    bsh = (movx % 32).astype(U32)

    def sh(x):
        r0 = _word_roll(x, wsh, NW)
        r1 = jnp.concatenate([r0[1:], jnp.zeros_like(r0[:1])], axis=0)
        lo = r0 >> bsh[None, :]
        hi = jnp.where(bsh[None, :] == 0, 0, r1 << (32 - bsh)[None, :])
        return lo | hi

    keep = _lowmask(jnp.maximum(bw - movx, 0), NW)  # bits from the old band
    pm_n = sh(pm) & keep
    pp_n = (sh(pp) & keep) | ~keep
    return pm_n, pp_n


def _lowmask(n, NW):
    """Per-word mask of bits with global index < n; n [B] -> [NW, B] u32."""
    m = jnp.clip(n[None, :] - jnp.arange(NW, dtype=I32)[:, None] * 32, 0, 32)
    return jnp.where(m >= 32, FULL,
                     (jnp.uint32(1) << m.astype(U32)) - jnp.uint32(1))


def _popsum(x):
    return jnp.sum(jax.lax.population_count(x).astype(I32), axis=0)


def make_edit_forward(T: int, NW: int, mode: int, NWQ: int, win_chunked: bool):
    """Jitted batched edit forward: T rows, band = NW*32 bits."""
    bw = NW * 32
    is_overlap = mode_type(mode) == MODE_OVERLAP
    hp_in = jnp.uint32(0 if is_overlap else 1)

    def eq_window(qeq, rbeg):
        """Extract band Eq words for each of the 4 bases then pick later.
        qeq [4, B, NWQ] uint32; returns [4, NW+1, B] (word-aligned at
        rbeg//32, caller bit-shifts)."""
        ws = rbeg // 32
        outs = []
        for v in range(4):
            if win_chunked:
                from .banded8_jax import _batched_window
                w = _batched_window(qeq[v], ws, NW + 1)  # [B, NW+1]
            else:
                w = qeq[v][:, : NW + 1]
            outs.append(w.T)
        return jnp.stack(outs, axis=0)  # [4, NW+1, B]

    def forward(qeq, qlen, tseq, tlen, rbegs, movxs):
        """qeq [4, B, NWQ] uint32 (bit x of word: qseq[x]==base, 0 past qlen);
        rbegs/movxs [T, B] int32 (host-precomputed band trajectory)."""
        B = qlen.shape[0]
        pm0 = jnp.zeros((NW, B), U32)
        pp0 = jnp.full((NW, B), FULL, U32)
        sbeg0 = jnp.zeros((B,), I32)

        def step(carry, xs):
            pm, pp, sbeg, smin, ry, rbeg_f = carry
            i, tbase, rbeg, movx = xs
            active = i < tlen
            if is_overlap:
                sbeg_n = jnp.zeros_like(sbeg)
                pm_s, pp_s = pm, pp
            else:
                mv = jnp.minimum(movx, bw)
                mask = _lowmask(mv, NW)
                dsum = _popsum(pp & mask) - _popsum(pm & mask)
                sbeg_n = sbeg + jnp.where(movx > 0, dsum, 0) + 1
                pm_s, pp_s = _shift_planes(pm, pp, movx, NW, bw)
                full = movx >= bw
                pm_s = jnp.where(full, 0, pm_s)
                pp_s = jnp.where(full, FULL, pp_s)
                zero = movx == 0
                pm_s = jnp.where(zero, pm, pm_s)
                pp_s = jnp.where(zero, pp, pp_s)

            # Eq for this row's band, aligned to rbeg
            eqw = eq_window(qeq, rbeg)  # [4, NW+1, B]
            eq4 = eqw[0]
            for v in range(1, 4):
                eq4 = jnp.where(tbase[None, :] == v, eqw[v], eq4)
            bsh = (rbeg % 32).astype(U32)
            lo = eq4[:NW] >> bsh[None, :]
            hi = jnp.where(bsh[None, :] == 0, 0,
                           eq4[1:NW + 1] << (32 - bsh)[None, :])
            Eq = lo | hi  # [NW, B]

            # Myers step with multi-word carry
            X = Eq | pm_s
            ad = X & pp_s

            def add_scan(c, xs_w):
                a, b = xs_w
                s0 = a + b
                s1 = s0 + c.astype(U32)
                cout = (s0 < a) | ((s1 < s0))
                return cout, s1
            _, A = jax.lax.scan(add_scan, jnp.zeros((B,), jnp.bool_),
                                (ad, pp_s))
            D0 = (A ^ pp_s) | X
            HP = pm_s | ~(D0 | pp_s)
            HN = pp_s & D0
            # shift HP/HN left one bit across words; bit 0 <- hp_in / 0
            HPc = jnp.concatenate(
                [jnp.broadcast_to(hp_in, (1, B)), HP[:-1] >> 31], axis=0)
            HPs = (HP << 1) | HPc
            HNs = jnp.concatenate(
                [jnp.zeros((1, B), U32), HN[:-1] >> 31], axis=0) | (HN << 1)
            pp_n = HNs | ~(D0 | HPs)
            pm_n = HPs & D0

            # row score at H(qlen-1, i) for overlap/extend tracking
            if is_overlap or mode_type(mode) == 2:
                srow = sbeg_n + _popsum(pp_n) - _popsum(pm_n)
                inb = _lowmask(jnp.clip(qlen - rbeg, 0, bw), NW)
                hi_m = ~inb
                srow = srow - _popsum(pp_n & hi_m) + _popsum(pm_n & hi_m)
                upd = active & (srow < smin)
                smin = jnp.where(upd, srow, smin)
                ry = jnp.where(upd, i, ry)

            pm_o = jnp.where(active, pm_n, pm)
            pp_o = jnp.where(active, pp_n, pp)
            sbeg_o = jnp.where(active, sbeg_n, sbeg)
            rbeg_o = jnp.where(active, rbeg, rbeg_f)
            return (pm_o, pp_o, sbeg_o, smin, ry, rbeg_o), \
                (pm_n, pp_n, sbeg_n)

        smin0 = jnp.full((B,), 0x7FFFFFFF, I32)
        zi = jnp.zeros((B,), I32)
        xs = (jnp.arange(T, dtype=I32), jnp.moveaxis(tseq, 0, 1)[:T],
              rbegs, movxs)
        (pm_f, pp_f, sbeg_f, smin, ry, rbeg_f), (pm_t, pp_t, sbeg_t) = \
            jax.lax.scan(step, (pm0, pp0, sbeg0, smin0, zi, zi), xs)
        # global score: H(qlen-1, tlen-1) from the frozen final state, minus
        # garbage contributions past qlen (bsalign.h:1194-1202)
        inb = _lowmask(jnp.clip(qlen - rbeg_f, 0, bw), NW)
        score = sbeg_f + _popsum(pp_f & inb) - _popsum(pm_f & inb)
        return EditResult(pm_t, pp_t, sbeg_t, smin, ry, score, sbeg_f)

    return jax.jit(forward)
