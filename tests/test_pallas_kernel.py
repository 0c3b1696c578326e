"""Parity: the Pallas Mosaic forward kernel vs the XLA (banded8_jax) engine.

The XLA engine is itself tested bit-exact against the scalar oracle and the
reference binary (test_jax_engine.py / test_oracle_parity.py); equality here
closes the chain for the Pallas path. Small BL/Rs keep compile times down;
the kernel math is identical at any block size.
"""
import numpy as np
import pytest

# heavyweight interpret-mode kernel coverage: excluded from the default
# profile (pyproject addopts -m "not slow"); run via `pytest -m slow`
pytestmark = pytest.mark.slow

from bsalign_tpu.align import pairwise as P
from bsalign_tpu.oracle import banded8 as O
from bsalign_tpu.ops import banded8_jax as KJ
from bsalign_tpu.ops import banded8_pallas as KP

GAPS = {0: (0, -2, 0, 0), 1: (-3, -2, 0, 0), 2: (-3, -2, -8, -1)}


def _gen_pairs(spec, seed):
    rng = np.random.default_rng(seed)
    qs, ts = [], []
    for (ql, tl, err) in spec:
        t = rng.integers(0, 4, tl).astype(np.uint8)
        q = []
        i = 0
        while i < tl:
            r = rng.random()
            if r < err * 0.3:
                q.append((int(t[i]) + rng.integers(1, 4)) & 3)
                i += 1
            elif r < err * 0.6:
                q.append(int(rng.integers(0, 4)))
            elif r < err:
                i += 1
            else:
                q.append(int(t[i]))
                i += 1
        q = np.array(q, np.uint8)
        if len(q) < ql:
            q = np.concatenate(
                [q, rng.integers(0, 4, ql - len(q)).astype(np.uint8)])
        qs.append(q[:ql])
        ts.append(t)
    return qs, ts


def _run_both(spec, mode, pw, BW, seed=0):
    gaps = GAPS[pw]
    qs, ts = _gen_pairs(spec, seed)
    B = len(qs)
    mtx = O.set_score_matrix(2, -6)
    qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, BW)
    us0, es0, qs0, ub0, _ = P._init_state(mode, BW, pw, 2, -6, *gaps, B)
    args = (qpad, qlens, tpad, tlens, P._mtx5(mtx), rby, us0, es0, qs0, ub0)
    W = BW // 16
    rj = KJ.make_forward(T, W, mode, pw, *gaps, 2, -6)(*args)
    rp = KP.make_forward(T, W, mode, pw, *gaps, 2, -6, BL=8, Rs=8)(*args)
    return rj, rp, tlens


def _assert_equal(rj, rp, tlens, pw):
    for b in range(len(tlens)):
        tl = int(tlens[b])
        np.testing.assert_array_equal(
            np.asarray(rj.planes.us)[:tl, :, b],
            np.asarray(rp.planes.us)[:tl, :, b])
        np.testing.assert_array_equal(
            np.asarray(rj.planes.ubegs)[:tl, :, b],
            np.asarray(rp.planes.ubegs)[:tl, :, b])
        np.testing.assert_array_equal(
            np.asarray(rj.planes.begs)[:tl, b],
            np.asarray(rp.planes.begs)[:tl, b])
        if pw >= 1:
            np.testing.assert_array_equal(
                np.asarray(rj.planes.es)[:tl, :, b],
                np.asarray(rp.planes.es)[:tl, :, b])
        if pw == 2:
            np.testing.assert_array_equal(
                np.asarray(rj.planes.qs)[:tl, :, b],
                np.asarray(rp.planes.qs)[:tl, :, b])
    np.testing.assert_array_equal(np.asarray(rj.score), np.asarray(rp.score))
    np.testing.assert_array_equal(np.asarray(rj.qe), np.asarray(rp.qe))
    np.testing.assert_array_equal(np.asarray(rj.te), np.asarray(rp.te))


@pytest.mark.parametrize("mode,pw", [(0, 1), (1, 1), (2, 0)])
def test_pallas_matches_jax_engine(mode, pw):
    spec = [(300, 300, 0.12), (200, 260, 0.2), (260, 200, 0.05),
            (150, 330, 0.15), (330, 150, 0.1)]
    rj, rp, tlens = _run_both(spec, mode, pw, BW=64)
    _assert_equal(rj, rp, tlens, pw)


def test_pallas_long_skewed_and_2piece():
    # long pairs exercise the query-window refresh cycle; heavy skew
    # exercises the general band-move tier + quick diagonal steering
    spec = [(1400, 1400, 0.1), (1400, 300, 0.1), (300, 1400, 0.1)]
    rj, rp, tlens = _run_both(spec, 0, 2, BW=128)
    _assert_equal(rj, rp, tlens, 2)


def test_pallas_wide_band():
    spec = [(700, 700, 0.25)] * 2
    rj, rp, tlens = _run_both(spec, 0, 1, BW=256)
    _assert_equal(rj, rp, tlens, 1)


def test_align_batch_uses_pallas_identically(monkeypatch):
    """End-to-end align_batch parity between engines (CIGARs included)."""
    spec = [(240, 260, 0.15)] * 3
    qs, ts = _gen_pairs(spec, 3)
    mtx = O.set_score_matrix(2, -6)
    from bsalign_tpu.align.pairwise import align_batch
    monkeypatch.setenv("BSA_FORWARD_ENGINE", "jax")
    r_jax = align_batch(qs, ts, 0, 64, mtx, -3, -2, 0, 0)
    monkeypatch.setenv("BSA_FORWARD_ENGINE", "pallas")
    r_pal = align_batch(qs, ts, 0, 64, mtx, -3, -2, 0, 0)
    for (ra, ca), (rb, cb) in zip(r_jax, r_pal):
        assert ra.score == rb.score and ca == cb
        assert (ra.qb, ra.qe, ra.tb, ra.te) == (rb.qb, rb.qe, rb.tb, rb.te)
