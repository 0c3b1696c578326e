"""Fuzz: native banded-8 row primitives vs the NumPy oracle
(row_movx+row_cal fusion across piecewise costs and band moves, and
row_merge) must agree bit-for-bit."""
import numpy as np
import pytest

from bsalign_tpu.native import rowops as NR
from bsalign_tpu.oracle import banded8 as B8

if not NR.available():  # pragma: no cover
    pytest.skip("native rowops unavailable", allow_module_level=True)

WS = 16
GAPS = {0: (0, -2, 0, 0), 1: (-3, -2, 0, 0), 2: (-3, -2, -8, -1)}


def _rand_state(rng, W, pw):
    st = B8.RowState(W, pw)
    st.us[:] = rng.integers(-63, 64, (W, WS), dtype=np.int8)
    if pw:
        st.es[:] = rng.integers(-63, 10, (W, WS), dtype=np.int8)
    if pw == 2:
        st.qs[:] = rng.integers(-63, 10, (W, WS), dtype=np.int8)
    ub = rng.integers(-100, 100, WS + 1).astype(np.int64)
    st.ubegs[:] = np.cumsum(ub)
    return st


def test_rowops_fuzz():
    rng = np.random.default_rng(0)
    for _ in range(120):
        W = int(rng.choice([4, 8, 16]))
        pw = int(rng.choice([0, 1, 2]))
        gapo1, gape1, gapo2, gape2 = GAPS[pw]
        bw = W * WS
        qlen = bw + int(rng.integers(0, 200))
        qseq = rng.integers(0, 4, qlen).astype(np.uint8)
        mtx = B8.set_score_matrix(2, -6)
        qprof = B8.set_query_prof(qseq, qlen, bw, mtx)
        prev = _rand_state(rng, W, pw)
        movx = int(rng.choice([0, 1, 2, 3, 7, W, W + 1, 2 * W + 3, bw,
                               bw + 5]))
        rbeg = int(rng.integers(0, max(1, qlen - bw - movx)))
        base = int(rng.integers(0, 4))
        rh_mode = int(rng.choice([0, 1, 2]))
        rh_val = (int(rng.integers(-100, 100)) if rh_mode == 0
                  else min(movx, 5))
        # oracle
        shifted = B8.row_movx(prev, W, movx, pw, 2, -6, gapo1, gape1,
                              gapo2, gape2)
        if rh_mode == 0:
            rh = rh_val
        elif rh_mode == 1:
            rh = int(shifted.ubegs[0])
        else:
            rh = B8.getscore(prev, W, rh_val)
        cur_o = B8.RowState(W, pw)
        B8.row_cal(rbeg, base, shifted, cur_o, qprof, gapo1, gape1, gapo2,
                   gape2, W, rh, pw)
        # native
        cur_n = NR.row_update(prev, W, movx, pw, qprof, rbeg, base, 2, -6,
                              gapo1, gape1, gapo2, gape2, rh_mode, rh_val)
        np.testing.assert_array_equal(cur_o.us, cur_n.us)
        np.testing.assert_array_equal(cur_o.ubegs, cur_n.ubegs)
        if pw:
            np.testing.assert_array_equal(cur_o.es, cur_n.es)
        if pw == 2:
            np.testing.assert_array_equal(cur_o.qs, cur_n.qs)
        # merge
        st1 = _rand_state(rng, W, pw)
        mo = B8.row_merge(cur_o, st1, W, pw)
        mn = NR.row_merge(cur_o, st1, W, pw)
        np.testing.assert_array_equal(mo.us, mn.us)
        np.testing.assert_array_equal(mo.ubegs, mn.ubegs)
