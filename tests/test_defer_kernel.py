"""Deferred-sync kernel mode (BSA_K8_DEFER) must be bit-exact vs the exact
per-row path: same planes, anchors, band starts, scores, and final state.
The optimistic chunk + replay design (ops/banded8_pallas.py) is only an
execution-schedule change; any divergence is a bug. Small geometry keeps
interpret-mode runtime bounded — broader configs are covered by the
out-of-tree fuzz (tools/fuzz_parity.py) against the reference binary.
"""
import numpy as np
import pytest

# heavyweight interpret-mode kernel coverage: excluded from the default
# profile (pyproject addopts -m "not slow"); run via `pytest -m slow`
pytestmark = pytest.mark.slow

from bsalign_tpu.align import pairwise as P
from bsalign_tpu.constants import MODE_GLOBAL
from bsalign_tpu.oracle import banded8 as O
from bsalign_tpu.ops import banded8_pallas as BP


def _pair(rng, L, err):
    t = rng.integers(0, 4, L).astype(np.uint8)
    q = []
    for b in t.tolist():
        r = rng.random()
        if r < err / 3:
            continue
        if r < 2 * err / 3:
            q.append(int(rng.integers(0, 4)))
        else:
            q.append(b)
        if rng.random() < err / 3:
            q.append(int(rng.integers(0, 4)))
    return np.array(q, np.uint8), t


@pytest.mark.parametrize("gaps", [(-3, -2, 0, 0),       # piecewise 1
                                  (-4, -2, -12, -1)])   # piecewise 2
def test_defer_matches_exact(gaps):
    Og, E, Q, Pp = gaps
    rng = np.random.default_rng(29)
    qs, ts = [], []
    for _ in range(4):
        q, t = _pair(rng, 150, 0.22)
        qs.append(q)
        ts.append(t)
    bw = 32
    mtx = O.set_score_matrix(2, -6)
    piecewise = O.get_piecewise(Og, E, Q, Pp, bw)
    qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, bw)
    us0, es0, qs0, ub0, _ = P._init_state(MODE_GLOBAL, bw, piecewise, 2, -6,
                                          Og, E, Q, Pp, len(qs))
    outs = {}
    for defer in (False, True):
        fwd = BP.make_forward(T, bw // 16, MODE_GLOBAL, piecewise, Og, E,
                              Q, Pp, 2, -6, interpret=True, defer=defer)
        r = fwd(qpad, qlens, tpad, tlens, P._mtx5(mtx), rby, us0, es0, qs0,
                ub0)
        got = dict(score=np.asarray(r.score), qe=np.asarray(r.qe),
                   te=np.asarray(r.te), us=np.asarray(r.planes.us),
                   ub=np.asarray(r.planes.ubegs),
                   begs=np.asarray(r.planes.begs),
                   fin_us=np.asarray(r.final_us),
                   fin_ub=np.asarray(r.final_ubegs))
        if r.planes.es is not None:
            got["es"] = np.asarray(r.planes.es)
        if r.planes.qs is not None:
            got["qs"] = np.asarray(r.planes.qs)
        outs[defer] = got
    for k in outs[False]:
        assert np.array_equal(outs[False][k], outs[True][k]), k
