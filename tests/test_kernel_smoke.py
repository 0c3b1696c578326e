"""Fast default-profile smoke for the Pallas banded-8 kernel.

One tiny interpret-mode config (band 32, short reads, defer on so the
optimistic + replay machinery is traced) against the XLA scan engine.
The broad config matrices live in the `slow`-marked modules
(test_pallas_kernel.py, test_defer_kernel.py, ...); this test exists so
`pytest -q` (default profile, `-m "not slow"`) still exercises the
flagship kernel end to end.
"""
import numpy as np

from bsalign_tpu.align import pairwise as P
from bsalign_tpu.oracle import banded8 as O
from bsalign_tpu.ops import banded8_jax as KJ
from bsalign_tpu.ops import banded8_pallas as KP

from .util import gen_pair


def test_pallas_defer_smoke():
    rng = np.random.default_rng(3)
    qs, ts = [], []
    for _ in range(4):
        q, t = gen_pair(rng, 90, 0.12)
        qs.append(q)
        ts.append(t)
    BW = 32
    mtx = O.set_score_matrix(2, -6)
    qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, BW)
    us0, es0, qs0, ub0, _ = P._init_state(0, BW, 1, 2, -6, -3, -2, 0, 0,
                                          len(qs))
    args = (qpad, qlens, tpad, tlens, P._mtx5(mtx), rby, us0, es0, qs0, ub0)
    rj = KJ.make_forward(T, BW // 16, 0, 1, -3, -2, 0, 0, 2, -6)(*args)
    rp = KP.make_forward(T, BW // 16, 0, 1, -3, -2, 0, 0, 2, -6,
                         BL=8, Rs=8, defer=True, interpret=True)(*args)
    for b in range(len(tlens)):
        tl = int(tlens[b])
        for fld in ("us", "es", "ubegs"):
            np.testing.assert_array_equal(
                np.asarray(getattr(rj.planes, fld))[:tl, ..., b],
                np.asarray(getattr(rp.planes, fld))[:tl, ..., b], err_msg=fld)
        np.testing.assert_array_equal(
            np.asarray(rj.planes.begs)[:tl, b],
            np.asarray(rp.planes.begs)[:tl, b])
    np.testing.assert_array_equal(np.asarray(rj.score), np.asarray(rp.score))
