"""Device packed-codes path end-to-end: Pallas kernel codes emission ->
native C walker -> CIGARs must equal the backcal/planes results exactly.

This is the production traceback path on TPU (align/pairwise.py codes mode);
the suite otherwise only covers the Python extractor/decoder pair
(test_btcodes.py), so this closes the native-walker + kernel-emission gap.
"""
import numpy as np
import pytest

# heavyweight interpret-mode kernel coverage: excluded from the default
# profile (pyproject addopts -m "not slow"); run via `pytest -m slow`
pytestmark = pytest.mark.slow

from bsalign_tpu.align import btcodes as BC
from bsalign_tpu.align import pairwise as P
from bsalign_tpu.cigar import AlnResult
from bsalign_tpu.constants import MODE_GLOBAL, MODE_OVERLAP, mode_type
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


CONFIGS = [
    (MODE_GLOBAL, 128, 2, -6, -3, -2, 0.12, 300),
    (MODE_GLOBAL, 128, 2, -2, 0, -4, 0.12, 260),   # piecewise 0
]


@pytest.mark.parametrize("cfg", range(len(CONFIGS)))
def test_kernel_codes_native_walk(cfg):
    """Kernel codes output walked by the native decoder == oracle CIGARs."""
    mode, bw, M, X, Og, E, err, L = CONFIGS[cfg]
    rng = np.random.default_rng(7 + cfg)
    mtx = O.set_score_matrix(M, X)
    qs, ts = [], []
    for _ in range(4):
        q, t = _pair(rng, L, err)
        qs.append(q)
        ts.append(t)
    piecewise = O.get_piecewise(Og, E, 0, 0, bw)
    smax, smin = int(mtx.max()), int(mtx.min())
    W = bw // 16
    qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, bw)
    us0, es0, qs0, ub0, _ = P._init_state(mode, bw, piecewise, smax, smin,
                                          Og, E, 0, 0, len(qs))
    fwd = BP.make_forward(T, W, mode, piecewise, Og, E, 0, 0, smax, smin,
                          codes=True, interpret=True)
    res = fwd(qpad, qlens, tpad, tlens, P._mtx5(mtx), rby, us0, es0, qs0,
              ub0)
    codes_w = np.ascontiguousarray(res.planes.codes)
    begs_p = np.ascontiguousarray(res.planes.begs, np.int32)
    init_row = O.row_init(mode, bw, smax, smin, Og, E, 0, 0)
    if piecewise and init_row.es is not None:
        init_eo = (init_row.es.T.reshape(-1) == Og + E).astype(np.uint8)
    else:
        init_eo = np.ones(bw, np.uint8)

    from bsalign_tpu.native import rowops as NR
    have_native = NR.available()
    is_overlap = mode_type(mode) == MODE_OVERLAP
    for b in range(len(qs)):
        q, t = qs[b], ts[b]
        rs_ref, cg_ref = O.pairwise(q, t, mode, bw, mtx, Og, E, 0, 0)
        rs = AlnResult(score=int(res.score[b]), qe=int(res.qe[b]),
                       te=int(res.te[b]))
        if have_native:
            cg = NR.decode_codes(q, t, codes_w, begs_p, init_eo, b,
                                 is_overlap, bw, rs)
        else:
            nat = BC.unpack_codes(codes_w[:len(t), :, :, b], W)
            begs = [int(x) for x in begs_p[:len(t), b]]
            cg = BC.decode_codes(q, t, nat, begs, init_eo, mode, bw, rs)
        assert cg == cg_ref, (cfg, b)
        for f in ("qb", "qe", "tb", "te", "mat", "mis", "ins", "dele",
                  "aln"):
            assert getattr(rs, f) == getattr(rs_ref, f), (cfg, b, f)


@pytest.mark.parametrize("mode,bw", [(MODE_GLOBAL, 128),
                                     (MODE_OVERLAP, 128)])
def test_align_batch_codes_vs_planes(monkeypatch, mode, bw):
    """Full align_batch: codes path == planes path (Pallas engine forced)."""
    monkeypatch.setattr(P, "_engine", lambda: BP)
    rng = np.random.default_rng(3)
    qs, ts = [], []
    for _ in range(3):
        q, t = _pair(rng, 240, 0.15)
        qs.append(q)
        ts.append(t)
    mtx = O.set_score_matrix(2, -6)
    monkeypatch.setenv("BSA_BT_CODES", "1")
    r1 = P.align_batch(qs, ts, mode, bw, mtx, -3, -2, 0, 0)
    monkeypatch.setenv("BSA_BT_CODES", "0")
    r2 = P.align_batch(qs, ts, mode, bw, mtx, -3, -2, 0, 0)
    for (a1, c1), (a2, c2) in zip(r1, r2):
        assert c1 == c2
        for f in ("score", "qb", "qe", "tb", "te", "mat", "mis", "ins",
                  "dele", "aln"):
            assert getattr(a1, f) == getattr(a2, f)
