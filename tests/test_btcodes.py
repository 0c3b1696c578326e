"""Packed traceback codes must reproduce backcal's CIGARs exactly.

codes_from_rows extracts the 4 decision bits per cell from oracle-stored
rows (the same planes backcal reads); decode_codes walks them with no score
arithmetic. Any divergence from backcal is a red flag for the device
bt-code path."""
import numpy as np
import pytest

from bsalign_tpu.align import btcodes as BC
from bsalign_tpu.cigar import AlnResult
from bsalign_tpu.constants import MODE_GLOBAL, MODE_OVERLAP
from bsalign_tpu.oracle import banded8 as O


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
    # (mode, bw, M, X, O, E, err, L)  — piecewise 1 (affine) and 0 (linear)
    (MODE_GLOBAL, 128, 2, -6, -3, -2, 0.12, 300),
    (MODE_GLOBAL, 64, 2, -6, -3, -2, 0.2, 220),
    (MODE_GLOBAL, 128, 2, -2, 0, -4, 0.12, 260),   # piecewise 0
    (MODE_OVERLAP, 128, 2, -6, -3, -2, 0.15, 240),
    (MODE_GLOBAL, 32, 1, -4, -2, -1, 0.25, 150),
]


@pytest.mark.parametrize("cfg", range(len(CONFIGS)))
def test_codes_match_backcal(cfg):
    mode, bw, M, X, Og, E, err, L = CONFIGS[cfg]
    rng = np.random.default_rng(100 + cfg)
    mtx = O.set_score_matrix(M, X)
    GapOE = Og + E
    for it in range(6):
        q, t = _pair(rng, L, err)
        if len(q) == 0:
            continue
        rs, cigars, init, rows, begs = O.pairwise(
            q, t, mode, bw, mtx, Og, E, 0, 0, return_rows=True)
        bandwidth = bw if bw else O.roundup(len(q), 16)
        codes = BC.codes_from_rows(q, t, init, rows, begs, mode, bandwidth,
                                   mtx, Og, E, 0, 0)
        if init.es is not None:
            init_eo = init.es.T.reshape(-1) == GapOE
        else:
            init_eo = np.ones(bandwidth, bool)
        # backcal mutated rs to 1-past-end; decode wants the end cell
        rs2 = AlnResult(score=rs.score, qe=rs.qe - 1, te=rs.te - 1)
        cg2 = BC.decode_codes(q, t, codes, begs, init_eo, mode, bandwidth,
                              rs2)
        assert cg2 == cigars, (cfg, it)
        for f in ("qb", "qe", "tb", "te", "mat", "mis", "ins", "dele",
                  "aln"):
            assert getattr(rs2, f) == getattr(rs, f), (cfg, it, f)
