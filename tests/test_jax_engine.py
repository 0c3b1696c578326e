"""Batched JAX engine vs scalar oracle: cell-exact scores and CIGARs."""
import numpy as np
import pytest

# heavyweight interpret-mode kernel coverage: excluded from the default
# profile (pyproject addopts -m "not slow"); run via `pytest -m slow`
pytestmark = pytest.mark.slow

from bsalign_tpu.constants import roundup
from bsalign_tpu.oracle import banded8 as O
from bsalign_tpu.align.pairwise import align_batch

from .util import gen_pair

CONFIGS = [
    (0, 128, (-3, -2, 0, 0)),    # global banded, affine
    (1, 0, (-3, -2, 0, 0)),      # overlap full band
    (2, 64, (-3, -2, 0, 0)),     # extend banded
    (0, 128, (0, -3, 0, 0)),     # linear gap (piecewise 0)
    (0, 128, (-3, -2, -8, -1)),  # 2-piece gap
    (1, 16, (-3, -2, 0, 0)),     # minimal band
]


@pytest.mark.parametrize("mode,W,gaps", CONFIGS)
def test_jax_matches_oracle(mode, W, gaps):
    rng = np.random.default_rng(5)
    pairs = [gen_pair(rng, int(250 * (1 + rng.uniform(-0.3, 0.3))), 0.15)
             for _ in range(4)]
    mtx = O.set_score_matrix(2, -6)
    qs = [p[0] for p in pairs]
    ts = [p[1] for p in pairs]
    outs = align_batch(qs, ts, mode, W, mtx, *gaps)
    bw = W if W > 0 else roundup(max(len(q) for q in qs), 16)
    for b, (q, t) in enumerate(pairs):
        rs_o, cg_o = O.pairwise(q, t, mode, bw, mtx, *gaps)
        rs_j, cg_j = outs[b]
        assert (rs_o.score, rs_o.qb, rs_o.qe, rs_o.tb, rs_o.te) == \
            (rs_j.score, rs_j.qb, rs_j.qe, rs_j.tb, rs_j.te), (mode, W, gaps, b)
        assert cg_o == cg_j, (mode, W, gaps, b)


def test_jax_heterogeneous_lengths():
    """Pairs of very different lengths in one batch (masked rows)."""
    rng = np.random.default_rng(9)
    pairs = [gen_pair(rng, L, 0.1) for L in (80, 400, 150, 333)]
    mtx = O.set_score_matrix(2, -6)
    outs = align_batch([p[0] for p in pairs], [p[1] for p in pairs], 0, 64,
                       mtx, -3, -2, 0, 0)
    for b, (q, t) in enumerate(pairs):
        rs_o, cg_o = O.pairwise(q, t, 0, 64, mtx, -3, -2, 0, 0)
        rs_j, cg_j = outs[b]
        assert rs_o.score == rs_j.score and cg_o == cg_j, b
