"""Batched edit-distance JAX engine vs scalar oracle."""
import numpy as np
import pytest

from bsalign_tpu.align.editdist import edit_batch, kmer_edit_batch
from bsalign_tpu.oracle import edit as OE

from .util import gen_pair


def _pairs(n=4, L=250, err=0.15, seed=5):
    rng = np.random.default_rng(seed)
    ps = [gen_pair(rng, int(L * (1 + rng.uniform(-0.3, 0.3))), err)
          for _ in range(n)]
    return [p[0] for p in ps], [p[1] for p in ps]


@pytest.mark.parametrize("mode,W", [(0, 0), (0, 64), (0, 128), (1, 0), (2, 0)])
def test_edit_matches_oracle(mode, W):
    qs, ts = _pairs()
    outs = edit_batch(qs, ts, mode, W)
    for b in range(len(qs)):
        rs_o, cg_o = OE.edit_pairwise(qs[b], ts[b], mode, W)
        rs_j, cg_j = outs[b]
        assert (rs_o.score, rs_o.qb, rs_o.qe, rs_o.tb, rs_o.te) == \
            (rs_j.score, rs_j.qb, rs_j.qe, rs_j.tb, rs_j.te), (mode, W, b)
        assert cg_o == cg_j, (mode, W, b)


def test_kmer_edit_matches_oracle():
    qs, ts = _pairs(n=3, L=400, err=0.2, seed=7)
    outs = kmer_edit_batch(13, qs, ts)
    for b in range(len(qs)):
        rs_o, cg_o = OE.kmer_edit_pairwise(13, qs[b], ts[b])
        rs_j, cg_j = outs[b]
        assert rs_o.score == rs_j.score and cg_o == cg_j, b
