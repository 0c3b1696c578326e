"""T-chunked Pallas forward with device-state carry must equal the
single-shot run exactly (long-read memory story, SURVEY.md §7 hard part 7:
planes are O(T*BW*B) — chunking bounds in-flight rows while the band
state, anchors and best-end registers resume bit-for-bit)."""
import numpy as np
import pytest

# heavyweight interpret-mode kernel coverage: excluded from the default
# profile (pyproject addopts -m "not slow"); run via `pytest -m slow`
pytestmark = pytest.mark.slow

from bsalign_tpu.align import pairwise as P
from bsalign_tpu.oracle import banded8 as O


def _pairs(B, L, seed):
    rng = np.random.default_rng(seed)
    qs, ts = [], []
    for _ in range(B):
        t = rng.integers(0, 4, L).astype(np.uint8)
        q = []
        i = 0
        while i < L:
            r = rng.random()
            if r < 0.03:
                q.append((int(t[i]) + int(rng.integers(1, 4))) & 3)
                i += 1
            elif r < 0.06:
                q.append(int(rng.integers(0, 4)))
            elif r < 0.1:
                i += 1
            else:
                q.append(int(t[i]))
                i += 1
        qs.append(np.array(q, np.uint8))
        ts.append(t)
    return qs, ts


def test_scores_only_matches_full():
    """Scores-only mode (zero per-row plane output, bsalign.h score-mode
    analog) must produce identical scores/ends to the full forward."""
    from bsalign_tpu.ops import banded8_pallas as KP
    qs, ts = _pairs(5, 500, seed=4)
    mtx = O.set_score_matrix(2, -6)
    qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, 128)
    us0, es0, qs0, ub0, _ = P._init_state(0, 128, 1, 2, -6, -3, -2, 0, 0,
                                          len(qs))
    args = (qpad, qlens, tpad, tlens, P._mtx5(mtx), rby, us0, es0, qs0, ub0)
    kw = dict(BL=8, Rs=8)
    r1 = KP.make_forward(T, 8, 0, 1, -3, -2, 0, 0, 2, -6, **kw)(*args)
    r2 = KP.make_forward(T, 8, 0, 1, -3, -2, 0, 0, 2, -6, scores_only=True,
                         **kw)(*args)
    assert np.array_equal(np.asarray(r1.score), np.asarray(r2.score))
    assert np.array_equal(np.asarray(r1.final_rbeg),
                          np.asarray(r2.final_rbeg))
    assert r2.planes.us is None


@pytest.mark.parametrize("mode", [0, 1])
def test_chunked_equals_single(mode, monkeypatch):
    import jax
    if jax.default_backend() == "cpu":
        pytest.skip("chunked path uses the Pallas engine (TPU)")
    qs, ts = _pairs(6, 900, seed=11)
    mtx = O.set_score_matrix(2, -6)
    full = P.align_batch(qs, ts, mode, 128, mtx, -3, -2, 0, 0)
    monkeypatch.setattr(P, "T_CHUNK", 384)
    chk = P.align_batch(qs, ts, mode, 128, mtx, -3, -2, 0, 0)
    for (ra, ca), (rb, cb) in zip(full, chk):
        assert ra.score == rb.score
        assert (ra.qb, ra.qe, ra.tb, ra.te) == (rb.qb, rb.qe, rb.tb, rb.te)
        assert ca == cb
