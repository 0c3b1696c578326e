"""Two-pass long-read mode: scores-only forward + reverse chunk re-forward
with the native resumable codes walker (align/pairwise._twopass_batch) must
reproduce the single-pass results exactly — including D-runs that straddle
chunk boundaries, pairs whose targets end before the last chunk, and the
non-global end clipping (reference semantics: bsalign.h:3704-3852).
"""
import numpy as np
import pytest

from bsalign_tpu.align import pairwise as P
from bsalign_tpu.constants import MODE_GLOBAL, MODE_OVERLAP
from bsalign_tpu.oracle import banded8 as O
from bsalign_tpu.ops import banded8_pallas as BP

# slow: interpret-mode Pallas forward at several T-chunk splits (excluded
# from the default profile; run via `pytest -m slow`)
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not __import__("bsalign_tpu.native", fromlist=["rowops"]
                       ).rowops.available(),
        reason="native rowops unavailable"),
]


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


def _gen_batch(rng):
    qs, ts = [], []
    # a deletion block straddling the row-chunk boundary at 384 (Tc=192):
    # rows 370-409 of the target are one D-run for the walker
    t = rng.integers(0, 4, 640).astype(np.uint8)
    q = np.concatenate([t[:370], t[410:]])
    qs.append(q.astype(np.uint8))
    ts.append(t)
    # a short pair that finishes well before the later chunks
    q2, t2 = _pair(rng, 230, 0.15)
    qs.append(q2)
    ts.append(t2)
    # a full-length noisy pair
    q3, t3 = _pair(rng, 700, 0.18)
    qs.append(q3)
    ts.append(t3)
    return qs, ts


@pytest.mark.parametrize("mode", [MODE_GLOBAL, MODE_OVERLAP])
def test_twopass_matches_single_pass(monkeypatch, mode):
    monkeypatch.setattr(P, "_engine", lambda: BP)
    monkeypatch.setattr(P, "T_CHUNK", 192)
    rng = np.random.default_rng(19)
    qs, ts = _gen_batch(rng)
    mtx = O.set_score_matrix(2, -6)
    monkeypatch.setenv("BSA_REALIGN_T", "256")   # forces the two-pass path
    r_two = P.align_batch(qs, ts, mode, 64, mtx, -3, -2, 0, 0)
    monkeypatch.setenv("BSA_REALIGN_T", "0")     # plain chunked codes path
    r_one = P.align_batch(qs, ts, mode, 64, mtx, -3, -2, 0, 0)
    for b, ((a1, c1), (a2, c2)) in enumerate(zip(r_two, r_one)):
        assert c1 == c2, b
        for f in ("score", "qb", "qe", "tb", "te", "mat", "mis", "ins",
                  "dele", "aln"):
            assert getattr(a1, f) == getattr(a2, f), (b, f)
