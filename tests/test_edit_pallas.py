"""Parity: Pallas edit kernel vs the XLA edit engine (which is itself
byte-exact vs the reference binary — test_edit_engine.py)."""
import os

import numpy as np
import pytest

from bsalign_tpu.align import editdist as E


def _gen(B, L, err, seed, skew=False):
    rng = np.random.default_rng(seed)
    qs, ts = [], []
    for _ in range(B):
        tl = L if not skew else int(L * (0.5 + rng.random()))
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
        qs.append(np.array(q, np.uint8))
        ts.append(t)
    return qs, ts


@pytest.mark.parametrize("mode,bw,skew,ksz", [
    (0, 0, False, 0),      # global, full matrix
    (0, 64, True, 0),      # global, banded, skewed lengths
    (1, 0, False, 0),      # overlap
    (2, 0, False, 0),      # extend
    (0, 0, False, 13),     # kmer-guided segmented
])
def test_edit_pallas_matches_jax(monkeypatch, mode, bw, skew, ksz):
    qs, ts = _gen(5, 350, 0.15, 11, skew)
    monkeypatch.setenv("BSA_FORWARD_ENGINE", "jax")
    rj = (E.kmer_edit_batch(ksz, qs, ts) if ksz
          else E.edit_batch(qs, ts, mode, bw))
    monkeypatch.setenv("BSA_FORWARD_ENGINE", "pallas")
    rp = (E.kmer_edit_batch(ksz, qs, ts) if ksz
          else E.edit_batch(qs, ts, mode, bw))
    for (ra, ca), (rb, cb) in zip(rj, rp):
        assert (ra.score, ra.qb, ra.qe, ra.tb, ra.te) == \
            (rb.score, rb.qb, rb.qe, rb.tb, rb.te)
        assert ca == cb
