"""Batched POA windows driver (production fan-out API)."""
import numpy as np

from bsalign_tpu.poa.batch import run_windows
from bsalign_tpu.poa.cli import default_poa_par


def _win(seed, n=6, L=150):
    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 4, L).astype(np.uint8)
    reads = []
    for _ in range(n):
        q = []
        for b in ref:
            r = rng.random()
            if r < 0.04:
                q.append(int(rng.integers(0, 4)))
            elif r < 0.08:
                continue
            else:
                q.append(int(b))
        reads.append(np.array(q, np.uint8))
    return reads


def test_run_windows_inline_matches_forked():
    wins = [_win(s) for s in range(3)]
    par = default_poa_par()
    inline = run_windows(wins, par, nproc=0)
    forked = run_windows(wins, par, nproc=2)
    assert len(inline) == len(forked) == 3
    for a, b in zip(inline, forked):
        assert np.array_equal(a.cns, b.cns)
        assert np.array_equal(a.qlt, b.qlt)
        assert a.snvs == b.snvs
        assert len(a.cns) > 100
