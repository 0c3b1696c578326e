"""Data-parallel sharding: sharded XLA forward and shard_map'd Pallas kernel
produce the single-chip results (SURVEY.md §2.6 scale-out story).

These tests run on a real multi-device mesh: the 8 virtual CPU devices the
conftest provisions (jax.devices("cpu") — robust even when a TPU plugin is
the default backend and JAX_PLATFORMS=cpu is ignored, the round-2 dryrun
failure mode)."""
import jax
import numpy as np
import pytest

# heavyweight interpret-mode kernel coverage: excluded from the default
# profile (pyproject addopts -m "not slow"); run via `pytest -m slow`
pytestmark = pytest.mark.slow

from bsalign_tpu.align import pairwise as P
from bsalign_tpu.oracle import banded8 as O
from bsalign_tpu.parallel import mesh as M


def _cpu_mesh(n=8):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return M.make_mesh(devs[:n])


def _batch(B, L, seed=0):
    rng = np.random.default_rng(seed)
    qs, ts = [], []
    for _ in range(B):
        t = rng.integers(0, 4, L).astype(np.uint8)
        q = t.copy()
        idx = rng.random(L) < 0.1
        q[idx] = (q[idx] + rng.integers(1, 4, int(idx.sum()))) & 3
        qs.append(q)
        ts.append(t)
    return qs, ts


def _run_sharded_pallas(B, L, BL, Rs, mesh, seed=0):
    BW = 128
    qs, ts = _batch(B, L, seed)
    mtx = O.set_score_matrix(2, -6)
    qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, BW)
    us0, es0, qs0, ub0, _ = P._init_state(0, BW, 1, 2, -6, -3, -2, 0, 0, B)
    run, prep = M.make_sharded_pallas_forward(T, BW // 16, 0, 1, -3, -2, 0,
                                              0, 2, -6, mesh, BL=BL, Rs=Rs)
    call, ops, meta = prep(qpad, qlens, tpad, tlens, P._mtx5(mtx), rby, us0,
                           es0, qs0, ub0)
    outs = run(call, ops)
    NB = meta[2]
    assert np.asarray(outs[-1]).shape[0] == NB
    # GLOBAL score from the final state (same math as the adapter)
    # outs (piecewise=1): us8, es8, ub, begs, fin_us, fin_es, fin_ub, scal
    fin_us = np.asarray(outs[-4]).transpose(1, 2, 0, 3).reshape(8, 16, -1)
    fin_ub = np.asarray(outs[-2]).transpose(1, 0, 2).reshape(24, -1)
    scal = np.asarray(outs[-1]).transpose(1, 0, 2).reshape(8, -1)
    for b in range(B):
        rbeg = int(scal[0, b])
        pos = int(qlens[b]) - 1 - rbeg
        cums = np.cumsum(fin_us[:, :, b], axis=0)
        got = int(fin_ub[pos // 8, b] + cums[pos % 8, pos // 8])
        rs, _ = O.pairwise(qs[b], ts[b], 0, BW, mtx, -3, -2, 0, 0)
        assert got == rs.score, (b, got, rs.score)


def test_sharded_pallas_8dev_matches_oracle():
    # B=16, BL=2 -> NB=8: one block per device, exact divisibility
    _run_sharded_pallas(B=16, L=192, BL=2, Rs=8, mesh=_cpu_mesh(8))


def test_sharded_pallas_nondivisible_batch():
    # B=9, BL=2 -> NB=5 blocks over 8 devices: exercises block padding
    _run_sharded_pallas(B=9, L=128, BL=2, Rs=8, mesh=_cpu_mesh(8), seed=3)


def test_sharded_xla_forward_8dev():
    B, L, BW = 16, 160, 128
    qs, ts = _batch(B, L, seed=5)
    mtx = O.set_score_matrix(2, -6)
    qpad, qlens, tpad, tlens, rby, T = P._pack_batch(qs, ts, BW)
    us0, es0, qs0, ub0, _ = P._init_state(0, BW, 1, 2, -6, -3, -2, 0, 0, B)
    mesh = _cpu_mesh(8)
    fwd = M.make_sharded_forward(T, BW // 16, 0, 1, -3, -2, 0, 0, 2, -6,
                                 mesh)
    res = fwd(qpad, qlens, tpad, tlens, P._mtx5(mtx), rby, us0, es0, qs0,
              ub0)
    scores = np.asarray(res.score)
    for b in range(B):
        rs, _ = O.pairwise(qs[b], ts[b], 0, BW, mtx, -3, -2, 0, 0)
        assert int(scores[b]) == rs.score


def test_dryrun_multichip_entrypoint():
    """The exact driver-scored entry point, on the conftest's 8 devices —
    keeps MULTICHIP green (regression for the round-2 failure)."""
    import __graft_entry__ as G
    G.dryrun_multichip(8)


def test_metrics_counters():
    from bsalign_tpu.utils import metrics
    metrics.reset()
    with metrics.timed("unit_test", 1000.0):
        pass
    c = metrics.counters()["unit_test"]
    assert c.cells == 1000.0 and c.calls == 1
    metrics.reset()
