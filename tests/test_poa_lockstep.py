"""Lockstep multi-window POA: the device-batched remsa rounds must produce
byte-identical per-window results to the sequential host path. Runs the
Pallas pedit kernel in interpret mode so the test works on the CPU mesh."""
import functools

import numpy as np
import pytest

from bsalign_tpu.native import rowops as NR
from bsalign_tpu.ops import pedit_pallas
from bsalign_tpu.poa.batch import run_windows, run_windows_lockstep
from bsalign_tpu.poa.core import BSPOAPar

BASES = "ACGT"


def _gen_window(rng, nreads=8, reflen=200, err=0.13):
    ref = rng.integers(0, 4, reflen)
    reads = []
    for _ in range(nreads):
        out = []
        for b in ref.tolist():
            r = rng.random()
            if r < err / 3:
                continue
            if r < 2 * err / 3:
                out.append(int(rng.integers(0, 4)))
            else:
                out.append(b)
            if rng.random() < err / 3:
                out.append(int(rng.integers(0, 4)))
        reads.append("".join(BASES[c] for c in out))
    return reads


def test_lockstep_matches_sequential(monkeypatch):
    if not NR.available():
        pytest.skip("native rowops unavailable")
    import jax
    rng = np.random.default_rng(11)
    wins = [_gen_window(rng, 8, 180 + 30 * k) for k in range(3)]
    monkeypatch.setenv("BSA_PEDIT_DEVICE", "0")
    host = run_windows(wins, BSPOAPar(), device=False)
    monkeypatch.setattr(
        pedit_pallas, "pedit_forward_batch",
        functools.partial(pedit_pallas.pedit_forward_batch, interpret=True))
    # pin the device path: the empirical probe would (correctly) pick the
    # host engine under interpret mode, but this test exists to check the
    # device path's byte parity
    import bsalign_tpu.poa.batch as PB
    monkeypatch.setenv("BSA_PEDIT_DEVICE", "force")
    monkeypatch.setattr(PB, "_PEDIT_DEV_WINS", None)
    # pin eager placement to CPU so the interpret-mode kernel never touches
    # a (possibly tunneled) accelerator in the test environment
    old_dev = jax.config.jax_default_device
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    try:
        dev = run_windows_lockstep(wins, BSPOAPar())
    finally:
        jax.config.update("jax_default_device", old_dev)
    for h, d in zip(host, dev):
        assert np.array_equal(h.cns, d.cns)
        assert np.array_equal(h.qlt, d.qlt)
        assert np.array_equal(h.alt, d.alt)
        assert h.snvs == d.snvs
