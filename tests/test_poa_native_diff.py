"""Differential: native (librowops + SoA graph) POA vs the pure-NumPy
fallback must be byte-identical across edge-case configs (tiny windows,
high error, refmode, scalar remsa, narrow recall window)."""
import io
import os

import numpy as np
import pytest

BASES = "ACGT"


def _gen(rng, n, L, err):
    ref = rng.integers(0, 4, L)
    seqs = []
    for _ in range(n):
        q = []
        for b in ref:
            r = rng.random()
            if r < err * 0.3:
                q.append(int(rng.integers(0, 4)))
            elif r < err * 0.6:
                q.append(int(b))
                q.append(int(rng.integers(0, 4)))
            elif r < err:
                continue
            else:
                q.append(int(b))
        seqs.append("".join(BASES[c] for c in q) or "A")
    return seqs


def _run(seqs, par_kw, no_native, monkeypatch):
    if no_native:
        monkeypatch.setenv("BSA_NO_NATIVE", "1")
    else:
        monkeypatch.delenv("BSA_NO_NATIVE", raising=False)
    import bsalign_tpu.native as N
    N._TRIED = False
    N._LIB = None
    from bsalign_tpu.poa.cli import default_poa_par
    from bsalign_tpu.poa.core import BSPOA
    par = default_poa_par()
    for k, v in par_kw.items():
        setattr(par, k, v)
    g = BSPOA(par)
    g.beg()
    for s in seqs:
        g.push(s)
    g.end()
    g.tidy_msa()
    g.call_snvs()
    out = io.StringIO()
    g.print_msa("X", out)
    g.print_snvs("X", out)
    return out.getvalue()


@pytest.mark.parametrize("n,L,err,kw", [
    (2, 30, 0.3, {}),
    (5, 80, 0.05, {}),
    (6, 60, 0.1, {"refmode": 1}),
    (4, 50, 0.15, {"editbw": -64}),
    (4, 50, 0.15, {"realn": 1, "nrec": 2}),
])
def test_native_matches_fallback(monkeypatch, n, L, err, kw):
    rng = np.random.default_rng(n * 1000 + L)
    seqs = _gen(rng, n, L, err)
    a = _run(seqs, kw, False, monkeypatch)
    b = _run(seqs, kw, True, monkeypatch)
    assert a == b
