"""The native incremental end_begin loop (bsa_end_begin_loop,
rowops.cpp) must leave the BSPOA in a byte-identical state to the staged
Python loop (msa + simple_cns + align_rd per read): same consensus,
qualities, MSA matrix, and SNV calls. Exercises the resume contract too:
ksz=0 windows bounce every read back to the Python align path (flag 1),
and a tiny initial edge capacity forces headroom returns (flag 0).
Broader configs are fuzz-covered against the reference binary
(tools/fuzz_parity.py).
"""
import os

import numpy as np
import pytest

from bsalign_tpu.poa.core import BSPOA, BSPOAPar


def _gen_window(rng, n, L, err):
    t = rng.integers(0, 4, L).astype(np.uint8)
    reads = []
    for _ in range(n):
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
        reads.append(np.array(q, np.uint8))
    return reads


def _run(reads, flag, **kw):
    os.environ["BSA_POA_NATIVE_LOOP"] = flag
    try:
        poa = BSPOA(BSPOAPar(**kw))
        poa.beg()
        for r in reads:
            poa.push(r)
        poa.end()
        poa.tidy_msa()
        poa.call_snvs()
        order = np.asarray(poa.msaidxs, np.int64)
        return (bytes(poa.cns), bytes(poa.qlt), bytes(poa.alt),
                poa.msacols[order].tobytes(),
                tuple(sorted(map(str, poa.var))))
    finally:
        os.environ.pop("BSA_POA_NATIVE_LOOP", None)


@pytest.mark.parametrize("cfg", [
    dict(n=10, L=300, err=0.12),                      # default params
    dict(n=6, L=200, err=0.2, kw=dict(nrec=3)),       # recent-read window
    dict(n=5, L=150, err=0.1, kw=dict(ksz=0)),        # python-path reads
    dict(n=6, L=180, err=0.15, kw=dict(bwtrigger=0)),  # no running cns
    dict(n=4, L=120, err=0.1, kw=dict(realn=2, editbw=-32)),
    dict(n=2, L=60, err=0.1),                          # minimal pair
])
def test_native_loop_matches_python(cfg):
    rng = np.random.default_rng(17)
    reads = _gen_window(rng, cfg["n"], cfg["L"], cfg["err"])
    kw = cfg.get("kw", {})
    assert _run(reads, "1", **kw) == _run(reads, "0", **kw)


def test_native_loop_resumes_on_edge_headroom():
    """Start the graph with a deliberately tiny edge capacity so the C
    loop's per-read headroom check fires and the Python wrapper must
    encap + resume mid-window."""
    rng = np.random.default_rng(23)
    reads = _gen_window(rng, 8, 250, 0.15)
    os.environ["BSA_POA_NATIVE_LOOP"] = "1"
    try:
        poa = BSPOA(BSPOAPar())
        poa.beg()
        for r in reads:
            poa.push(r)
        # shrink edge arrays to near-occupancy before end() runs
        g = poa.g
        import bsalign_tpu.poa.graph as G
        keep = int(g._estate[0]) + 8
        g._ed = [G._grow(a[:keep], keep) for a in g._ed]
        g._estate[2] = keep
        g._ecyc = G._grow(g._ecyc[: keep // 2], keep // 2)
        g._gargs = None
        poa.end()
        native = bytes(poa.cns)
    finally:
        os.environ.pop("BSA_POA_NATIVE_LOOP", None)
    ref = _run(reads, "0")[0]
    assert native == ref
