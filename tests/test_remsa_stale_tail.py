"""Regression test for the reference's remsa scratch-clear quirk.

remsa_pedits_bspoa clears 4*(mlen+bw) bytes of per-read homopolymer-count
scratch, but the four count planes are spaced roundup16(mlen+bw) apart
(reference bspoa.h:4348), so when mlen+bw is not a multiple of 16 the tail
of the T plane keeps the PREVIOUS read's counts and the realignment DP
reads them. Byte-exact output parity therefore requires carrying the stale
tail over identically (core._remsa_stale_start). Found by fuzz seed 31:
before the fix, the last read of this window realigned its tail insertion
differently and the consensus changed length (166 vs 167 in the failing
region).

The golden hashes pin the full POA output for the exact failing window
(fuzz_parity gen_msa seed 74); they were recorded from a run verified
byte-exact against the compiled reference binary.
"""
import hashlib

import numpy as np

from bsalign_tpu.poa.core import BSPOA, BSPOAPar, _remsa_stale_start

BASES = "ACGT"


def _gen_fuzz74():
    rng = np.random.default_rng(74)
    ref = rng.integers(0, 4, 500)
    reads = []
    for _ in range(12):
        q = []
        for b in ref:
            r = rng.random()
            if r < 0.15 * 0.3:
                q.append(int(rng.integers(0, 4)))
            elif r < 0.15 * 0.6:
                q.append(int(b))
                q.append(int(rng.integers(0, 4)))
            elif r < 0.15:
                continue
            else:
                q.append(int(b))
        reads.append("".join(BASES[b] for b in q))
    return reads


def test_stale_start_geometry():
    # multiples of 16 have no uncovered tail; otherwise the last
    # 3*(roundup16(pad) - pad) entries of the T plane stay uncleared
    assert _remsa_stale_start(640) == 640
    assert _remsa_stale_start(613) == 613 - 3 * (624 - 613)
    assert _remsa_stale_start(17) == 0      # clamped: whole plane stale


def test_fuzz74_full_poa_golden():
    reads = _gen_fuzz74()
    poa = BSPOA(BSPOAPar())
    poa.beg()
    for s in reads:
        poa.push(s)
    poa.end()
    poa.tidy_msa()
    poa.call_snvs()
    order = np.asarray(poa.msaidxs, np.int64)
    assert len(poa.cns) == 503
    assert hashlib.sha256(bytes(poa.cns)).hexdigest() == \
        "2c7051ea5d7f567f43eba2a043098366324c6dd406570098696fb454e02abc7e"
    assert hashlib.sha256(bytes(poa.qlt)).hexdigest() == \
        "b61620e12c49745bb8364c6fdc33ac8d331c2809d43295ba72d5fc743c2aff17"
    assert hashlib.sha256(poa.msacols[order].tobytes()).hexdigest() == \
        "79860123356f9287c52f5c3af8929a943c000062c17b5f30a7c7eb30716b86e9"


def test_device_jobs_carry_matches_host():
    """The device job builder must roll the stale tail across jobs exactly
    like the sequential host loop (host-computed forward used as dev_exec
    so the check runs without the Pallas kernel)."""
    from bsalign_tpu.native import rowops as NR
    if not NR.available():
        import pytest
        pytest.skip("native rowops unavailable")

    def host_exec(jobs):
        outs = []
        for j in jobs:
            rowlen = j.bw + 2
            mx0 = np.zeros((2 * j.mlen + 1) * rowlen, np.uint8)
            mx1 = np.zeros((2 * j.mlen + 1) * rowlen, np.uint8)
            NR.pedit_forward(mx0, mx1, j.seqs0, j.seqs1, j.mats0, j.mats1,
                             j.mlen, j.mbeg, j.mend, j.bw, j.HW, rowlen)
            outs.append((mx0, mx1))
        return outs

    def run(dev):
        par = BSPOAPar(realn=1)
        poa = BSPOA(par)
        poa.beg()
        for s in _gen_fuzz74():
            poa.push(s)
        assert poa.end_begin()
        poa.msa()
        poa.cns_call()
        poa.remsa_pedits(par.editbw // 2, 1, 1,
                         dev_exec=host_exec if dev else None)
        poa.restore_rd_orders()
        poa.msa()
        poa.cns_call()
        return bytes(poa.cns), bytes(poa.qlt), bytes(poa.alt)

    assert run(False) == run(True)
