"""Parity: the Pallas pedit profile-DP kernel vs the native forward.

The native bsa_pedit_forward is itself diff-tested against the Python
oracle and byte-exact vs the reference binary through the poa CLI fuzz;
equality here closes the chain for the device path (SURVEY.md §2.4
remsa_pedits row, bspoa.h:3856-3896)."""
import numpy as np
import pytest

from bsalign_tpu.native import rowops as NR
from bsalign_tpu.ops.pedit_pallas import PeditJob, pedit_forward_batch


def _mk_job(rng, mlen, bw):
    HW = bw // 2
    pad = mlen + bw
    seqs0 = np.full(pad, 4, np.uint8)
    seqs1 = np.zeros(pad, np.uint8)
    npos = rng.integers(mlen // 2, mlen)
    pos = np.sort(rng.choice(mlen, npos, replace=False))
    seqs0[HW + pos] = rng.integers(0, 4, npos)
    seqs1[HW:HW + mlen] = rng.integers(0, 5, mlen)
    mats0 = np.zeros((4, pad), np.uint8)
    mats1 = np.zeros((4, pad), np.uint8)
    mats0[:, HW:HW + mlen] = rng.integers(0, 6, (4, mlen))
    mats1[:, HW:HW + mlen] = rng.integers(0, 20, (4, mlen))
    mbeg = int(rng.integers(0, mlen // 4))
    mend = int(rng.integers(mbeg + 2, mlen + 1))
    return PeditJob(seqs0, seqs1, mats0, mats1, mlen, mbeg, mend, bw, HW)


@pytest.mark.parametrize("bw", [64, 96])
def test_pedit_kernel_vs_native(bw):
    if not NR.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    jobs = [_mk_job(rng, int(rng.integers(20, 250)), bw) for _ in range(6)]
    outs = pedit_forward_batch(jobs, Rs=16, interpret=True)
    for j, (m0, m1) in zip(jobs, outs):
        rowlen = j.bw + 2
        ndiag = 2 * j.mlen + 2
        n0 = np.zeros(ndiag * rowlen, np.uint8)
        n1 = np.zeros(ndiag * rowlen, np.uint8)
        NR.rowops_lib().bsa_pedit_forward(
            n0.ctypes.data, n1.ctypes.data, j.seqs0.ctypes.data,
            j.seqs1.ctypes.data, j.mats0.ctypes.data, j.mats1.ctypes.data,
            j.mlen, j.mbeg, j.mend, j.bw, j.HW, rowlen, len(j.seqs0))
        base = 2 * j.mbeg * rowlen
        n = 2 * (j.mend - j.mbeg) * rowlen
        assert np.array_equal(m0[base:base + n], n0[base:base + n])
        assert np.array_equal(m1[base:base + n], n1[base:base + n])


def test_poa_device_pedit_end_to_end(monkeypatch):
    """Full poa window with the device-batched remsa path must reproduce
    the host path byte for byte (MSA + cns + qualities)."""
    if not NR.available():
        pytest.skip("native lib unavailable")
    from bsalign_tpu.poa.cli import default_poa_par
    from bsalign_tpu.poa.core import BSPOA

    rng = np.random.default_rng(9)
    ref = rng.integers(0, 4, 280).astype(np.uint8)
    BASES = "ACGT"

    def mutate(err):
        out, i = [], 0
        while i < len(ref):
            r = rng.random()
            if r < err * 0.3:
                out.append((int(ref[i]) + int(rng.integers(1, 4))) & 3)
                i += 1
            elif r < err * 0.6:
                out.append(int(rng.integers(0, 4)))
            elif r < err:
                i += 1
            else:
                out.append(int(ref[i]))
                i += 1
        return "".join(BASES[c] for c in out)

    reads = [mutate(0.13) for _ in range(8)]

    def run():
        g = BSPOA(default_poa_par())
        g.beg()
        for s in reads:
            g.push(s)
        g.end()
        mat = np.stack([g.msacols[g.msaidxs[p]]
                        for p in range(len(g.msaidxs))])
        return mat, bytes(g.cns), bytes(g.qlt), bytes(g.alt)

    monkeypatch.setenv("BSA_PEDIT_DEVICE", "0")
    host = run()
    monkeypatch.setenv("BSA_PEDIT_DEVICE", "1")
    dev = run()
    assert np.array_equal(host[0], dev[0])
    assert host[1:] == dev[1:]
