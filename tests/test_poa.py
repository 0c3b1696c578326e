"""BSPOA + cat end-to-end parity vs the reference binary."""
import subprocess
import sys

import numpy as np
import pytest

from .util import run_ref


def _gen_msa(path, n, L, err, seed, snv=False):
    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 4, L)
    bases = "ACGT"
    with open(path, "w") as f:
        for i in range(n):
            r2 = ref.copy()
            if snv and i % 2 == 1:
                r2[L // 2] = (r2[L // 2] + 2) & 3
            out = []
            j = 0
            while j < L:
                r = rng.random()
                if r < err * 0.3:
                    out.append((int(r2[j]) + rng.integers(1, 4)) & 3)
                    j += 1
                elif r < err * 0.6:
                    out.append(rng.integers(0, 4))
                elif r < err:
                    j += 1
                else:
                    out.append(int(r2[j]))
                    j += 1
            f.write(f">r{i}\n" + "".join(bases[b] for b in out) + "\n")


def _run_mine(sub, *args):
    return subprocess.run(
        [sys.executable, "-m", "bsalign_tpu.cli", sub, *map(str, args)],
        capture_output=True, text=True, check=True, cwd="/root/repo").stdout


@pytest.mark.parametrize("cfg", [
    [],
    ["-m", "global"],
    ["-M", "2", "-X", "6", "-O", "3", "-E", "2", "-Q", "8", "-P", "1"],
    ["-G", "seqcore=3"],
])
def test_poa_small_parity(ref_bin, tmp_path, cfg):
    fa = tmp_path / "msa.fa"
    _gen_msa(fa, 5, 120, 0.10, 17)
    ref = run_ref(ref_bin, "poa", *cfg, fa)
    mine = _run_mine("poa", *cfg, fa)
    assert mine == ref


def test_poa_banded_snv_parity(ref_bin, tmp_path):
    """Banded path (reads > bandwidth) + nrec window + SNV calls."""
    fa = tmp_path / "msa.fa"
    _gen_msa(fa, 12, 400, 0.10, 9, snv=True)
    ref = run_ref(ref_bin, "poa", "-G", "nrec=5", fa)
    mine = _run_mine("poa", "-G", "nrec=5", fa)
    assert mine == ref


def test_poa_noncore_mapping_parity(ref_bin, tmp_path):
    """seqcore < nseq: non-core reads map onto the core MSA."""
    fa = tmp_path / "msa.fa"
    _gen_msa(fa, 14, 300, 0.12, 23)
    ref = run_ref(ref_bin, "poa", "-G", "seqcore=8", fa)
    mine = _run_mine("poa", "-G", "seqcore=8", fa)
    assert mine == ref


def test_cat_parity(ref_bin, tmp_path):
    rng = np.random.default_rng(21)
    bases = "ACGT"
    seq = "".join(bases[b] for b in rng.integers(0, 4, 2500))
    fa = tmp_path / "pieces.fa"
    with open(fa, "w") as f:
        f.write(f">p1\n{seq[:1000]}\n>p2\n{seq[800:1800]}\n>p3\n{seq[1600:]}\n")
    ref = run_ref(ref_bin, "cat", fa)
    mine = _run_mine("cat", fa)
    assert mine == ref


def test_cat_weak_join_parity(ref_bin, tmp_path):
    rng = np.random.default_rng(4)
    bases = "ACGT"
    fa = tmp_path / "weak.fa"
    with open(fa, "w") as f:
        for i in range(3):
            s = "".join(bases[b] for b in rng.integers(0, 4, 600))
            f.write(f">w{i}\n{s}\n")
    ref = run_ref(ref_bin, "cat", fa)
    mine = _run_mine("cat", fa)
    assert mine == ref


def test_binary_msa_roundtrip(ref_bin, tmp_path):
    """Binary MSA dump/load is byte-compatible with the reference format."""
    import io
    sys.path.insert(0, "/root/repo")
    from bsalign_tpu.poa.cli import default_poa_par
    from bsalign_tpu.poa.core import BSPOA
    from bsalign_tpu import seqs as S
    fa = tmp_path / "msa.fa"
    _gen_msa(fa, 5, 100, 0.08, 31)
    g = BSPOA(default_poa_par())
    g.beg()
    for rec in S.read_fastx(str(fa)):
        if rec.seq:
            g.push(rec.seq)
    g.end()
    buf = io.BytesIO()
    g.dump_binary_msa(buf, b"meta")
    buf.seek(0)
    g2 = BSPOA(default_poa_par())
    assert g2.load_binary_msa(buf) == 0
    assert np.array_equal(g.cns, g2.cns)
    assert np.array_equal(g.qlt, g2.qlt)
    assert len(g2.seqs) == g.nrds
    for rid in range(1, g.nrds):
        assert np.array_equal(g2.seqs[rid], g.seqs[rid])
