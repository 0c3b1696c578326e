"""Oracle engines vs the compiled reference binary: byte-exact output parity."""
import numpy as np
import pytest

from bsalign_tpu.constants import MODE_NAMES, roundup
from bsalign_tpu.oracle import banded8 as B8
from bsalign_tpu.oracle import edit as E

from .util import format_pairwise_output, gen_pair, run_ref, write_pairs_fasta


def _pairs(seed, n, length, err):
    rng = np.random.default_rng(seed)
    return [gen_pair(rng, int(length * (1 + rng.uniform(-0.2, 0.2))), err)
            for _ in range(n)]


@pytest.mark.parametrize("mode,W,scores", [
    ("global", 0, (2, 6, 3, 2, 0, 0)),
    ("global", 128, (2, 6, 3, 2, 0, 0)),
    ("overlap", 0, (2, 6, 3, 2, 0, 0)),
    ("extend", 64, (2, 6, 3, 2, 0, 0)),
    ("global", 128, (2, 6, 0, 3, 0, 0)),   # linear gap (piecewise 0)
    ("global", 128, (2, 6, 3, 2, 8, 1)),   # 2-piece gap
    ("overlap", 16, (2, 6, 3, 2, 0, 0)),   # minimal band
])
def test_align_parity(ref_bin, tmp_path, mode, W, scores):
    M, X, O, Eg, Q, P = scores
    pairs = _pairs(11, 3, 300, 0.12)
    fa = tmp_path / "pairs.fa"
    write_pairs_fasta(fa, pairs)
    ref = run_ref(ref_bin, "align", "-m", mode, "-W", W, "-M", M, "-X", X,
                  "-O", O, "-E", Eg, "-Q", Q, "-P", P, fa)
    mtx = B8.set_score_matrix(M, -X)
    mine = []
    for i, (q, t) in enumerate(pairs):
        bw = W if W > 0 else roundup(len(q), 16)
        rs, cg = B8.pairwise(q, t, MODE_NAMES[mode], bw, mtx, -O, -Eg, -Q, -P)
        if rs.mat:
            mine.append(format_pairwise_output(f"p{i}_q", f"p{i}_t", q, t, rs, cg))
    assert "".join(mine) == ref


@pytest.mark.parametrize("mode,W,k", [
    ("global", 0, 13),
    ("global", 64, 13),
    ("overlap", 0, 13),
    ("extend", 0, 13),
    ("kmer", 0, 13),
    ("kmer", 0, 11),
])
def test_edit_parity(ref_bin, tmp_path, mode, W, k):
    pairs = _pairs(13, 3, 300, 0.15)
    fa = tmp_path / "pairs.fa"
    write_pairs_fasta(fa, pairs)
    ref = run_ref(ref_bin, "edit", "-m", mode, "-W", W, "-k", k, fa)
    mine = []
    for i, (q, t) in enumerate(pairs):
        if mode == "kmer":
            rs, cg = E.kmer_edit_pairwise(k, q, t)
        else:
            rs, cg = E.edit_pairwise(q, t, MODE_NAMES[mode], W)
        if rs.mat:
            mine.append(format_pairwise_output(f"p{i}_q", f"p{i}_t", q, t, rs, cg))
    assert "".join(mine) == ref


def test_align_parity_tiny_seqs(ref_bin, tmp_path):
    pairs = _pairs(3, 6, 40, 0.25)
    fa = tmp_path / "tiny.fa"
    write_pairs_fasta(fa, pairs)
    ref = run_ref(ref_bin, "align", "-m", "overlap", "-W", 16, fa)
    mtx = B8.set_score_matrix(2, -6)
    mine = []
    for i, (q, t) in enumerate(pairs):
        rs, cg = B8.pairwise(q, t, 1, 16, mtx, -3, -2, 0, 0)
        if rs.mat:
            mine.append(format_pairwise_output(f"p{i}_q", f"p{i}_t", q, t, rs, cg))
    assert "".join(mine) == ref
