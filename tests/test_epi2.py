"""epi2 full-matrix 2-bit edit engine vs an independent scalar oracle.

The oracle computes the full unit-cost H matrix directly, derives the
u-delta planes (the information the reference packs 2-bit-striped,
bsalign.h:1538-1675), and walks the epi2 backtrace decision order
(bsalign.h:1704-1795) scalar-by-scalar. The engine under test must match
its CIGARs and counts exactly, plus the driver quirks (score never
assigned -> 0; mode unused; boundary absorption for empty sequences).
"""
import numpy as np
import pytest

from bsalign_tpu.align.editdist import epi2_edit_batch, epi2_edit_pairwise


def _full_h(q, t):
    """H[y][x] = edit distance of q[:x] vs t[:y] (1-based planes)."""
    qlen, tlen = len(q), len(t)
    H = np.empty((tlen + 1, qlen + 1), np.int32)
    H[0] = np.arange(qlen + 1)
    H[:, 0] = np.arange(tlen + 1)
    for y in range(1, tlen + 1):
        for x in range(1, qlen + 1):
            s = 0 if q[x - 1] == t[y - 1] else 1
            H[y, x] = min(H[y - 1, x - 1] + s, H[y - 1, x] + 1,
                          H[y, x - 1] + 1)
    return H


def _oracle_epi2(q, t):
    """Scalar translation of striped_epi2_seqedit_backtrace semantics:
    uts[y+1][x] = H(x, y) - H(x-1, y); ins if that's +1, else del if
    uts[y][x] == -1, else (mis)match diagonal; leading runs absorbed."""
    H = _full_h(q, t)
    uts = H[:, 1:] - H[:, :-1]          # [tlen+1, qlen]
    x, y = len(q) - 1, len(t) - 1
    mat = mis = ins = dele = 0
    cigars = []

    def push(op, sz=1):
        if cigars and (cigars[-1] & 0xF) == op:
            cigars[-1] += sz << 4
        else:
            cigars.append((sz << 4) | op)

    while x >= 0 and y >= 0:
        if q[x] == t[y]:
            mat += 1
            op = 0
            x -= 1
            y -= 1
        elif uts[y + 1][x] == 1:
            ins += 1
            op = 1
            x -= 1
        elif uts[y][x] == -1:
            dele += 1
            op = 2
            y -= 1
        else:
            mis += 1
            op = 0
            x -= 1
            y -= 1
        push(op)
    if x + 1:
        push(1, x + 1)
        ins += x + 1
    if y + 1:
        push(2, y + 1)
        dele += y + 1
    return dict(mat=mat, mis=mis, ins=ins, dele=dele,
                dist=int(H[-1, -1]), cigars=cigars[::-1])


def _mutate(rng, t, err):
    q = []
    i = 0
    while i < len(t):
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
    return np.array(q, np.uint8)


@pytest.mark.parametrize("tlen,err,seed", [
    (23, 0.15, 0), (64, 0.10, 1), (97, 0.25, 2), (130, 0.05, 3),
    (40, 0.6, 4),
])
def test_epi2_matches_scalar_oracle(tlen, err, seed):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 4, tlen).astype(np.uint8)
    q = _mutate(rng, t, err)
    want = _oracle_epi2(q, t)
    rs, cigars = epi2_edit_pairwise(q, t)
    assert cigars == want["cigars"]
    assert (rs.mat, rs.mis, rs.ins, rs.dele) == \
        (want["mat"], want["mis"], want["ins"], want["dele"])
    assert rs.mis + rs.ins + rs.dele == want["dist"]
    assert rs.score == 0            # ZEROS(&rs), never assigned (:1708)
    assert (rs.qb, rs.qe, rs.tb, rs.te) == (0, len(q), 0, len(t))
    assert rs.aln == rs.mat + rs.mis + rs.ins + rs.dele


def test_epi2_batch_mixed_sizes():
    rng = np.random.default_rng(7)
    pairs = []
    for tlen in (15, 33, 70, 128, 200):
        t = rng.integers(0, 4, tlen).astype(np.uint8)
        pairs.append((_mutate(rng, t, 0.2), t))
    res = epi2_edit_batch([p[0] for p in pairs], [p[1] for p in pairs])
    for (q, t), (rs, cigars) in zip(pairs, res):
        want = _oracle_epi2(q, t)
        assert cigars == want["cigars"]
        assert rs.mis + rs.ins + rs.dele == want["dist"]
        assert rs.score == 0


def test_epi2_empty_boundary_absorption():
    q = np.array([1, 2, 3], np.uint8)
    t = np.array([], np.uint8)
    rs, cigars = epi2_edit_pairwise(q, t)
    assert cigars == [(3 << 4) | 1] and rs.ins == 3 and rs.aln == 3
    assert (rs.qe, rs.te) == (3, 0)
    rs, cigars = epi2_edit_pairwise(t, q)
    assert cigars == [(3 << 4) | 2] and rs.dele == 3 and rs.aln == 3
    assert (rs.qe, rs.te) == (0, 3)
    rs, cigars = epi2_edit_pairwise(t, t)
    assert cigars == [] and rs.aln == 0 and rs.score == 0


def test_epi2_identical_sequences():
    q = np.array([0, 1, 2, 3] * 20, np.uint8)
    rs, cigars = epi2_edit_pairwise(q, q.copy())
    assert rs.mat == 80 and rs.mis == rs.ins == rs.dele == 0
    assert cigars == [(80 << 4) | 0]
