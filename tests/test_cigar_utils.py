"""CIGAR utilities: left-tidy indel justification + alnstr rendering
(bsalign.h:439-610 equivalents)."""
import numpy as np

from bsalign_tpu import cigar as C
from bsalign_tpu.cigar import AlnResult
from bsalign_tpu.seqs import encode_dna


def _rs(qseq, tseq):
    rs = AlnResult()
    rs.qb = rs.tb = 0
    rs.qe = len(qseq) - 1
    rs.te = len(tseq) - 1
    return rs


def test_left_tidy_shifts_homopolymer_gap():
    # q has one extra T in a TTT run. The reference's "left tidy" pulls
    # matching BASES left into the gap (bsalign.h:456-478), so the
    # canonical indel position is the RIGHT edge of the run.
    q = encode_dna("ACGTTTTA")
    t = encode_dna("ACGTTTA")
    cigars = [(3 << 4) | 0, (1 << 4) | 1, (4 << 4) | 0]  # 3M 1I 4M
    rs = _rs(q, t)
    moved, tidied = C.left_tidy_cigars(q, t, rs, cigars)
    assert moved == 3
    ops = [(c >> 4, c & 0xF) for c in tidied]
    assert ops == [(6, 0), (1, 1), (1, 0)]               # 6M 1I 1M
    # op totals preserved
    tot = lambda cg, o: sum(c >> 4 for c in cg if (c & 0xF) == o)
    for o in (0, 1, 2):
        assert tot(cigars, o) == tot(tidied, o)


def test_left_tidy_noop_when_canonical():
    q = encode_dna("ACGTTTTA")
    t = encode_dna("ACGTTTA")
    cigars = [(6 << 4) | 0, (1 << 4) | 1, (1 << 4) | 0]
    moved, tidied = C.left_tidy_cigars(q, t, _rs(q, t), cigars)
    assert moved == 0
    assert tidied == cigars


def test_cigar2alnstr_roundtrip():
    q = encode_dna("ACGTACGTAA")
    t = encode_dna("ACGACGTGAA")
    # 3M 1I 4M 1D 2M  (q=10, t=10)
    cigars = [(3 << 4) | 0, (1 << 4) | 1, (4 << 4) | 0, (1 << 4) | 2,
              (2 << 4) | 0]
    rs = AlnResult()
    rs.qb = rs.tb = 0
    rs.qe = rs.te = 9
    rs.aln = 11
    qs, ms, ts = C.cigar2alnstr(q, t, rs, cigars, rs.aln)
    assert len(qs) == len(ms) == len(ts) == 11
    assert qs.replace("-", "") == "ACGTACGTAA"
    assert ts.replace("-", "") == "ACGACGTGAA"
    assert qs[3] != "-" and ts[3] == "-"     # the insertion column
