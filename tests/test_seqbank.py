"""2-bit BaseBank / PackedSeqBank / kmer utils (SURVEY.md §2.2, dna.h)."""
import numpy as np

from bsalign_tpu import seqs as S
from bsalign_tpu.utils import objstore


def test_basebank_pack_fetch_revcomp():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 4, 777).astype(np.uint8)
    b = rng.integers(0, 4, 100).astype(np.uint8)
    bb = S.BaseBank()
    bb.push_codes(a)
    bb.push_codes(b, rev=True)
    assert len(bb) == 877
    assert np.array_equal(bb.get(0, 777), a)
    assert np.array_equal(bb.get(777, 100), 3 - b[::-1])
    assert np.array_equal(bb.get(0, 777, rev=True), 3 - a[::-1])
    # odd offsets crossing word boundaries
    assert np.array_equal(bb.get(31, 66), a[31:97])


def test_packed_seqbank_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    a = rng.integers(0, 4, 513).astype(np.uint8)
    pb = S.PackedSeqBank()
    pb.push("r1", "ACGTACGT")
    pb.push("r2", a)
    assert pb.rid_of("r2") == 1
    assert np.array_equal(pb.get(1), a)
    path = str(tmp_path / "sb.obj")
    objstore.dump_obj_file(pb.dump(), path)
    pb2 = S.PackedSeqBank.load(objstore.load_obj_file(path))
    assert pb2.tags == ["r1", "r2"]
    assert np.array_equal(pb2.get(1), a)
    assert np.array_equal(pb2.get(0), S.encode_dna("ACGTACGT"))


def test_kmer_utils():
    km = S.seq2kmers(S.encode_dna("ACGTAC"), 3)
    assert list(km) == [6, 27, 44, 49]
    assert S.kmer_revcomp(6, 3) == 27
    canon = S.canonical_kmers(S.encode_dna("ACGTAC"), 3)
    assert list(canon) == [6, 6, 44, 44]  # min(kmer, revcomp)
