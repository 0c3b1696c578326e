def test_io_and_utils(tmp_path):
    """I/O layer (pgzf/filereader/filewriter) + L1 utils (objstore, bitvec,
    sort) — SURVEY.md §2.1/§2.2 coverage."""
    import gzip
    import numpy as np
    from bsalign_tpu.io.pgzf import PgzfWriter, PgzfReader, open_pgzf
    from bsalign_tpu.io.filereader import FileReader, sniff
    from bsalign_tpu.io.filewriter import BufferedWriter
    from bsalign_tpu.utils import objstore, bitvec, sort as usort
    
    # pgzf roundtrip, multi-block
    rng = np.random.default_rng(0)
    data = rng.integers(65, 91, 3_000_000).astype(np.uint8).tobytes()
    w = PgzfWriter(str(tmp_path / "t.pgz"), bufsize=1<<18, ncpu=3)
    for i in range(0, len(data), 70001):
        w.write(data[i:i+70001])
    w.close()
    r = PgzfReader(str(tmp_path / "t.pgz"), ncpu=3)
    assert r.kind == "pgzf" and r.xsize == len(data), (r.kind, r.xsize)
    got = r.read()
    assert got == data, "pgzf roundtrip"
    r.close()
    # gzip CLI can read it (valid multi-member gzip)
    assert gzip.open(str(tmp_path / "t.pgz")).read() == data, "gzip interop"
    # plain gz read
    with gzip.open(str(tmp_path / "t2.gz"), "wb") as f: f.write(data[:100000])
    r = PgzfReader(str(tmp_path / "t2.gz"))
    assert r.kind == "gz" and r.read() == data[:100000], "gz read"
    # random access
    r = PgzfReader(str(tmp_path / "t.pgz"))
    r.seek_block(2)
    blk = r.read(1 << 18)
    assert blk == data[2*(1<<18):3*(1<<18)], "seek_block"
    # FileReader lines + sniff
    with BufferedWriter(str(tmp_path / "t3.gz")) as bw:
        for i in range(1000): bw.write(f"line{i}\tx{i}\n")
    assert sniff(str(tmp_path / "t3.gz")) == "pgzf"
    lines = list(FileReader(str(tmp_path / "t3.gz")))
    assert len(lines) == 1000 and lines[7] == "line7\tx7"
    tabs = list(FileReader(str(tmp_path / "t3.gz")).tabs())
    assert tabs[13] == ["line13", "x13"]
    # objstore
    obj = {"a": np.arange(100, dtype=np.int32), "b": np.ones((3,4)), "tag": "x", "blob": b"hello"}
    objstore.dump_obj_file(obj, str(tmp_path / "t.obj"))
    back = objstore.load_obj_file(str(tmp_path / "t.obj"))
    assert np.array_equal(back["a"], obj["a"]) and back["tag"] == "x" and back["blob"] == b"hello"
    objstore.share_obj("demo", obj)
    att = objstore.attach_obj("demo")
    assert att and np.array_equal(att["b"], obj["b"])
    objstore.unshare_obj("demo")
    # bitvec
    bv = bitvec.BitVec(1000)
    idx = sorted(rng.choice(1000, 87, replace=False))
    for i in idx: bv.one(int(i))
    bv.index()
    assert bv.rank1(500) == sum(1 for i in idx if i < 500)
    assert bv.select1(10) == idx[10]
    assert bv.count_ones() == 87
    # sort
    a = rng.integers(0, 1<<30, 200000)
    assert np.array_equal(usort.psort_array(a, 4), np.sort(a))
    assert usort.quick_median_array([5,1,9,3,7]) == sorted([5,1,9,3,7])[2]
    
    
