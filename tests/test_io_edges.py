"""I/O edge cases: truncated pgzf streams, writer-thread error
propagation, multi-block roundtrips with random read/seek patterns
(hardening beyond the happy-path coverage in test_io_utils)."""
import gzip
import io
import os

import numpy as np
import pytest

from bsalign_tpu.io.filewriter import BufferedWriter
from bsalign_tpu.io.pgzf import PgzfReader, PgzfWriter, open_pgzf


def _write_pgzf(path, payload, bufsize):
    with PgzfWriter(path, bufsize=bufsize, ncpu=2) as w:
        w.write(payload)


def test_pgzf_multiblock_roundtrip_and_seek(tmp_path):
    rng = np.random.default_rng(0)
    payload = rng.integers(32, 127, 3 * 65536 + 777).astype(np.uint8) \
        .tobytes()
    p = tmp_path / "m.pgz"
    _write_pgzf(str(p), payload, bufsize=65536)
    with PgzfReader(str(p)) as r:
        assert r.read() == payload
    # block-granular random access
    with PgzfReader(str(p)) as r:
        r.seek_block(2)
        assert r.read(100) == payload[2 * 65536:2 * 65536 + 100]
        r.seek_block(0)
        assert r.read(10) == payload[:10]


def test_pgzf_truncated_stream_fails_cleanly(tmp_path):
    payload = b"x" * (2 * 65536)
    p = tmp_path / "t.pgz"
    _write_pgzf(str(p), payload, bufsize=65536)
    data = open(p, "rb").read()
    for cut in (len(data) // 3, len(data) - 7):
        q = tmp_path / f"cut{cut}.pgz"
        open(q, "wb").write(data[:cut])
        with pytest.raises(Exception):
            with PgzfReader(str(q)) as r:
                got = r.read()
                # a short read without an exception would silently drop
                # data — treat that as a failure too
                if got != payload:
                    raise EOFError("truncated pgzf returned partial data")


def test_pgzf_reads_plain_gzip(tmp_path):
    p = tmp_path / "plain.gz"
    with gzip.open(p, "wb") as f:
        f.write(b"hello bsalign" * 1000)
    with open_pgzf(str(p)) as r:
        assert r.read() == b"hello bsalign" * 1000


def test_buffered_writer_propagates_write_errors(tmp_path):
    class Boom(io.RawIOBase):
        def writable(self):
            return True

        def write(self, data):
            raise OSError("disk full")

    w = BufferedWriter(Boom())
    with pytest.raises(OSError):
        # the writer thread fails asynchronously; either a later write or
        # close must surface the error
        for _ in range(1000):
            w.write(b"x" * 1024)
        w.close()


def test_buffered_writer_orders_chunks(tmp_path):
    p = tmp_path / "ord.txt"
    with BufferedWriter(str(p)) as w:
        for i in range(500):
            w.write(f"{i}\n")
    lines = open(p).read().splitlines()
    assert lines == [str(i) for i in range(500)]
