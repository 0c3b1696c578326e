"""Multi-host helpers: process sharding math and single-process gather
semantics (the 2-process loopback path is exercised out-of-band — a
coordinator cannot be spun up inside one pytest process)."""
import numpy as np

from bsalign_tpu.parallel import dist


def test_process_shard_single():
    sel = dist.process_shard(10)
    assert list(sel) == list(range(10))


def test_gather_blobs_single_process():
    blobs = [b"alpha", b"", b"gamma" * 100]
    out = dist.gather_blobs(blobs)
    assert out == [blobs]


def test_distribute_texts_single_process():
    texts = ["a\n", "", "ccc\n"]
    full = dist.distribute_texts(3, texts)
    assert full == texts


def test_shard_split_covers_all():
    # contiguous per-process split must partition [0, n) exactly
    for n in (0, 1, 7, 64):
        for pcnt in (1, 2, 3, 8):
            per = -(-n // pcnt) if n else 0
            seen = []
            for pid in range(pcnt):
                lo = min(pid * per, n)
                hi = min(lo + per, n)
                seen.extend(range(lo, hi))
            assert seen == list(range(n))
