"""Regression tests for reference-CLI quirks found by parameter fuzzing
(tools/fuzz_params.py), each verified byte-exact against the compiled
reference binary when the goldens were recorded.

1. ksz=0 kmer shuffle: `MAX_U4 >> ((16-ksz)<<1)` shifts a u4i by 32 —
   x86 masks that to a shift by 0 — and the ramp-up skip never fires, so
   ksz=0 behaves as a rolling 16-mer that also emits the first 15
   prefix kmers (bspoa.h:1016-1034). Changes the read insertion order.
2. editbw<0 (remsa_edits): reachable from the CLI because the POSIX ERE
   `([.0-9]+?)` value group can match EMPTY and atoi reads "-64" past
   the match (main.c:414,462). The realignment then merges base b into
   rail b-1 (bspoa.h:4514 lacks remsa_pedits' +1) — including base A
   into the cns-read chain. Outside refmode the reference aborts on the
   resulting graph; in refmode it completes and prints.
3. The -G/-T parsers: ordered case-insensitive PREFIX name dispatch,
   C atoi/atof value parsing from after '=', error exit on unknown
   names, and -T falling through into -L (single-line MSA output).
"""
import hashlib

import numpy as np
import pytest

from bsalign_tpu.poa.cli import _c_atof, _c_atoi, _iter_kv
from bsalign_tpu.poa.core import BSPOA, BSPOAPar


def _gen(seed, n, L, err):
    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 4, L)
    reads = []
    for _ in range(n):
        q = []
        for b in ref:
            r = rng.random()
            if r < err * 0.3:
                q.append(int(rng.integers(0, 4)))
            elif r < err * 0.6:
                q.append(int(b))
                q.append(int(rng.integers(0, 4)))
            elif r < err:
                continue
            else:
                q.append(int(b))
        reads.append(np.array(q, np.uint8))
    return reads


def _digest(reads, **kw):
    poa = BSPOA(BSPOAPar(**kw))
    poa.beg()
    for r in reads:
        poa.push(r)
    poa.end()
    poa.tidy_msa()
    poa.call_snvs()
    order = np.asarray(poa.msaidxs, np.int64)
    h = hashlib.sha256()
    h.update(bytes(poa.cns))
    h.update(bytes(poa.qlt))
    h.update(poa.msacols[order].tobytes())
    return h.hexdigest(), len(poa.cns)


def test_ksz0_shuffle_golden():
    assert _digest(_gen(3, 6, 240, 0.15), ksz=0) == \
        ("d08fdbc8d9b372336079c159738b65db0c1c8726ca3c3a4bc95813e064f54971",
         245)


def test_editbw_negative_refmode_golden():
    assert _digest(_gen(4, 5, 200, 0.12), refmode=1, editbw=-64, realn=1,
                   M=4, X=-5, O=-4, E=-2, Q=-11, P=-1) == \
        ("1938b56668c547b882ff15648605bc7acc2d436d3d0df5c47d9851bffcd4007b",
         200)


def test_iter_kv_reference_semantics():
    # negative value through the digits-only pattern
    assert [(t, _c_atoi(raw)) for t, raw in _iter_kv("editbw=-64")] == \
        [("editbw", -64)]
    # multi-token scan resumes after the 0/1-char value match
    assert [(t, _c_atoi(raw)) for t, raw in _iter_kv("editbw=-64,kmer=0")] \
        == [("editbw", -64), ("kmer", 0)]
    # multi-digit values: group matches one char, atoi reads the rest
    assert [(t, _c_atoi(raw)) for t, raw in _iter_kv("realn=12")] == \
        [("realn", 12)]
    # C float parsing incl. bare-dot values
    vals = [(t, _c_atof(raw)) for t, raw in _iter_kv("covfrq=.25")]
    assert vals == [("covfrq", 0.25)]
    # atoi of a float string truncates; atoi of garbage is 0
    assert _c_atoi("3.5xyz") == 3
    assert _c_atoi("xyz") == 0
    assert _c_atof("xyz") == 0.0


def test_cli_g_prefix_dispatch_and_unknown(capsys, tmp_path):
    from bsalign_tpu.poa import cli as PC
    fa = tmp_path / "t.fa"
    fa.write_text(">a\nACGTACGTAC\n>b\nACGTACGTAC\n")
    # unknown -G name exits with status 1 like main.c:471-474
    rc = PC.run_poa(["-G", "bogus=1", str(fa)])
    assert rc == 1
    assert "Unknown parameter" in capsys.readouterr().err
    # prefix dispatch: "km=9" hits "kmer" (first prefix match in order)
    rc = PC.run_poa(["-G", "km=9", str(fa)])
    assert rc in (0, None)
