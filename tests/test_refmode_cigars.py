"""refmode with caller-supplied CIGARs (bspoa.h:2053-2087 band placement).

The reference CLI cannot express this path (cigars enter via
push_bspoacore only), so parity ground truth comes from a small C driver
(tools/refmode_cgs_test.c) compiled against the reference headers: it
pushes a backbone + reads with edit-alignment CIGARs and prints the
final MSA + SNVs. Our library must reproduce it byte for byte."""
import io
import os
import subprocess

import numpy as np
import pytest

REF_SRC = "/root/reference"
BUILD = "/root/build/reference"
DRIVER = os.path.join(BUILD, "refmode_cgs_test")
DRIVER_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "refmode_cgs_test.c")


def _build_driver():
    if os.path.exists(DRIVER):
        return True
    if not os.path.isdir(REF_SRC):
        return False
    os.makedirs(BUILD, exist_ok=True)
    subprocess.run(f"cp -rn {REF_SRC}/* {BUILD}/", shell=True, check=False)
    r = subprocess.run(
        ["gcc", "-O2", "-D_FILE_OFFSET_BITS=64", "-D_GNU_SOURCE",
         "-mpopcnt", "-msse4.2", "-o", DRIVER, DRIVER_SRC,
         "-lm", "-lpthread", "-lz"],
        cwd=BUILD, capture_output=True)
    return r.returncode == 0


def test_refmode_cigars_parity(tmp_path):
    if not _build_driver():
        pytest.skip("reference headers/compiler unavailable")
    rng = np.random.default_rng(23)
    BASES = "ACGT"
    ref = rng.integers(0, 4, 350)
    fa = tmp_path / "in.fa"
    with open(fa, "w") as f:
        f.write(">REF\n" + "".join(BASES[b] for b in ref) + "\n")
        for i in range(7):
            out, j = [], 0
            while j < len(ref):
                r = rng.random()
                if r < 0.036:
                    out.append((int(ref[j]) + int(rng.integers(1, 4))) & 3)
                    j += 1
                elif r < 0.072:
                    out.append(int(rng.integers(0, 4)))
                elif r < 0.12:
                    j += 1
                else:
                    out.append(int(ref[j]))
                    j += 1
            f.write(f">R{i}\n" + "".join(BASES[b] for b in out) + "\n")

    want = subprocess.run([DRIVER, str(fa)], capture_output=True,
                          text=True, check=True).stdout

    from bsalign_tpu.constants import MODE_GLOBAL
    from bsalign_tpu.oracle import edit as OE
    from bsalign_tpu.poa.cli import default_poa_par
    from bsalign_tpu.poa.core import BSPOA
    from bsalign_tpu.seqs import read_fastx

    par = default_poa_par()
    par.refmode = 1
    g = BSPOA(par)
    g.beg()
    recs = list(read_fastx(str(fa)))
    g.push_codes(recs[0].codes)
    for rec in recs[1:]:
        _, cg = OE.edit_pairwise(rec.codes, recs[0].codes, MODE_GLOBAL, 0)
        g.push_codes(rec.codes, cg)
    g.end()
    g.tidy_msa()
    g.call_snvs()
    buf = io.StringIO()
    g.print_msa("TEST", buf, 100, 0)
    g.print_snvs("TEST", buf)
    assert buf.getvalue() == want
