"""Large POA window (45 reads x 1kb): exercises the seqcore non-core read
mapping path (bspoa.h:4351-4427) — byte-exact vs the reference binary."""
import io
import subprocess

import numpy as np
import pytest

from bsalign_tpu.poa.cli import run_poa


def test_45_read_window_matches_reference(tmp_path, ref_bin):
    rng = np.random.default_rng(123)
    ref = rng.integers(0, 4, 600)
    bases = "ACGT"
    fa = tmp_path / "big.fa"
    with open(fa, "w") as f:
        for i in range(45):
            q = []
            for b in ref:
                r = rng.random()
                if r < 0.03:
                    q.append(int(rng.integers(0, 4)))
                elif r < 0.06:
                    q.append(int(b))
                    q.append(int(rng.integers(0, 4)))
                elif r < 0.11:
                    continue
                else:
                    q.append(int(b))
            f.write(f">r{i}\n" + "".join(bases[c] for c in q) + "\n")
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_poa([str(fa)])
    ref_out = subprocess.run([ref_bin, "poa", str(fa)], capture_output=True,
                             text=True).stdout
    assert buf.getvalue() == ref_out
