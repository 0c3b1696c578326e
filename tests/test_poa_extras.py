def test_poa_extras():
    """BSPOA library extras: subset/clip/rdregs, LSP re-POA, DOT dumps, merge
    (SURVEY.md §2.4 rows: LSP local re-POA, MSA merge/subset/clip, debug
    artifacts)."""
    import io
    import numpy as np
    from bsalign_tpu.poa.core import BSPOA
    from bsalign_tpu.poa.cli import default_poa_par
    from bsalign_tpu.poa import extras as X
    
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    BASES = "ACGT"
    def mutate(s, err):
        out = []
        i = 0
        while i < len(s):
            r = rng.random()
            if r < err*0.3: out.append((int(s[i])+rng.integers(1,4))&3); i += 1
            elif r < err*0.6: out.append(int(rng.integers(0,4)))
            elif r < err: i += 1
            else: out.append(int(s[i])); i += 1
        return "".join(BASES[c] for c in out)
    
    par = default_poa_par()
    g = BSPOA(par)
    g.beg()
    reads = [mutate(ref, 0.12) for _ in range(10)]
    for s in reads: g.push(s)
    g.end()
    cns0 = list(g.cns)
    
    # rdregs
    rb, re_ = X.calc_msa_rdregs(g)
    assert all(0 <= a <= b <= len(g.msaidxs) for a, b in zip(rb, re_))
    cb, ce = X.calc_cns_rdregs(g)
    assert all(0 <= a <= b <= len(g.cns) for a, b in zip(cb, ce))
    
    # subset
    d = X.subset(g, [True, False, True, False, True, True, False, True, False, True])
    assert d.nrds == 6
    assert len(d.cns) > 0
    
    
    # clip (on a copy to keep g for LSP)
    import copy
    g2 = BSPOA(par); g2.beg()
    for s in reads: g2.push(s)
    g2.end()
    X.clip_reads_msa(g2, 5, 5)
    col0 = g2.msacols[g2.msaidxs[0]]
    # first non-gap cells of each read should be masked to 5 after clip
    cnt5 = sum(int((g2.msacols[g2.msaidxs[p]][:10] == 5).sum()) for p in range(len(g2.msaidxs)))
    assert cnt5 > 0, "clip masked nothing"
    
    # DOT dumps + seq dump
    buf = io.StringIO(); X.print_dot(g, buf)
    assert buf.getvalue().startswith("digraph") and "->" in buf.getvalue()
    buf = io.StringIO(); X.print_vstdot(g, buf); assert "digraph" in buf.getvalue()
    buf = io.StringIO(); X.print_local_dot(g, buf, g.g.rdnode(0, 10)); assert "digraph" in buf.getvalue()
    buf = io.StringIO(); X.print_seqs(g, buf); assert buf.getvalue().count(">S") == len(g.seqs)
    
    # LSP re-POA
    n = X.remsa_lsps(g, par)
    
    assert len(g.cns) > 250
    # MSA still consistent: reads reproduce from columns
    g.tidy_msa(); g.call_snvs()
    
    # merge two MSAs
    def build(reads):
        h = BSPOA(par); h.beg()
        for s in reads: h.push(s)
        h.end()
        mlen = len(h.msaidxs); nseq = h.nrds
        mat = np.zeros((mlen, nseq + 3), np.uint8)
        for p in range(mlen):
            mat[p] = h.msacols[h.msaidxs[p]]
        return mat, nseq
    m1 = build([mutate(ref, 0.1) for _ in range(5)])
    m2 = build([mutate(ref, 0.1) for _ in range(5)])
    dg = X.merge_msas(par, [m1, m2])
    assert dg.nrds >= 10 and len(dg.cns) > 250


def test_lsp_score_high_event_states():
    """Regression for the uint8 overflow in _cal_rd_lsp_score: with numpy
    uint8 table entries, `d = f & 0x7` stayed np.uint8, making the whole
    index `a + b*5 + c*25 + d*125` uint8 arithmetic that wraps mod 256
    whenever the running state d >= 1 pushes it past 255, silently indexing
    the wrong dptable entry (bspoa.h:5279-5298 formula). Scores must match
    a plain-Python-int walk, and the walk must hit an index > 255 where the
    wrapped table entry differs, so the old bug would have been caught."""
    import numpy as np
    from bsalign_tpu.poa.core import BSPOA
    from bsalign_tpu.poa.cli import default_poa_par
    from bsalign_tpu.poa import extras as X

    rng = np.random.default_rng(11)
    ref = rng.integers(0, 4, 240).astype(np.uint8)
    BASES = "ACGT"

    def mutate(s, err):
        out, i = [], 0
        while i < len(s):
            r = rng.random()
            if r < err * 0.25:
                out.append((int(s[i]) + int(rng.integers(1, 4))) & 3); i += 1
            elif r < err * 0.55:
                out.append(int(rng.integers(0, 4)))           # insertion
            elif r < err:
                i += 1                                        # deletion
            else:
                out.append(int(s[i])); i += 1
        return "".join(BASES[c] for c in out)

    par = default_poa_par()
    g = BSPOA(par)
    g.beg()
    for _ in range(8):
        g.push(mutate(ref, 0.18))                              # indel-rich
    g.end()

    table = [int(x) for x in np.asarray(g.dptable).ravel()]    # pure ints
    vals = [float(x) for x in np.asarray(g.dpvals).ravel()]
    nall = g.nrds if g.nseq == 0 else g.nseq
    mlen = len(g.msaidxs)
    bug_would_bite = False
    for rid in range(g.nrds):
        lsp = X.Lsp(rid, 0, 0, 0, 0, mlen)
        got = X._cal_rd_lsp_score(g, lsp)
        c, d, scr = 4, 0, 0.0
        for p in range(mlen):
            col = g.msacols[g.msaidxs[p]]
            a, b = int(col[nall]), int(col[rid])
            if b > 4 or (a >= 4 and b >= 4):
                continue
            idx = a + b * 5 + c * 25 + d * 125
            f = table[idx]
            if idx > 255 and (table[idx % 256] >> 3) != (f >> 3):
                bug_would_bite = True
            scr += vals[f >> 3]
            d = f & 0x7
            if a < 4:
                c = a
        assert got == -scr, f"rid={rid}: {got} != {-scr}"
    assert bug_would_bite, "walk never hit a wrapping index with a different entry"
    
    
    
