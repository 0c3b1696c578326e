"""ctypes wrappers exposing librowops to the POA engine.

Each call replaces ~100 tiny NumPy ops in the oracle row primitives with one
native invocation (same bit-exact semantics; see rowops.cpp). Falls back to
None when the library is unavailable — callers keep the NumPy path.
"""
from __future__ import annotations

import ctypes

import numpy as np

from ..oracle.banded8 import WS, RowState
from . import rowops_lib



RH_GIVEN = 0
RH_UBEGS0 = 1      # rh = shifted.ubegs[0] (POA per-node row chain)
RH_PRE_GETSCORE = 2  # rh = getscore(prev, rh_val) before the band shift


def _p8(a):
    return a.ctypes.data if a is not None else None


def _p64(a):
    return a.ctypes.data


def available() -> bool:
    return rowops_lib() is not None


def row_update(prev: RowState, W: int, movx: int, piecewise: int,
               qprof: np.ndarray, rbeg: int, base: int, nt_max: int,
               nt_min: int, gapo1: int, gape1: int, gapo2: int, gape2: int,
               rh_mode: int, rh_val: int) -> RowState:
    """Fused row_movx + row_cal into a fresh RowState (bit-exact vs the
    oracle pair of calls)."""
    lib = rowops_lib()
    cur = RowState(W, piecewise)
    lib.bsa8_row_update(
        _p8(prev.us), _p8(prev.es), _p8(prev.qs), _p64(prev.ubegs),
        _p8(cur.us), _p8(cur.es), _p8(cur.qs), _p64(cur.ubegs),
        _p8(qprof), rbeg, base, W, movx, piecewise, nt_max, nt_min,
        gapo1, gape1, gapo2, gape2, rh_mode, rh_val)
    return cur


def row_merge(st0: RowState, st1: RowState, W: int,
              piecewise: int) -> RowState:
    lib = rowops_lib()
    out = RowState(W, piecewise)
    lib.bsa8_row_merge(
        _p8(st0.us), _p8(st0.es), _p8(st0.qs), _p64(st0.ubegs),
        _p8(st1.us), _p8(st1.es), _p8(st1.qs), _p64(st1.ubegs),
        _p8(out.us), _p8(out.es), _p8(out.qs), _p64(out.ubegs),
        W, piecewise)
    return out


def getscore(st: RowState, W: int, pos: int) -> int:
    lib = rowops_lib()
    return int(lib.bsa8_getscore(_p8(st.us), _p64(st.ubegs), W, pos))


def _pu8(a):
    return a.ctypes.data


def pedit_forward(matrix0, matrix1, seqs0, seqs1, mats0, mats1, mlen, mbeg,
                  mend, bw, HW, rowlen) -> None:
    """Native anti-diagonal forward pass of the remsa pedit DP (fills the
    matrix diagonals in place; traceback stays in Python)."""
    lib = rowops_lib()
    lib.bsa_pedit_forward(_pu8(matrix0), _pu8(matrix1), _pu8(seqs0),
                          _pu8(seqs1), _pu8(mats0), _pu8(mats1), mlen, mbeg,
                          mend, bw, HW, rowlen, mats0.shape[1])


def cns_forward(colmat, nseq, dptable, dpvals, min_freq):
    """Native HMM-consensus forward scan; returns (sc, btm, lbm)."""
    import numpy as _np
    lib = rowops_lib()
    mlen, mrow = colmat.shape
    sc = _np.zeros((5, mlen + 1, 6), _np.float64)
    btm = _np.zeros((5, mlen + 1), _np.uint8)
    lbm = _np.zeros((5, mlen + 1), _np.uint8)
    lib.bsa_cns_forward(colmat.ctypes.data, mlen, mrow, nseq,
                        dptable.ctypes.data, dpvals.ctypes.data,
                        float(min_freq), sc.ctypes.data, btm.ctypes.data,
                        lbm.ctypes.data)
    return sc, btm, lbm


def edit_row(u_prev, match, v_in):
    """Native edit delta-row transition (oracle/edit._row_trans)."""
    import numpy as _np
    lib = rowops_lib()
    u_new = _np.empty(len(u_prev), _np.int8)
    lib.bsa_edit_row(u_prev.ctypes.data, match.ctypes.data, len(u_prev),
                     int(v_in), u_new.ctypes.data)
    return u_new


def backcal(qseq, tseq, init_row, us_p, es_p, qs_p, ub_p, begs_p, b,
            is_overlap, bandwidth, mtx, gapo1, gape1, gapo2, gape2,
            piecewise, rs):
    """Native backcal traceback over batch-strided plane arrays; mutates
    `rs` (AlnResult) and returns the packed CIGAR list."""
    import numpy as _np
    lib = rowops_lib()
    T, BW, B = us_p.shape
    ubr = ub_p.shape[1]
    init_ub = _np.ascontiguousarray(init_row.ubegs, _np.int64)
    stats = _np.zeros(10, _np.int64)
    stats[0] = rs.score
    stats[2] = rs.qe
    stats[4] = rs.te
    cg_cap = int(qseq.size + tseq.size + 8)
    cg = _np.zeros(cg_cap, _np.uint32)
    qc = _np.ascontiguousarray(qseq, _np.uint8)
    tc = _np.ascontiguousarray(tseq, _np.uint8)
    n = lib.bsa8_backcal(
        qc.ctypes.data, len(qc), tc.ctypes.data, len(tc),
        init_row.us.ctypes.data, init_ub.ctypes.data,
        us_p.ctypes.data,
        es_p.ctypes.data if es_p is not None else None,
        qs_p.ctypes.data if qs_p is not None else None,
        ub_p.ctypes.data, ubr, begs_p.ctypes.data,
        B, b, int(is_overlap), bandwidth, mtx.ctypes.data,
        gapo1, gape1, gapo2, gape2, piecewise,
        stats.ctypes.data, cg.ctypes.data, cg_cap)
    assert n <= cg_cap, "cigar overflow"
    (rs.score, rs.qb, rs.qe, rs.tb, rs.te, rs.mat, rs.mis, rs.ins,
     rs.dele, rs.aln) = (int(x) for x in stats)
    return [int(x) for x in cg[:n]]


def decode_codes(qseq, tseq, codes_w, begs_p, init_eo, b, is_overlap,
                 bandwidth, rs):
    """Native walk of the device kernel's packed 4-bit traceback codes
    (codes_w [T, CPW, WS, B] int32, batch-strided); mutates `rs`
    (AlnResult) and returns the packed CIGAR list."""
    import numpy as _np
    lib = rowops_lib()
    T, CPW, _, B = codes_w.shape
    stats = _np.zeros(10, _np.int64)
    stats[0] = rs.score
    stats[2] = rs.qe
    stats[4] = rs.te
    cg_cap = int(qseq.size + tseq.size + 8)
    cg = _np.zeros(cg_cap, _np.uint32)
    qc = _np.ascontiguousarray(qseq, _np.uint8)
    tc = _np.ascontiguousarray(tseq, _np.uint8)
    eo = _np.ascontiguousarray(init_eo, _np.uint8)
    n = lib.bsa_decode_codes(
        qc.ctypes.data, tc.ctypes.data, codes_w.ctypes.data, CPW,
        begs_p.ctypes.data, eo.ctypes.data, B, b, int(is_overlap),
        bandwidth, stats.ctypes.data, cg.ctypes.data, cg_cap)
    assert n <= cg_cap, "cigar overflow"
    (rs.score, rs.qb, rs.qe, rs.tb, rs.te, rs.mat, rs.mis, rs.ins,
     rs.dele, rs.aln) = (int(x) for x in stats)
    return [int(x) for x in cg[:n]]


WK_NST = 12        # per-pair walk-state slots (rowops.cpp WK_* enum)
WK_QB, WK_TB, WK_PM, WK_DJ, WK_CG, WK_NCG = range(6)
WK_MAT, WK_MIS, WK_INS, WK_DEL, WK_ALN, WK_DONE = range(6, 12)
WK_NOJ = -(1 << 60)


def walk_init(qe, te):
    """Fresh walk-state array for the chunked codes walker: one row per
    pair, started at (qe, te) like bsa_decode_codes' entry point."""
    import numpy as _np
    B = len(qe)
    st = _np.zeros((B, WK_NST), _np.int64)
    st[:, WK_QB] = qe
    st[:, WK_TB] = te
    st[:, WK_DJ] = WK_NOJ
    return st


def walk_codes_chunk(qflat, qoffs, tflat, toffs, codes_c, begs_c, beg_prev,
                     init_eo, t0, t1, is_overlap, bandwidth, st, cg_out):
    """Advance all pairs' tracebacks through band rows [t0, t1) of one
    re-forwarded chunk (codes_c [t1-t0(+pad), CPW, WS, B] int32 packed
    codes). Mutates st in place; completed CIGAR words for this call land
    in cg_out[b, :st[b, WK_NCG]] in walk order."""
    lib = rowops_lib()
    CPW = codes_c.shape[1]
    B = st.shape[0]
    r = lib.bsa_walk_codes_chunk(
        qflat.ctypes.data, qoffs.ctypes.data, tflat.ctypes.data,
        toffs.ctypes.data, codes_c.ctypes.data, CPW, begs_c.ctypes.data,
        beg_prev.ctypes.data, init_eo.ctypes.data, B, int(t0), int(t1),
        int(is_overlap), int(bandwidth), st.ctypes.data,
        cg_out.ctypes.data, cg_out.shape[1])
    if r != 0:
        raise RuntimeError("cigar overflow in chunked codes walk")


def g_chg_edge(g, u, v, cov):
    """Native chg_edge over the graph's SoA arrays; returns (eidx, existed)."""
    r = rowops_lib().bsa_gf_chg_edge(*gfull_args(g), u, v, cov)
    if r < 0:
        raise RuntimeError("native chg_edge failed")
    return (r >> 1), (r & 1)


def g_mov_node_edges(g, u, v, spec, dirn, movtype):
    r = rowops_lib().bsa_gf_mov_node_edges(*gfull_args(g), u, v, spec, dirn,
                                           movtype)
    if r < 0:
        raise RuntimeError("native mov_node_edges failed")


def gfull_args(g):
    """Cached pointer pack over the graph's SoA arrays (invalidated by the
    graph whenever an array rebinds)."""
    args = g._gargs
    if args is None:
        # the C GFULL view covers the first 11 topology arrays
        args = tuple(a.ctypes.data for a in g._nd[:11]) + \
            tuple(a.ctypes.data for a in g._ed) + \
            (g._estate.ctypes.data, g._ecyc.ctypes.data)
        g._gargs = args
    return args


def g_connect(g, u, v):
    if rowops_lib().bsa_g_connect(*gfull_args(g), u, v) < 0:
        raise RuntimeError("native connect failed")


def g_disconnect(g, u, v):
    if rowops_lib().bsa_g_disconnect(*gfull_args(g), u, v) < 0:
        raise RuntimeError("native disconnect failed")


def g_cut_rdnode(g, nidx, cut):
    r = rowops_lib().bsa_g_cut_rdnode(*gfull_args(g), len(g.nodes), nidx,
                                      cut)
    if r < 0:
        raise RuntimeError("native cut_rdnode failed")
    return r


def g_merge_nodes(g, n1, n2):
    r = rowops_lib().bsa_g_merge_nodes(*gfull_args(g), n1, n2)
    if r < 0:
        raise RuntimeError("native merge_nodes failed")
    return r


class RowArena:
    """Contiguous row storage indexed by mmidx slot; RowState views share
    the memory so all NumPy consumers keep working."""

    def __init__(self, nslot, W, piecewise):
        import numpy as _np
        self.W = W
        self.piecewise = piecewise
        self.us = _np.zeros((nslot, W, WS), _np.int8)
        self.es = _np.zeros((nslot, W, WS), _np.int8) if piecewise else None
        self.qs = (_np.zeros((nslot, W, WS), _np.int8)
                   if piecewise == 2 else None)
        self.ub = _np.zeros((nslot, WS + 1), _np.int64)
        self.ptrs = (self.us.ctypes.data,
                     self.es.ctypes.data if piecewise else None,
                     self.qs.ctypes.data if piecewise == 2 else None,
                     self.ub.ctypes.data)

    def view(self, slot):
        st = RowState.__new__(RowState)
        st.us = self.us[slot]
        st.es = self.es[slot] if self.es is not None else None
        st.qs = self.qs[slot] if self.qs is not None else None
        st.ubegs = self.ub[slot]
        return st

    def set_from(self, slot, st):
        self.us[slot] = st.us
        if self.es is not None:
            self.es[slot] = st.es
        if self.qs is not None:
            self.qs[slot] = st.qs
        self.ub[slot] = st.ubegs


def row_update_slot(arena, qprof_ptr, rbeg, base, movx, nt_max, nt_min,
                    gapo1, gape1, gapo2, gape2, rh_mode, rh_val, src, dst):
    rowops_lib().bsa8_row_update_slot(
        arena.ptrs[0], arena.ptrs[1], arena.ptrs[2], arena.ptrs[3],
        qprof_ptr, rbeg, base, arena.W, movx, arena.piecewise, nt_max,
        nt_min, gapo1, gape1, gapo2, gape2, rh_mode, rh_val, src, dst)


def row_merge_slot(arena, src, dst):
    rowops_lib().bsa8_row_merge_slot(
        arena.ptrs[0], arena.ptrs[1], arena.ptrs[2], arena.ptrs[3],
        arena.W, arena.piecewise, src, dst)


def align_rd_core(g, sels_arr, states_map, arena, qprof_ptrs, W, bandwidth,
                  slen, piecewise, nt_max, nt_min, gapo1, gape1, gapo2,
                  gape2, parT, is_overlap, is_global, nhead, ntail, best):
    """Native Kahn-walk forward DP over the selected subgraph; mutates the
    node arrays, the row arena, and best=[score, idx, off] in place."""
    import numpy as _np
    from ..poa.graph import (ED_NEXT, ED_NODE, ND_BASE, ND_BONUS, ND_EDGE,
                             ND_MMIDX, ND_MPOS, ND_NCT, ND_RPOS, ND_VST)
    nd = g._nd
    ed = g._ed
    stack_buf = _np.zeros(len(sels_arr) + 8, _np.int32)
    r = rowops_lib().bsa_align_rd_core(
        nd[ND_MPOS].ctypes.data, nd[ND_VST].ctypes.data,
        nd[ND_NCT].ctypes.data, nd[ND_MMIDX].ctypes.data,
        nd[ND_BASE].ctypes.data, nd[ND_BONUS].ctypes.data,
        nd[ND_RPOS].ctypes.data, nd[ND_EDGE].ctypes.data,
        ed[ED_NODE].ctypes.data, ed[ED_NEXT].ctypes.data,
        states_map.ctypes.data, sels_arr.ctypes.data, len(sels_arr),
        arena.ptrs[0], arena.ptrs[1], arena.ptrs[2], arena.ptrs[3],
        qprof_ptrs[0], qprof_ptrs[1], qprof_ptrs[2], qprof_ptrs[3],
        W, bandwidth, slen, piecewise, nt_max, nt_min, gapo1, gape1,
        gapo2, gape2, parT, is_overlap, is_global, nhead, ntail,
        best.ctypes.data, stack_buf.ctypes.data, len(stack_buf))
    if r < 0:
        raise RuntimeError("native align_rd_core failed")


def align_rd_full(g, rdseq, cns, par, nseq, rid, rbeg, rend, realn):
    """Whole-read POA alignment in one native call (sel_nodes + band
    placement + row DP + alignment2graph + bridge reverts); returns the
    filled AlnResult. The caller must pre-screen configs the C path does
    not cover (refmode CIGAR placement, ksz==0 band trigger)."""
    import numpy as _np
    from ..poa.graph import (ND_BASE, ND_BLESS, ND_BONUS, ND_CPOS, ND_MMIDX,
                             ND_MPOS, ND_NCT, ND_RPOS, ND_VST)
    rlen = rend - rbeg
    g._encap_edges(4 * len(g.nodes) + 24 * (rlen + 4) + 2048)
    nd = g._nd
    ndoffs = _np.asarray(g.ndoffs, _np.int64)
    rs_out = _np.zeros(10, _np.int64)
    qc = _np.ascontiguousarray(rdseq, _np.uint8)
    tc = _np.ascontiguousarray(cns, _np.uint8)
    r = rowops_lib().bsa_align_rd_full(
        *gfull_args(g),
        nd[ND_MPOS].ctypes.data, nd[ND_VST].ctypes.data,
        nd[ND_NCT].ctypes.data, nd[ND_MMIDX].ctypes.data,
        nd[ND_BASE].ctypes.data, nd[ND_BONUS].ctypes.data,
        nd[ND_BLESS].ctypes.data, nd[ND_RPOS].ctypes.data,
        nd[ND_CPOS].ctypes.data, ndoffs.ctypes.data, len(g.nodes),
        g.HEAD, g.TAIL, qc.ctypes.data, tc.ctypes.data, len(tc),
        par.alnmode, par.bandwidth, int(par.bwtrigger), par.ksz, par.nrec,
        par.M, par.X, par.refbonus, par.O, par.E, par.Q, par.P, par.T,
        nseq, rid, rbeg, rend, int(realn), rs_out.ctypes.data)
    if r < 0:
        raise RuntimeError(f"native align_rd_full failed ({r})")
    from ..cigar import AlnResult
    rs = AlnResult()
    (rs.score, rs.qb, rs.qe, rs.tb, rs.te, rs.mat, rs.mis, rs.ins,
     rs.dele, rs.aln) = (int(v) for v in rs_out)
    return rs


def end_begin_loop(g, seqcat, seqoffs, rdlens, ndoffs_arr, par, nmsa, nall,
                   rid_start, msacols_buf, mrow, cns_buf, stack_buf, out):
    """Native incremental end_bspoa loop (msa + simple_cns + align per
    read); returns the next unprocessed rid (== nmsa when done). See
    bsa_end_begin_loop in rowops.cpp for the out[]/resume contract."""
    from ..poa.graph import (ND_BASE, ND_BLESS, ND_BONUS, ND_CPOS, ND_INUSE,
                             ND_MMIDX, ND_MPOS, ND_NCT, ND_RPOS, ND_VST)
    nd = g._nd
    r = rowops_lib().bsa_end_begin_loop(
        *gfull_args(g),
        nd[ND_MPOS].ctypes.data, nd[ND_VST].ctypes.data,
        nd[ND_NCT].ctypes.data, nd[ND_INUSE].ctypes.data,
        nd[ND_MMIDX].ctypes.data, nd[ND_BASE].ctypes.data,
        nd[ND_BONUS].ctypes.data, nd[ND_BLESS].ctypes.data,
        nd[ND_RPOS].ctypes.data, nd[ND_CPOS].ctypes.data,
        ndoffs_arr.ctypes.data, rdlens.ctypes.data,
        seqcat.ctypes.data, seqoffs.ctypes.data,
        len(g.nodes), g.HEAD, g.TAIL,
        par.alnmode, par.bandwidth, int(par.bwtrigger), par.ksz, par.nrec,
        par.M, par.X, par.refbonus, par.O, par.E, par.Q, par.P, par.T,
        nmsa, nall, rid_start,
        msacols_buf.ctypes.data, mrow, len(msacols_buf),
        cns_buf.ctypes.data, len(cns_buf),
        stack_buf.ctypes.data, len(stack_buf), out.ctypes.data)
    if r < 0:
        raise RuntimeError(f"native end_begin loop failed ({r})")
    return int(r)


def pedit_traceback(g, matrix0, matrix1, seqs0, seqs1, mats0, mats1,
                    ndoffs_arr, mlen, mbeg, mend, HW, rowlen, rid,
                    nseq_plus1, qe):
    """Native pedit traceback; replays safely on edge-capacity growth (the
    path depends only on the matrices, and re-merging is a no-op)."""
    lib = rowops_lib()
    while True:
        g._encap_edges(4096)
        g._estate[3] = 0
        r = lib.bsa_pedit_traceback(
            *gfull_args(g), matrix0.ctypes.data, matrix1.ctypes.data,
            seqs0.ctypes.data, seqs1.ctypes.data, mats0.ctypes.data,
            mats1.ctypes.data, ndoffs_arr.ctypes.data, mlen, mbeg, mend,
            HW, rowlen, mats0.shape[1], rid, nseq_plus1, qe)
        if r == -2 and g._estate[3] == 1:
            g._encap_edges(len(g._ed[0]))       # grow and replay
            continue
        if r < 0:
            raise RuntimeError(f"native pedit traceback failed ({r})")
        return int(r)


def sort_nodes(g):
    """Native topological column assignment; returns mlen."""
    import numpy as _np
    from ..poa.graph import (ED_NEXT, ED_NODE, ND_EDGE, ND_EREV, ND_INUSE,
                             ND_MPOS, ND_NCT, ND_NEXT, ND_NIN, ND_NOU,
                             ND_VST)
    nd = g._nd
    ed = g._ed
    n = len(g.nodes)
    stack = _np.zeros(n + 8, _np.int32)
    r = rowops_lib().bsa_sort_nodes(
        nd[ND_MPOS].ctypes.data, nd[ND_VST].ctypes.data,
        nd[ND_NCT].ctypes.data, nd[ND_INUSE].ctypes.data,
        nd[ND_NIN].ctypes.data, nd[ND_NOU].ctypes.data,
        nd[ND_NEXT].ctypes.data, nd[ND_EDGE].ctypes.data,
        nd[ND_EREV].ctypes.data, ed[ED_NODE].ctypes.data,
        ed[ED_NEXT].ctypes.data, n, g.HEAD, g.TAIL,
        stack.ctypes.data, len(stack))
    if r == -1:
        raise RuntimeError("sort_nodes overflow")
    if r == -2:
        raise RuntimeError("sort_nodes did not reach HEAD")
    if r == -4:
        raise RuntimeError("tail chain fork")
    if r < 0:
        raise RuntimeError(f"native sort_nodes failed ({r})")
    return int(r)


def msa_fill(g, msacols, msaidxs_arr, mlen, mrow):
    import numpy as _np
    from ..poa.graph import (ED_NEXT, ED_NODE, ND_BASE, ND_EDGE, ND_EREV,
                             ND_MPOS, ND_NCT, ND_NEXT, ND_NIN, ND_RID,
                             ND_VST)
    nd = g._nd
    ed = g._ed
    n = len(g.nodes)
    stack = _np.zeros(n + 8, _np.int32)
    r = rowops_lib().bsa_msa_fill(
        nd[ND_MPOS].ctypes.data, nd[ND_VST].ctypes.data,
        nd[ND_NCT].ctypes.data, nd[ND_NIN].ctypes.data,
        nd[ND_NEXT].ctypes.data, nd[ND_EDGE].ctypes.data,
        nd[ND_EREV].ctypes.data, nd[ND_RID].ctypes.data,
        nd[ND_BASE].ctypes.data, ed[ED_NODE].ctypes.data,
        ed[ED_NEXT].ctypes.data, n, g.HEAD, g.TAIL,
        msacols.ctypes.data, msaidxs_arr.ctypes.data, mlen, mrow,
        stack.ctypes.data, len(stack))
    if r == -1:
        raise RuntimeError("msa fill overflow")
    if r == -2:
        raise RuntimeError("msa fill did not reach TAIL")
    if r < 0:
        raise RuntimeError(f"native msa fill failed ({r})")


def g_cut_range(g, rid, lo, hi, cut):
    """cut_rdnode over positions hi-1..lo (descending)."""
    import numpy as _np
    # worst-case edge growth per cut is bounded by local degree; size for
    # the whole range generously and grow the stack headroom once
    g._encap_edges(8 * (hi - lo) + 64)
    r = rowops_lib().bsa_g_cut_range(*gfull_args(g), len(g.nodes),
                                     g.ndoffs[rid], lo, hi, cut)
    if r < 0:
        raise RuntimeError("native cut_range failed")


def remsa_round(g, nnodes, ndoffs_arr, rdlens_arr, nrds, start_rid, seqs0,
                mats0, seqs1, mats1, matrix0, matrix1, mlen, bw, HW, rowlen,
                pad, nseq_plus1, mpos_arr, base_arr):
    """One whole remsa round (cut + profile rebuild + pedit forward +
    traceback merges + reconnect) for core reads [start_rid, nrds) in a
    single native call. Returns the next unprocessed rid (== nrds when
    done; the caller encaps edges and resumes on early return)."""
    r = rowops_lib().bsa_remsa_round(
        *gfull_args(g), nnodes,
        mpos_arr.ctypes.data, base_arr.ctypes.data,
        ndoffs_arr.ctypes.data, rdlens_arr.ctypes.data, nrds, start_rid,
        seqs0.ctypes.data, mats0.ctypes.data, seqs1.ctypes.data,
        mats1.ctypes.data, matrix0.ctypes.data, matrix1.ctypes.data,
        mlen, bw, HW, rowlen, pad, nseq_plus1)
    if r < 0:
        raise RuntimeError(f"native remsa_round failed ({r})")
    return int(r)


def hp_adjust(mlen, cnsrow, cnt, cap255):
    """Native homopolymer count re-attribution over a [mlen,4] int64 count
    matrix (in place); cnsrow is the uint8 consensus row."""
    rowops_lib().bsa_hp_adjust(mlen, cnsrow.ctypes.data, cnt.ctypes.data,
                               1 if cap255 else 0)


def g_cut_range_asc(g, rid, lo, hi, cut):
    """cut_rdnode over positions lo..hi-1 (ascending; del_msanodes order)."""
    g._encap_edges(8 * (hi - lo) + 64)
    r = rowops_lib().bsa_g_cut_range_asc(*gfull_args(g), len(g.nodes),
                                         g.ndoffs[rid], lo, hi, cut)
    if r < 0:
        raise RuntimeError("native cut_range_asc failed")


def cns_tail(sc, btm, msacols, msaidxs, mlen, nall, nmax, psub, qlt_max):
    """Native consensus backtrace + QLT/ALT tail. Mutates msacols rows
    (cns/qlt/alt columns); returns (cns, qlt, alt, ret)."""
    import numpy as _np
    lib = rowops_lib()
    cns = _np.zeros(mlen, _np.uint8)
    qlt = _np.zeros(mlen, _np.uint8)
    alt = _np.zeros(mlen, _np.uint8)
    ret = _np.zeros(1, _np.float64)
    n = lib.bsa_cns_tail(sc.ctypes.data, btm.ctypes.data,
                         msacols.ctypes.data, msacols.shape[1],
                         msaidxs.ctypes.data, mlen, nall, nmax,
                         float(psub), qlt_max, cns.ctypes.data,
                         qlt.ctypes.data, alt.ctypes.data, ret.ctypes.data)
    return cns[:n].copy(), qlt[:n].copy(), alt[:n].copy(), float(ret[0])


def g_connect_range(g, rid, lo, hi):
    g._encap_edges(4 * (hi - lo + 1) + 64)
    r = rowops_lib().bsa_g_connect_range(*gfull_args(g), g.ndoffs[rid], lo,
                                         hi)
    if r < 0:
        raise RuntimeError("native connect_range failed")


def alignment2graph(g, arena, qprof_ptrs, states_map, ndoffs_arr, W,
                    bandwidth, qlen, qb, piecewise, parO, parE, parQ, parP,
                    is_overlap, nhead, ntail, midx, xe, rid, rbeg, rs):
    """Native graph traceback + ring fusion; fills rs (AlnResult)."""
    import numpy as _np
    from ..poa.graph import (ND_BASE, ND_BONUS, ND_CPOS, ND_MMIDX, ND_MPOS,
                             ND_RPOS)
    g._encap_edges(16 * (qlen + 4) + 1024)
    nd = g._nd
    out = _np.zeros(10, _np.int64)
    r = rowops_lib().bsa_alignment2graph(
        *gfull_args(g),
        nd[ND_MPOS].ctypes.data, nd[ND_RPOS].ctypes.data,
        nd[ND_MMIDX].ctypes.data, nd[ND_BASE].ctypes.data,
        nd[ND_BONUS].ctypes.data, nd[ND_CPOS].ctypes.data,
        states_map.ctypes.data, ndoffs_arr.ctypes.data,
        arena.ptrs[0], arena.ptrs[1], arena.ptrs[2], arena.ptrs[3],
        qprof_ptrs[0], qprof_ptrs[1], qprof_ptrs[2], qprof_ptrs[3],
        W, bandwidth, qlen, qb, piecewise, parO, parE, parQ, parP,
        is_overlap, nhead, ntail, midx, xe, rid, rbeg,
        out.ctypes.data)
    if r < 0:
        raise RuntimeError(f"native alignment2graph failed ({r})")
    (rs.score, rs.qb, rs.qe, rs.tb, rs.te, rs.mat, rs.mis, rs.ins,
     rs.dele, rs.aln) = (int(v) for v in out)
    return rs


def edit_forward(qseq, tseq, bandwidth, is_overlap, is_extend):
    """Native scalar-edit forward; returns (uts, begs, smin, rx, ry, sbeg)."""
    import numpy as _np
    qc = _np.ascontiguousarray(qseq, _np.uint8)
    tc = _np.ascontiguousarray(tseq, _np.uint8)
    tlen = len(tc)
    uts = _np.empty((tlen + 1, bandwidth), _np.int8)
    begs = _np.zeros(tlen + 1, _np.int64)
    out = _np.zeros(4, _np.int64)
    rowops_lib().bsa_edit_forward(qc.ctypes.data, len(qc), tc.ctypes.data,
                                  tlen, bandwidth, int(is_overlap),
                                  int(is_extend), uts.ctypes.data,
                                  begs.ctypes.data, out.ctypes.data)
    return uts, begs, int(out[0]), int(out[1]), int(out[2]), int(out[3])


def _edit_rs(out):
    from ..cigar import AlnResult
    rs = AlnResult()
    (rs.qb, rs.qe, rs.tb, rs.te, rs.mat, rs.mis, rs.ins, rs.dele, rs.aln,
     rs.score) = (int(v) for v in out)
    return rs


def edit_align(qseq, tseq, modetype, bandwidth):
    """Full native edit_pairwise (forward + backtrace + mode scoring);
    returns (AlnResult, cigars list)."""
    qc = np.ascontiguousarray(qseq, np.uint8)
    tc = np.ascontiguousarray(tseq, np.uint8)
    cap = len(qc) + len(tc) + 16
    cg = np.empty(cap, np.uint32)
    out = np.zeros(10, np.int64)
    n = rowops_lib().bsa_edit_align(qc.ctypes.data, len(qc), tc.ctypes.data,
                                    len(tc), modetype, bandwidth,
                                    cg.ctypes.data, cap, out.ctypes.data)
    if n < 0:
        raise RuntimeError("native edit_align cigar overflow")
    return _edit_rs(out), cg[:n].tolist()


def qprof4(qsub, slen, bandwidth, M, X, refbonus):
    """All four POA query profiles ({M, M+refbonus} x {hpc, plain}) in one
    native call; each [xlen+1, 4, WS] int8."""
    qc = np.ascontiguousarray(qsub, np.uint8)
    xlen = max(slen, bandwidth)
    outs = [np.empty((xlen + 1, 4, WS), np.int8) for _ in range(4)]
    rowops_lib().bsa_qprof4(qc.ctypes.data, slen, bandwidth, M, X, refbonus,
                            outs[0].ctypes.data, outs[1].ctypes.data,
                            outs[2].ctypes.data, outs[3].ctypes.data)
    return outs


def simple_cns(msacols, msaidxs_arr, mlen, mrow, nseq, nall, cpos_arr,
               ndoffs_arr):
    """Native majority-vote consensus; returns per-column bsel [mlen]
    (filter <4 for the cns string). Mutates msacols + node cpos in place."""
    bsel = np.empty(mlen, np.uint8)
    rowops_lib().bsa_simple_cns(
        msacols.ctypes.data, msaidxs_arr.ctypes.data, mlen, mrow, nseq,
        nall, cpos_arr.ctypes.data, ndoffs_arr.ctypes.data,
        bsel.ctypes.data)
    return bsel


def kmer_edit(ksz, qseq, tseq):
    """Full native kmer_edit_pairwise; returns (AlnResult, cigars list)."""
    qc = np.ascontiguousarray(qseq, np.uint8)
    tc = np.ascontiguousarray(tseq, np.uint8)
    cap = len(qc) + len(tc) + 16
    cg = np.empty(cap, np.uint32)
    out = np.zeros(10, np.int64)
    n = rowops_lib().bsa_kmer_edit(qc.ctypes.data, len(qc), tc.ctypes.data,
                                   len(tc), ksz, cg.ctypes.data, cap,
                                   out.ctypes.data)
    if n < 0:
        raise RuntimeError("native kmer_edit cigar overflow")
    return _edit_rs(out), cg[:n].tolist()


def msanode_cns_merges(g, msacols, msaidxs_arr, mlen, mrow, nall, nseq,
                       ndoffs_arr, cnsnode0):
    from ..poa.graph import ND_MPOS
    g._encap_edges(16 * mlen + 1024)
    r = rowops_lib().bsa_msanode_cns_merges(
        *gfull_args(g), g._nd[ND_MPOS].ctypes.data, msacols.ctypes.data,
        msaidxs_arr.ctypes.data, mlen, mrow, nall, nseq,
        ndoffs_arr.ctypes.data, cnsnode0)
    if r < 0:
        raise RuntimeError(f"native cns merges failed ({r})")
    return int(r)


def msanode_rail_merges(g, msacols, msaidxs_arr, mlen, mrow, nall, nseq,
                        ndoffs_arr):
    from ..poa.graph import ND_BASE
    g._encap_edges(32 * mlen + 4096)
    r = rowops_lib().bsa_msanode_rail_merges(
        *gfull_args(g), g._nd[ND_BASE].ctypes.data, msacols.ctypes.data,
        msaidxs_arr.ctypes.data, mlen, mrow, nall, nseq,
        ndoffs_arr.ctypes.data)
    if r < 0:
        raise RuntimeError(f"native rail merges failed ({r})")


def sel_nodes(g, nhead, ntail, ridxbeg, ridxend, nseq, ndoffs_arr):
    """Native node-subset selection; returns (sels_list, states_map,
    todels_pairs)."""
    import numpy as _np
    from ..poa.graph import ND_BLESS, ND_BONUS, ND_NCT, ND_VST
    nd = g._nd
    n = len(g.nodes)
    g._encap_edges(4 * n + 1024)
    states = _np.zeros(n, _np.uint8)
    sels = _np.zeros(n + 8, _np.int32)
    todels = _np.zeros(2 * n + 8, _np.int64)
    out = _np.zeros(2, _np.int64)
    r = rowops_lib().bsa_sel_nodes(
        *gfull_args(g), nd[ND_VST].ctypes.data, nd[ND_NCT].ctypes.data,
        nd[ND_BONUS].ctypes.data, nd[ND_BLESS].ctypes.data,
        ndoffs_arr.ctypes.data, n, nhead, ntail, ridxbeg, ridxend, nseq,
        states.ctypes.data, sels.ctypes.data, len(sels),
        todels.ctypes.data, len(todels), out.ctypes.data)
    if r < 0:
        raise RuntimeError(f"native sel_nodes failed ({r})")
    nsel, ntd = int(out[0]), int(out[1])
    td = todels[:ntd]
    pairs = [(int(td[i]), int(td[i + 1])) for i in range(0, ntd, 2)]
    return sels[:nsel], states, pairs
