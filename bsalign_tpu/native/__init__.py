"""Native (C++) host-side components.

rowops: banded striped DP row primitives used by the POA engine's per-node
row updates. Compiled on first use with g++ -O3; falls back to the NumPy
oracle transparently if no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-march=native", src, "-o", out]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            # retry without -march=native (portability)
            cmd.remove("-march=native")
            r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def rowops_lib():
    """Return the loaded librowops, building it on demand; None if
    unavailable (BSA_NO_NATIVE=1 disables)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("BSA_NO_NATIVE"):
            return None
        src = os.path.join(_DIR, "rowops.cpp")
        so = os.path.join(_DIR, "librowops.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            if not _build(src, so):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        # raw-address args (a.ctypes.data ints) are much cheaper to pass
        # than POINTER casts at ~400k calls per MSA
        c_i8p = ctypes.c_void_p
        c_i64p = ctypes.c_void_p
        lib.bsa8_row_update.argtypes = [
            c_i8p, c_i8p, c_i8p, c_i64p,          # prev us/es/qs/ubegs
            c_i8p, c_i8p, c_i8p, c_i64p,          # cur
            c_i8p, ctypes.c_int, ctypes.c_int,    # qprof, rbeg, tbase
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # W, movx, piecewise
            ctypes.c_int, ctypes.c_int,           # nt_max, nt_min
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # gaps
            ctypes.c_int, ctypes.c_int64,         # rh_mode, rh_val
        ]
        lib.bsa8_row_update.restype = None
        lib.bsa8_row_merge.argtypes = [
            c_i8p, c_i8p, c_i8p, c_i64p,
            c_i8p, c_i8p, c_i8p, c_i64p,
            c_i8p, c_i8p, c_i8p, c_i64p,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.bsa8_row_merge.restype = None
        lib.bsa8_row_update_slot.argtypes = \
            [ctypes.c_void_p] * 5 + [ctypes.c_int] * 12 + \
            [ctypes.c_int64, ctypes.c_long, ctypes.c_long]
        lib.bsa8_row_update_slot.restype = None
        lib.bsa8_row_merge_slot.argtypes = \
            [ctypes.c_void_p] * 4 + [ctypes.c_int] * 2 + [ctypes.c_long] * 2
        lib.bsa8_row_merge_slot.restype = None
        lib.bsa_align_rd_core.argtypes = \
            [ctypes.c_void_p] * 12 + [ctypes.c_long] + \
            [ctypes.c_void_p] * 8 + [ctypes.c_long] * 15 + \
            [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
        lib.bsa_align_rd_core.restype = ctypes.c_long
        lib.bsa_pedit_traceback.argtypes = \
            [ctypes.c_void_p] * 17 + [ctypes.c_void_p] * 7 \
            + [ctypes.c_long] * 9
        lib.bsa_pedit_traceback.restype = ctypes.c_long
        lib.bsa_sort_nodes.argtypes = \
            [ctypes.c_void_p] * 11 + [ctypes.c_long] * 3 + \
            [ctypes.c_void_p, ctypes.c_long]
        lib.bsa_sort_nodes.restype = ctypes.c_long
        lib.bsa_msa_fill.argtypes = \
            [ctypes.c_void_p] * 11 + [ctypes.c_long] * 3 + \
            [ctypes.c_void_p, ctypes.c_void_p] + [ctypes.c_long] * 2 + \
            [ctypes.c_void_p, ctypes.c_long]
        lib.bsa_msa_fill.restype = ctypes.c_long
        lib.bsa_alignment2graph.argtypes = \
            [ctypes.c_void_p] * 17 + [ctypes.c_void_p] * 8 + \
            [ctypes.c_void_p] * 8 + [ctypes.c_long] * 16 + \
            [ctypes.c_void_p]
        lib.bsa_alignment2graph.restype = ctypes.c_long
        lib.bsa_edit_forward.argtypes = \
            [ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
             ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
             ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.bsa_edit_forward.restype = ctypes.c_long
        lib.bsa_msanode_cns_merges.argtypes = \
            [ctypes.c_void_p] * 17 + [ctypes.c_void_p] * 3 + \
            [ctypes.c_long] * 4 + [ctypes.c_void_p, ctypes.c_long]
        lib.bsa_msanode_cns_merges.restype = ctypes.c_long
        lib.bsa_msanode_rail_merges.argtypes = \
            [ctypes.c_void_p] * 17 + [ctypes.c_void_p] * 3 + \
            [ctypes.c_long] * 4 + [ctypes.c_void_p]
        lib.bsa_msanode_rail_merges.restype = ctypes.c_long
        lib.bsa_sel_nodes.argtypes = \
            [ctypes.c_void_p] * 17 + [ctypes.c_void_p] * 5 + \
            [ctypes.c_long] * 6 + \
            [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
             ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p]
        lib.bsa_sel_nodes.restype = ctypes.c_long
        lib.bsa_align_rd_full.argtypes = \
            [ctypes.c_void_p] * 17 + [ctypes.c_void_p] * 10 + \
            [ctypes.c_long] * 3 + [ctypes.c_void_p] * 2 + \
            [ctypes.c_long] * 19 + [ctypes.c_void_p]
        lib.bsa_align_rd_full.restype = ctypes.c_long
        lib.bsa_end_begin_loop.argtypes = \
            [ctypes.c_void_p] * 17 + [ctypes.c_void_p] * 10 + \
            [ctypes.c_void_p] * 4 + [ctypes.c_long] * 19 + \
            [ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
             ctypes.c_void_p, ctypes.c_long,
             ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p]
        lib.bsa_end_begin_loop.restype = ctypes.c_long
        lib.bsa8_getscore.argtypes = [c_i8p, c_i64p, ctypes.c_int,
                                      ctypes.c_int]
        lib.bsa8_getscore.restype = ctypes.c_int64
        c_u8p = ctypes.c_void_p
        lib.bsa_pedit_forward.argtypes = [
            c_u8p, c_u8p, c_u8p, c_u8p, c_u8p, c_u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_long,
        ]
        lib.bsa_pedit_forward.restype = None
        lib.bsa_cns_forward.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.bsa_cns_forward.restype = None
        lib.bsa_cns_tail.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_double, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.bsa_cns_tail.restype = ctypes.c_long
        lib.bsa_hp_adjust.argtypes = [ctypes.c_long, ctypes.c_void_p,
                                      ctypes.c_void_p, ctypes.c_long]
        lib.bsa_hp_adjust.restype = None
        lib.bsa_edit_row.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_void_p]
        lib.bsa_edit_row.restype = None
        lib.bsa_edit_align.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p]
        lib.bsa_edit_align.restype = ctypes.c_long
        lib.bsa_kmer_edit.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_long, ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p]
        lib.bsa_kmer_edit.restype = ctypes.c_long
        lib.bsa_qprof4.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.bsa_qprof4.restype = None
        lib.bsa_simple_cns.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.bsa_simple_cns.restype = ctypes.c_long
        lib.bsa_mask_lead_tail.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long]
        lib.bsa_mask_lead_tail.restype = None
        lib.bsa_remsa_round.argtypes = \
            [ctypes.c_void_p] * 17 + [ctypes.c_long] + \
            [ctypes.c_void_p] * 4 + [ctypes.c_long] * 2 + \
            [ctypes.c_void_p] * 6 + [ctypes.c_long] * 6
        lib.bsa_remsa_round.restype = ctypes.c_long
        lib.bsa8_backcal.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ]
        lib.bsa8_backcal.restype = ctypes.c_long
        lib.bsa_decode_codes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ]
        lib.bsa_decode_codes.restype = ctypes.c_long
        lib.bsa_walk_codes_chunk.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_long,
        ]
        lib.bsa_walk_codes_chunk.restype = ctypes.c_long
        ge_args = [ctypes.c_void_p] * 12
        lib.bsa_g_chg_edge.argtypes = ge_args + [ctypes.c_long] * 3
        lib.bsa_g_chg_edge.restype = ctypes.c_long
        lib.bsa_g_mov_node_edges.argtypes = ge_args + [ctypes.c_long] * 5
        lib.bsa_g_mov_node_edges.restype = ctypes.c_long
        gf_args = [ctypes.c_void_p] * 17
        for nm, nex in (("bsa_g_connect", 2), ("bsa_g_disconnect", 2),
                        ("bsa_g_cut_rdnode", 3), ("bsa_g_merge_nodes", 2),
                        ("bsa_gf_chg_edge", 3),
                        ("bsa_gf_mov_node_edges", 5),
                        ("bsa_g_cut_range", 5),
                        ("bsa_g_cut_range_asc", 5),
                        ("bsa_g_connect_range", 3)):
            fn = getattr(lib, nm)
            fn.argtypes = gf_args + [ctypes.c_long] * nex
            fn.restype = ctypes.c_long
        _LIB = lib
        return _LIB
