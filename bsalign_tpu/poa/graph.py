"""POA graph data model: nodes, paired edges, aligned-node rings.

Mirrors the reference's semantics (bspoa.h:28-101, 394-902): nodes carry a
circular "aligned ring" (next/prev/header); edges come in fwd/rev pairs at
even/odd indices with per-node linked lists kept sorted by coverage
descending (insertion after equals — iteration order is a tie-break input to
alignment, so it must match exactly).

Storage is struct-of-arrays: the ring/edge-topology fields (header, cov,
next/prev, edge/erev heads, nin/nou, rdc/rdd, rid) and all edge fields live
in NumPy int32 arrays so the hot mutators (chg_edge, _mov_node_edges,
get_edge) can run in librowops with one native call each; `Node` keeps the
alignment-bookkeeping fields as plain attributes and exposes the shared
fields as properties over the arrays — object views and native ops always
see the same memory.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

_NODE_GROW = 1024
_EDGE_GROW = 4096



def _grow(a: np.ndarray, cap: int) -> np.ndarray:
    """Reallocate to cap entries (contents past the old length are
    uninitialized — callers init new slots). Faster than np.resize,
    which cyclically repeats old data to fill."""
    b = np.empty(cap, a.dtype)
    b[:len(a)] = a
    return b

class Node:
    """Pure view over the graph's SoA arrays — nodes hold no Python state,
    so bulk node creation is array writes and `g.nodes[i]` materializes a
    2-slot view on demand."""

    __slots__ = ("g", "idx")

    def __init__(self, g: "Graph", idx: int, rid: int, pos: int, base: int):
        self.g = g
        self.idx = idx
        a = g._nd
        i = idx
        for f in (ND_RDC, ND_RDD, ND_NIN, ND_NOU, ND_EDGE, ND_EREV,
                  ND_INUSE, ND_BONUS, ND_VST, ND_NCT, ND_MPOS, ND_RPOS,
                  ND_MMIDX, ND_CPOS, ND_BLESS, ND_REF, ND_AUX, ND_COLOR):
            a[f][i] = 0
        a[ND_RID][i] = rid
        a[ND_COV][i] = 1
        a[ND_NEXT][i] = i
        a[ND_PREV][i] = i
        a[ND_HEADER][i] = i
        a[ND_BASE][i] = base
        a[ND_POS][i] = pos


(ND_RID, ND_COV, ND_RDC, ND_RDD, ND_NIN, ND_NOU, ND_EDGE, ND_EREV,
 ND_NEXT, ND_PREV, ND_HEADER, ND_BASE, ND_MPOS, ND_VST, ND_NCT, ND_INUSE,
 ND_BONUS, ND_RPOS, ND_MMIDX, ND_CPOS, ND_BLESS, ND_POS, ND_REF, ND_AUX,
 ND_COLOR) = range(25)
_ND_FIELDS = ("rid", "cov", "rdc", "rdd", "nin", "nou", "edge", "erev",
              "next", "prev", "header", "base", "mpos", "vst", "nct",
              "inuse", "bonus", "rpos", "mmidx", "cpos", "bless", "pos",
              "ref", "aux", "colorful")

(ED_NODE, ED_COV, ED_VST, ED_NEXT) = range(4)


def _mk_prop(fi):
    def get(self):
        return int(self.g._nd[fi][self.idx])

    def set_(self, v):
        self.g._nd[fi][self.idx] = v
    return property(get, set_)


for _fi, _fn in enumerate(_ND_FIELDS):
    setattr(Node, _fn, _mk_prop(_fi))


class EdgeRef:
    """View of one edge slot (valid until the graph mutates)."""

    __slots__ = ("g", "idx")

    def __init__(self, g: "Graph", idx: int):
        self.g = g
        self.idx = idx

    @property
    def node(self) -> int:
        return int(self.g._ed[ED_NODE][self.idx])

    @property
    def cov(self) -> int:
        return int(self.g._ed[ED_COV][self.idx])

    @property
    def vst(self) -> int:
        return int(self.g._ed[ED_VST][self.idx])

    @vst.setter
    def vst(self, v) -> None:
        self.g._ed[ED_VST][self.idx] = v

    @property
    def next(self) -> int:
        return int(self.g._ed[ED_NEXT][self.idx])


class _EdgesView:
    __slots__ = ("g",)

    def __init__(self, g: "Graph"):
        self.g = g

    def __getitem__(self, idx: int) -> EdgeRef:
        return EdgeRef(self.g, idx)

    def __len__(self) -> int:
        return self.g._elen


class _NodesView:
    """Lazy list of Node views: indexing materializes a (g, idx) pair;
    nothing is stored per node."""

    __slots__ = ("g", "_n")

    def __init__(self, g: "Graph"):
        self.g = g
        self._n = 0

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, idx: int) -> Node:
        v = Node.__new__(Node)
        v.g = self.g
        v.idx = idx + self._n if idx < 0 else idx
        return v

    def __iter__(self):
        for i in range(self._n):
            yield self[i]

    def __delitem__(self, sl) -> None:
        # only tail truncation is used (del nodes[k:])
        if not (isinstance(sl, slice) and sl.stop is None and sl.step is None):
            raise TypeError("only `del nodes[k:]` is supported")
        start = sl.start
        if start < 0:
            start += self._n
        self._n = min(self._n, max(0, start))


class Graph:
    """Node/edge store with the reference's exact list disciplines."""

    MOVALL = 0x0F0F
    KPTONE = 0x1E0F
    MOVONE = 0xE1F0

    def __init__(self):
        self.nodes = _NodesView(self)
        self._nd = [np.zeros(_NODE_GROW, np.int32) for _ in range(25)]
        self._ed = [np.zeros(_EDGE_GROW, np.int32) for _ in range(4)]
        # estate: [0]=edge count (idx 0/1 reserved), [1]=recycle-stack size,
        # [2]=edge capacity, [3]=error flag — shared with librowops
        self._estate = np.array([2, 0, _EDGE_GROW, 0], np.int64)
        self._ecyc = np.zeros(_EDGE_GROW // 2, np.int32)
        self.edges = _EdgesView(self)
        self.HEAD = 0
        self.TAIL = 1
        self.ndoffs: List[int] = []
        self._gargs = None                  # cached native pointer pack
        self._native = None
        from ..native import rowops as NR
        if NR.available():
            self._native = NR

    # --- storage ---
    def _encap_nodes(self) -> None:
        n = len(self.nodes)
        if n >= len(self._nd[0]):
            cap = max(n + 1, len(self._nd[0]) * 2)
            self._nd = [_grow(a, cap) for a in self._nd]
            self._gargs = None

    @property
    def _elen(self) -> int:
        return int(self._estate[0])

    @_elen.setter
    def _elen(self, v: int) -> None:
        self._estate[0] = v

    def _encap_edges(self, extra: int) -> None:
        if self._elen + extra >= len(self._ed[0]):
            cap = max(self._elen + extra, len(self._ed[0]) * 2)
            self._ed = [_grow(a, cap) for a in self._ed]
            self._estate[2] = cap
            self._ecyc = _grow(self._ecyc, cap // 2)
            self._gargs = None

    # --- nodes ---
    def new_node(self, rid: int, pos: int, base: int) -> int:
        idx = self.nodes._n
        self._encap_nodes()
        Node(self, idx, rid, pos, base)
        self.nodes._n = idx + 1
        return idx

    def new_nodes_bulk(self, rid: int, pos0: int, bases) -> int:
        """Append len(bases) nodes with consecutive positions; returns the
        first index. Pure array writes — no per-node Python objects."""
        n = len(bases)
        i0 = self.nodes._n
        while i0 + n >= len(self._nd[0]):
            self._encap_nodes_to(i0 + n + 1)
        nd = self._nd
        sl = slice(i0, i0 + n)
        for f in (ND_RDC, ND_RDD, ND_NIN, ND_NOU, ND_EDGE, ND_EREV,
                  ND_INUSE, ND_BONUS, ND_VST, ND_NCT, ND_MPOS, ND_RPOS,
                  ND_MMIDX, ND_CPOS, ND_BLESS, ND_REF, ND_AUX, ND_COLOR):
            nd[f][sl] = 0
        nd[ND_RID][sl] = rid
        nd[ND_COV][sl] = 1
        idxs = np.arange(i0, i0 + n, dtype=np.int32)
        nd[ND_NEXT][sl] = idxs
        nd[ND_PREV][sl] = idxs
        nd[ND_HEADER][sl] = idxs
        nd[ND_BASE][sl] = bases
        nd[ND_POS][sl] = pos0 + np.arange(n, dtype=np.int32)
        self.nodes._n = i0 + n
        return i0

    def _encap_nodes_to(self, n: int) -> None:
        if n >= len(self._nd[0]):
            cap = max(n + 1, len(self._nd[0]) * 2)
            self._nd = [_grow(a, cap) for a in self._nd]
            self._gargs = None

    def rdnode(self, rid: int, pos: int) -> int:
        return self.ndoffs[rid] + pos

    def n(self, idx: int) -> Node:
        return self.nodes[idx]

    def set_nodecov(self, u: int, cov: int) -> None:
        nd = self._nd
        nd[ND_COV][nd[ND_HEADER][u]] = cov

    def get_nodecov(self, u: int) -> int:
        nd = self._nd
        return int(nd[ND_COV][nd[ND_HEADER][u]])

    # --- edges ---
    def get_edge(self, _u: int, _v: int) -> int:
        nd = self._nd
        ed = self._ed
        u = nd[ND_HEADER][_u]
        v = nd[ND_HEADER][_v]
        eidx = int(nd[ND_EDGE][u])
        nodes = ed[ED_NODE]
        nxt = ed[ED_NEXT]
        while eidx:
            if nodes[eidx] == v:
                return eidx
            eidx = int(nxt[eidx])
        return 0

    def _new_edge(self, u: int, v: int, cov: int) -> int:
        if self._estate[1]:
            self._estate[1] -= 1
            eidx = int(self._ecyc[self._estate[1]])
        else:
            self._encap_edges(2)        # may rebind self._ed — fetch after
            eidx = self._elen
            self._elen += 2
        ed = self._ed
        for f in (ED_VST, ED_NEXT):
            ed[f][eidx] = 0
            ed[f][eidx + 1] = 0
        ed[ED_NODE][eidx] = v
        ed[ED_NODE][eidx + 1] = u
        ed[ED_COV][eidx] = cov
        ed[ED_COV][eidx + 1] = cov
        return eidx

    def _add_edge_core(self, v: int, eidx: int) -> None:
        """Insert into the cov-descending list; after equals (bspoa.h:464)."""
        nd = self._nd
        ed = self._ed
        if eidx & 1:
            nd[ND_NIN][v] += 1
            head_f = ND_EREV
        else:
            nd[ND_NOU][v] += 1
            head_f = ND_EDGE
        head = int(nd[head_f][v])
        ecov = ed[ED_COV][eidx]
        if head == 0:
            nd[head_f][v] = eidx
            return
        if ecov > ed[ED_COV][head]:
            ed[ED_NEXT][eidx] = head
            nd[head_f][v] = eidx
            return
        p = head
        nxt = ed[ED_NEXT]
        cov = ed[ED_COV]
        while nxt[p]:
            f = int(nxt[p])
            if ecov > cov[f]:
                break
            p = f
        nxt[eidx] = nxt[p]
        nxt[p] = eidx

    def _del_edge_core(self, v: int, eidx: int) -> None:
        nd = self._nd
        ed = self._ed
        head_f = ND_EREV if (eidx & 1) else ND_EDGE
        nxt = ed[ED_NEXT]
        cur = int(nd[head_f][v])
        prev = -1
        while cur:
            if cur == eidx:
                if prev < 0:
                    nd[head_f][v] = nxt[eidx]
                else:
                    nxt[prev] = nxt[eidx]
                nxt[eidx] = 0
                break
            prev = cur
            cur = int(nxt[cur])
        else:
            raise RuntimeError("edge not found")
        if eidx & 1:
            nd[ND_NIN][v] -= 1
        else:
            nd[ND_NOU][v] -= 1
            self._ecyc[self._estate[1]] = eidx
            self._estate[1] += 1

    def chg_edge(self, _u: Optional[int], _v: Optional[int], cov: int):
        """Returns (eidx_or_0, existed) (bspoa.h:561-606)."""
        if cov == 0 or _u is None or _v is None:
            return 0, 0
        if self._native is not None:
            self._encap_edges(4)
            return self._native.g_chg_edge(self, _u, _v, cov)
        nd = self._nd
        u = int(nd[ND_HEADER][_u])
        v = int(nd[ND_HEADER][_v])
        if u == v:
            return 0, 0
        eidx = self.get_edge(u, v)
        existed = 0
        if eidx == 0:
            ncov = cov
        else:
            existed = 1
            ncov = int(self._ed[ED_COV][eidx]) + cov
            self._del_edge_core(u, eidx)
            self._del_edge_core(v, eidx + 1)
        if ncov > 0:
            eidx = self._new_edge(u, v, ncov)
            self._add_edge_core(u, eidx)
            self._add_edge_core(v, eidx + 1)
            return eidx, existed
        return 0, existed

    # --- read-chain connectivity ---
    def connect_rdnode(self, rid: int, pos: int) -> None:
        nd = self._nd
        u = self.rdnode(rid, pos - 1)
        v = self.rdnode(rid, pos)
        if self._native is not None:
            self._encap_edges(4)
            self._native.g_connect(self, u, v)
            return
        if nd[ND_RDC][v]:
            return
        self.chg_edge(u, v, 1)
        nd[ND_RDD][u] = 1
        nd[ND_RDC][v] = 1

    def disconnect_rdnode(self, rid: int, pos: int) -> None:
        nd = self._nd
        u = self.rdnode(rid, pos - 1)
        v = self.rdnode(rid, pos)
        if self._native is not None:
            self._native.g_disconnect(self, u, v)
            return
        if nd[ND_RDD][u] == 0:
            return
        self.chg_edge(u, v, -1)
        nd[ND_RDD][u] = 0
        nd[ND_RDC][v] = 0

    # --- edge moving between ring members (bspoa.h:689-735) ---
    def _mov_node_edges(self, u: int, v: int, spec_node: Optional[int],
                        dirn: int, movtype: int) -> None:
        nd = self._nd
        ed = self._ed
        if spec_node is not None and spec_node < len(self.nodes):
            spec = int(nd[ND_HEADER][spec_node])
        else:
            spec = -1
        if self._native is not None:
            # bound on new edge pairs: 2 chg_edge calls per moved edge
            deg = int(nd[ND_NOU][u] if dirn == 0 else nd[ND_NIN][u])
            self._encap_edges(4 * deg + 8)
            self._native.g_mov_node_edges(self, u, v, spec, dirn, movtype)
            return
        eidx = int(nd[ND_EREV][u] if dirn else nd[ND_EDGE][u])
        chgs = []
        while eidx:
            ecov = int(ed[ED_COV][eidx])
            w = int(ed[ED_NODE][eidx])
            nxt = int(ed[ED_NEXT][eidx])
            if w == spec:
                covs = [0, ecov, 0, 0]
            else:
                covs = [ecov, 0, 0, 0]
            for i in range(2):
                for j in range(2):
                    t = (movtype >> (4 * (i * 2 + j))) & 0xF
                    if t == 0xF:
                        covs[3 - j] += covs[i]
                    elif t == 0xE:
                        covs[3 - j] += max(covs[i] - 1, 0)
                    elif t == 0x1:
                        covs[3 - j] += min(covs[i], 1)
            if dirn:
                chgs.append((w, u, covs[2] - ecov))
                chgs.append((w, v, covs[3]))
            else:
                chgs.append((u, w, covs[2] - ecov))
                chgs.append((v, w, covs[3]))
            eidx = nxt
        for a, b, c in chgs:
            self.chg_edge(a, b, c)

    def cut_rdnode(self, rid: int, pos: int, cut: int) -> int:
        """BSPOA_RDNODE_CUT{EDGE=1,NODE=2,ALL=3} (bspoa.h:741-795)."""
        nd = self._nd
        nidx = self.rdnode(rid, pos)
        if self._native is not None:
            deg = int(nd[ND_NOU][nidx]) + int(nd[ND_NIN][nidx]) + 2
            self._encap_edges(4 * deg + 16)
            return self._native.g_cut_rdnode(self, nidx, cut)
        node_after = nidx + 1
        node_before = nidx - 1
        header0 = int(nd[ND_HEADER][nidx])
        header1 = int(nd[ND_PREV][nidx])
        nodecov = self.get_nodecov(nidx)
        u_rdd = int(nd[ND_RDD][nidx])
        u_rdc = int(nd[ND_RDC][nidx])
        if (cut & 2) and int(nd[ND_NEXT][nidx]) != nidx:
            nxt = nd[ND_NEXT]
            prv = nd[ND_PREV]
            nxt[prv[nidx]] = nxt[nidx]
            prv[nxt[nidx]] = prv[nidx]
            nxt[nidx] = nidx
            prv[nidx] = nidx
            nd[ND_HEADER][nidx] = nidx
            if header0 == nidx:
                x = header1
                while True:
                    nd[ND_HEADER][x] = header1
                    if nxt[x] == header1:
                        break
                    x = int(nxt[x])
                xh = header1
                if u_rdd:
                    self._mov_node_edges(nidx, xh, node_after, 0, self.KPTONE)
                else:
                    self._mov_node_edges(nidx, xh, node_after, 0, self.MOVALL)
                if u_rdc:
                    self._mov_node_edges(nidx, xh, node_before, 1, self.KPTONE)
                else:
                    self._mov_node_edges(nidx, xh, node_before, 1, self.MOVALL)
                xref = xh
            else:
                xref = header0
                if u_rdd:
                    self._mov_node_edges(xref, nidx, node_after, 0,
                                         self.MOVONE)
                if u_rdc:
                    self._mov_node_edges(xref, nidx, node_before, 1,
                                         self.MOVONE)
            self.set_nodecov(xref, nodecov - 1)
            self.set_nodecov(nidx, 1)
        if cut & 1:
            self.disconnect_rdnode(rid, pos)
            self.disconnect_rdnode(rid, pos + 1)
        return nidx

    def merge_nodes(self, n1: int, n2: int) -> int:
        """Union two aligned rings (bspoa.h:797-894); returns new header."""
        nd = self._nd
        if self._native is not None:
            h1 = int(nd[ND_HEADER][n1])
            h2 = int(nd[ND_HEADER][n2])
            deg = (int(nd[ND_NOU][h1]) + int(nd[ND_NIN][h1])
                   + int(nd[ND_NOU][h2]) + int(nd[ND_NIN][h2]) + 2)
            self._encap_edges(4 * deg + 16)
            return self._native.g_merge_nodes(self, n1, n2)
        h0 = int(nd[ND_HEADER][n1])
        h1 = int(nd[ND_HEADER][n2])
        if h0 == h1:
            return h0
        nodecov = int(nd[ND_COV][h0]) + int(nd[ND_COV][h1])
        if nd[ND_COV][h0] < nd[ND_COV][h1]:
            h0, h1 = h1, h0
        elif nd[ND_COV][h0] > nd[ND_COV][h1]:
            pass
        elif nd[ND_RID][h0] > nd[ND_RID][h1]:
            h0, h1 = h1, h0
        self._mov_node_edges(h1, h0, None, 0, self.MOVALL)
        self._mov_node_edges(h1, h0, None, 1, self.MOVALL)
        nd[ND_COV][h0] = nodecov
        nxt = nd[ND_NEXT]
        x = h1
        while True:
            nd[ND_HEADER][x] = h0
            if nxt[x] == h1:
                break
            x = int(nxt[x])
        # splice the two rings (bspoa.h:879-892)
        prv = nd[ND_PREV]
        p0 = int(prv[h0])
        p1 = int(prv[h1])
        prv[h0] = p1
        prv[h1] = p0
        nxt[p1] = h0
        nxt[p0] = h1
        return h0

    def ring_members(self, u: int) -> List[int]:
        nxt = self._nd[ND_NEXT]
        out = [u]
        x = int(nxt[u])
        while x != u:
            out.append(x)
            x = int(nxt[x])
        return out

    def iter_edges(self, u: int, rev: bool):
        nd = self._nd
        ed = self._ed
        eidx = int(nd[ND_EREV][u] if rev else nd[ND_EDGE][u])
        nxt = ed[ED_NEXT]
        while eidx:
            n2 = int(nxt[eidx])
            yield eidx, EdgeRef(self, eidx)
            eidx = n2
