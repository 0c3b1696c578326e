"""POA graph data model: nodes, paired edges, aligned-node rings.

Mirrors the reference's semantics (bspoa.h:28-101, 394-902): nodes carry a
circular "aligned ring" (next/prev/header); edges come in fwd/rev pairs at
even/odd indices with per-node linked lists kept sorted by coverage
descending (insertion after equals — iteration order is a tie-break input to
alignment, so it must match exactly).
"""
from __future__ import annotations

from typing import List, Optional


class Node:
    __slots__ = ("rid", "base", "ref", "aux", "colorful", "inuse", "bonus",
                 "bless", "rdc", "rdd", "vst", "nin", "nou", "nct", "cov",
                 "pos", "mpos", "cpos", "rpos", "edge", "erev", "next",
                 "prev", "header", "mmidx")

    def __init__(self, idx: int, rid: int, pos: int, base: int):
        self.rid = rid
        self.base = base
        self.ref = 0
        self.aux = 0
        self.colorful = 0
        self.inuse = 0
        self.bonus = 0
        self.bless = 0
        self.rdc = 0
        self.rdd = 0
        self.vst = 0
        self.nin = 0
        self.nou = 0
        self.nct = 0
        self.cov = 1
        self.pos = pos
        self.mpos = 0
        self.cpos = 0
        self.rpos = 0
        self.edge = 0
        self.erev = 0
        self.next = idx
        self.prev = idx
        self.header = idx
        self.mmidx = 0


class Edge:
    __slots__ = ("node", "cov", "vst", "next")

    def __init__(self):
        self.node = 0
        self.cov = 0
        self.vst = 0
        self.next = 0


class Graph:
    """Node/edge store with the reference's exact list disciplines."""

    def __init__(self):
        self.nodes: List[Node] = []
        self.edges: List[Edge] = [Edge(), Edge()]  # idx 0/1 reserved
        self.ecycs: List[int] = []
        self.HEAD = 0
        self.TAIL = 1
        self.ndoffs: List[int] = []

    # --- nodes ---
    def new_node(self, rid: int, pos: int, base: int) -> int:
        idx = len(self.nodes)
        self.nodes.append(Node(idx, rid, pos, base))
        return idx

    def rdnode(self, rid: int, pos: int) -> int:
        return self.ndoffs[rid] + pos

    def n(self, idx: int) -> Node:
        return self.nodes[idx]

    def set_nodecov(self, u: int, cov: int) -> None:
        self.nodes[self.nodes[u].header].cov = cov

    def get_nodecov(self, u: int) -> int:
        return self.nodes[self.nodes[u].header].cov

    # --- edges ---
    def get_edge(self, _u: int, _v: int) -> int:
        u = self.nodes[_u].header
        v = self.nodes[_v].header
        eidx = self.nodes[u].edge
        while eidx:
            e = self.edges[eidx]
            if e.node == v:
                return eidx
            eidx = e.next
        return 0

    def _new_edge(self, u: int, v: int, cov: int) -> int:
        if self.ecycs:
            eidx = self.ecycs.pop()
            e = self.edges[eidx]
            r = self.edges[eidx + 1]
            e.next = r.next = 0
            e.vst = r.vst = 0
        else:
            eidx = len(self.edges)
            e = Edge()
            r = Edge()
            self.edges.append(e)
            self.edges.append(r)
        e.node = v
        r.node = u
        e.cov = cov
        r.cov = cov
        return eidx

    def _add_edge_core(self, v: int, eidx: int) -> None:
        """Insert into the cov-descending list; after equals (bspoa.h:464)."""
        nd = self.nodes[v]
        if eidx & 1:
            nd.nin += 1
            head_attr = "erev"
        else:
            nd.nou += 1
            head_attr = "edge"
        head = getattr(nd, head_attr)
        e = self.edges[eidx]
        if head == 0:
            setattr(nd, head_attr, eidx)
            return
        p = self.edges[head]
        if e.cov > p.cov:
            e.next = head
            setattr(nd, head_attr, eidx)
            return
        while p.next:
            f = self.edges[p.next]
            if e.cov > f.cov:
                break
            p = f
        e.next = p.next
        p.next = eidx

    def _del_edge_core(self, v: int, eidx: int) -> None:
        nd = self.nodes[v]
        head_attr = "erev" if (eidx & 1) else "edge"
        prev: Optional[Edge] = None
        cur = getattr(nd, head_attr)
        while cur:
            if cur == eidx:
                e = self.edges[eidx]
                if prev is None:
                    setattr(nd, head_attr, e.next)
                else:
                    prev.next = e.next
                e.next = 0
                break
            prev = self.edges[cur]
            cur = prev.next
        else:
            raise RuntimeError("edge not found")
        if eidx & 1:
            nd.nin -= 1
        else:
            nd.nou -= 1
            self.ecycs.append(eidx)

    def chg_edge(self, _u: Optional[int], _v: Optional[int], cov: int):
        """Returns (eidx_or_0, existed) (bspoa.h:561-606)."""
        if cov == 0 or _u is None or _v is None:
            return 0, 0
        u = self.nodes[_u].header
        v = self.nodes[_v].header
        if u == v:
            return 0, 0
        eidx = self.get_edge(u, v)
        existed = 0
        if eidx == 0:
            ncov = cov
        else:
            existed = 1
            ncov = self.edges[eidx].cov + cov
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
        u = self.rdnode(rid, pos - 1)
        v = self.rdnode(rid, pos)
        if self.nodes[v].rdc:
            return
        self.chg_edge(u, v, 1)
        self.nodes[u].rdd = 1
        self.nodes[v].rdc = 1

    def disconnect_rdnode(self, rid: int, pos: int) -> None:
        u = self.rdnode(rid, pos - 1)
        if self.nodes[u].rdd == 0:
            return
        v = self.rdnode(rid, pos)
        self.chg_edge(u, v, -1)
        self.nodes[u].rdd = 0
        self.nodes[v].rdc = 0

    # --- edge moving between ring members (bspoa.h:689-735) ---
    MOVALL = 0x0F0F
    KPTONE = 0x1E0F
    MOVONE = 0xE1F0

    def _mov_node_edges(self, u: int, v: int, spec_node: Optional[int],
                        dirn: int, movtype: int) -> None:
        if spec_node is not None and spec_node < len(self.nodes):
            spec = self.nodes[spec_node].header
        else:
            spec = -1
        un = self.nodes[u]
        eidx = un.erev if dirn else un.edge
        chgs = []
        while eidx:
            e = self.edges[eidx]
            eidx = e.next
            ecov = e.cov
            w = e.node
            if e.node == spec:
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
        for a, b, c in chgs:
            self.chg_edge(a, b, c)

    def cut_rdnode(self, rid: int, pos: int, cut: int) -> int:
        """BSPOA_RDNODE_CUT{EDGE=1,NODE=2,ALL=3} (bspoa.h:741-795)."""
        nidx = self.rdnode(rid, pos)
        u = self.nodes[nidx]
        node_after = nidx + 1
        node_before = nidx - 1
        header0 = u.header
        header1 = u.prev
        nodecov = self.get_nodecov(nidx)
        if (cut & 2) and u.next != nidx:
            x = self.nodes[u.prev]
            x.next = u.next
            x = self.nodes[u.next]
            x.prev = u.prev
            u.next = nidx
            u.prev = nidx
            u.header = nidx
            if header0 == nidx:
                x = self.nodes[header1]
                while True:
                    x.header = header1
                    if x.next == header1:
                        break
                    x = self.nodes[x.next]
                xh = header1
                if u.rdd:
                    self._mov_node_edges(nidx, xh, node_after, 0, self.KPTONE)
                else:
                    self._mov_node_edges(nidx, xh, node_after, 0, self.MOVALL)
                if u.rdc:
                    self._mov_node_edges(nidx, xh, node_before, 1, self.KPTONE)
                else:
                    self._mov_node_edges(nidx, xh, node_before, 1, self.MOVALL)
                xref = xh
            else:
                xref = header0
                if u.rdd:
                    self._mov_node_edges(xref, nidx, node_after, 0, self.MOVONE)
                if u.rdc:
                    self._mov_node_edges(xref, nidx, node_before, 1, self.MOVONE)
            self.set_nodecov(xref, nodecov - 1)
            self.set_nodecov(nidx, 1)
        if cut & 1:
            self.disconnect_rdnode(rid, pos)
            self.disconnect_rdnode(rid, pos + 1)
        return nidx

    def merge_nodes(self, n1: int, n2: int) -> int:
        """Union two aligned rings (bspoa.h:797-894); returns new header."""
        h0 = self.nodes[n1].header
        h1 = self.nodes[n2].header
        if h0 == h1:
            return h0
        a, b = self.nodes[h0], self.nodes[h1]
        nodecov = a.cov + b.cov
        if a.cov < b.cov:
            h0, h1 = h1, h0
        elif a.cov > b.cov:
            pass
        elif a.rid > b.rid:
            h0, h1 = h1, h0
        self._mov_node_edges(h1, h0, None, 0, self.MOVALL)
        self._mov_node_edges(h1, h0, None, 1, self.MOVALL)
        ns0, ns1 = self.nodes[h0], self.nodes[h1]
        ns0.cov = nodecov
        x = ns1
        while True:
            x.header = h0
            if x.next == h1:
                break
            x = self.nodes[x.next]
        # splice the two rings (bspoa.h:879-892)
        p0 = ns0.prev
        p1 = ns1.prev
        ns0.prev = p1
        ns1.prev = p0
        self.nodes[p1].next = h0
        self.nodes[p0].next = h1
        return h0

    def ring_members(self, u: int) -> List[int]:
        out = [u]
        x = self.nodes[u].next
        while x != u:
            out.append(x)
            x = self.nodes[x].next
        return out

    def iter_edges(self, u: int, rev: bool):
        eidx = self.nodes[u].erev if rev else self.nodes[u].edge
        while eidx:
            e = self.edges[eidx]
            nxt = e.next
            yield eidx, e
            eidx = nxt
