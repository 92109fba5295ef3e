"""Single-process union-find — the test oracle for distributed clustering.

Used by the golden-fixture tests (FIXTURES.md §3: expected clusters are
produced by a small single-process oracle) and never on the hot path.
"""

from __future__ import annotations


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            root = self.find(p)
            self.parent[x] = root
            return root
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # canonical representative = lexicographic min, so cluster ids
            # are stable regardless of edge order
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo

    def components(self, all_nodes=()) -> dict[str, str]:
        for n in all_nodes:
            self.find(n)
        # path-compress everything, then re-canonicalize to min member
        roots: dict[str, list[str]] = {}
        for n in list(self.parent):
            roots.setdefault(self.find(n), []).append(n)
        out: dict[str, str] = {}
        for members in roots.values():
            rep = min(members)
            for m in members:
                out[m] = rep
        return out


def cluster_edges(edges, all_nodes=()) -> dict[str, str]:
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.components(all_nodes)
