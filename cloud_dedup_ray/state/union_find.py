"""Union-find (disjoint set) with path compression + union by size.

Used by the near-dup tier to resolve verified candidate pairs into
connected components (clusters). The edge list after LSH banding +
verification is orders of magnitude smaller than the corpus (only docs
sharing a band bucket emit edges), so a driver-side union-find is the
right call at bench scale. The documented 10^12-scale upgrade is
iterative min-label propagation over the edge Dataset
(``groupby(node).aggregate(min(label))`` until fixpoint — O(log D)
rounds for diameter D) or the load-balanced BTS algorithm (PAPERS.md);
:class:`UnionFind` is behind the small ``add_edges / components`` API
so the reducer is swappable.
"""

from __future__ import annotations


class UnionFind:
    __slots__ = ("parent", "sz")

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}
        self.sz: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        if x not in p:
            p[x] = x
            self.sz[x] = 1
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.sz[ra] < self.sz[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.sz[ra] += self.sz[rb]

    def add_edges(self, pairs) -> None:
        for a, b in pairs:
            self.union(int(a), int(b))

    def components(self) -> dict[int, int]:
        """node → cluster id, where the cluster id is the component's
        minimum node id (deterministic, block-order independent)."""
        roots: dict[int, int] = {}
        for x in list(self.parent):
            r = self.find(x)
            cur = roots.get(r)
            if cur is None or x < cur:
                roots[r] = x
        return {x: roots[self.find(x)] for x in self.parent}
