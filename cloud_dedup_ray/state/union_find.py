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


def label_propagation_components(
    edges: "ray.data.Dataset", max_iters: int = 64, num_partitions: int = 8
) -> dict[int, int]:
    """Distributed connected components via iterative min-label
    propagation — the 10^12-scale swap-in for the driver-side
    :class:`UnionFind` (same contract: node → min-node-id of component).

    ``edges`` is a Dataset with int64 columns ``a``, ``b``. Each round
    every node takes the minimum label among itself and its neighbors
    (one hash-join of the adjacency against the label table + one
    groupby-min — two shuffles per round); convergence in O(diameter)
    rounds, detected by the monotone label-sum fixpoint (labels only
    decrease, so an unchanged sum ⇔ fixpoint, no extra join needed).
    The chain+star edge sets emitted for capped LSH buckets keep
    component diameter ≈ 2, so a handful of rounds suffice in practice.
    """
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Min, Sum

    def _explode(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"], np.int64)
        b = np.asarray(t["b"], np.int64)
        return pa.table(
            {
                "node": np.concatenate([a, b]),
                "nbr": np.concatenate([b, a]),
            }
        )

    adj = edges.map_batches(_explode, batch_format="pyarrow").materialize()
    if adj.count() == 0:
        return {}

    # label(0) = min(node, min neighbor)
    labels = (
        adj.groupby("node")
        .aggregate(Min("nbr", alias_name="label"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "label": pa.compute.min_element_wise(t["node"], t["label"]),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    for _ in range(max_iters):
        # neighbor labels: adjacency ⋈ labels on nbr
        prop = adj.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("nbr",), right_on=("node",), right_suffix="_r",
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        # pointer-doubling shortcut: label(label(n)) — a label is itself
        # a node id, so joining the label table against itself halves
        # the remaining propagation depth each round (O(log diameter)
        # total instead of O(diameter) on chains). The right side is
        # renamed first: a literal self-join of one Dataset object
        # confuses the hash-join key resolution.
        rhs = labels.map_batches(
            lambda t: pa.table({"src": t["node"], "lab2": t["label"]}),
            batch_format="pyarrow",
        ).materialize()  # break shared lineage — joining a dataset with
        # a lazy derivative of itself misroutes blocks in the hash join
        shortcut = labels.join(
            rhs, join_type="inner", num_partitions=num_partitions,
            on=("label",), right_on=("src",),
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["lab2"]}),
            batch_format="pyarrow",
        )
        labels = (
            prop.union(shortcut)
            .union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return {
        int(r["node"]): int(r["label"])
        for r in labels.iter_rows()
    }
