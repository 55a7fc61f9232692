"""Single-node union-find — oracle-side connected components (stage S8).

The distributed engine uses alternating large-star/small-star DataFrame
iterations (engine/cluster.py); this kernel provides the exact component
golden truth the engine must reproduce (cluster_id = min member id).
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        root = x
        while p != root:
            root = p
            p = self.parent.setdefault(p, p)
        # path compression
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # min-id root → cluster_id = min(clip_id) falls out of find()
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra


def components(pairs: list[tuple[str, str]], all_ids: list[str] | np.ndarray
               ) -> dict[str, str]:
    """(a, b) edges + universe of ids → {clip_id: cluster_id(min member)}."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return {i: uf.find(i) for i in all_ids}
