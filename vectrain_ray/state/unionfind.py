"""Union-find (disjoint set) with path compression + union by size.

Used for near-duplicate entity-cluster merging (stages/canonicalize.py) and
connected components over candidate dup pairs (functions/dedup.py). Runs on
the driver ONLY over verified candidate-pair lists, which are small by
construction; full-corpus components use distributed min-label propagation
instead (functions/dedup.connected_components_ds).
"""

from __future__ import annotations


class UnionFind:
    def __init__(self):
        self.parent: dict = {}
        self.size: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p == x:
            self.size.setdefault(x, 1)
            return x
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return ra
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]
        return ra

    def groups(self) -> dict:
        """root → sorted members (deterministic iteration)."""
        out: dict = {}
        for x in sorted(self.parent, key=str):
            out.setdefault(self.find(x), []).append(x)
        return out
