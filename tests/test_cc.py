"""Label-propagation CC must equal driver union-find (SURVEY §4.5)."""

from __future__ import annotations

import random

import pyarrow as pa
import ray.data as rd

from kgforge.dedup_core import UnionFind
from kgforge.steps.cc import cc_label_propagation


def _random_edges(n_nodes=80, n_edges=100, seed=5):
    rng = random.Random(seed)
    nodes = [f"n{i:04d}" for i in range(n_nodes)]
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    # add a long chain to force multiple propagation rounds
    chain = [f"c{i:03d}" for i in range(16)]
    for i in range(len(chain) - 1):
        edges.add((chain[i], chain[i + 1]))
    return sorted(edges)


def test_label_propagation_equals_union_find():
    edges = _random_edges()
    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in edges], pa.string()),
                "b": pa.array([b for _, b in edges], pa.string()),
            }
        )
    )
    got = {
        r["node"]: r["label"] for r in cc_label_propagation(ds).take_all()
    }
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    want = uf.canonical_map()
    assert got == want
