"""Connected-components (large-star/small-star) vs brute-force union-find."""

import random

import pandas as pd

from warps_nutch_spark.operators.cc import connected_components


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _check(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    truth = _union_find(edges, nodes)
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"])
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == truth


def test_cc_chain_and_star(spark):
    # chain 1-2-3-4-5, star 10-{11,12,13}, pair (20,21), self-ish dup edges
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13),
             (20, 21), (21, 20), (2, 1)]
    _check(spark, edges)


def test_cc_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(50)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_cc_single_component_long_chain(spark):
    # worst-case diameter: a 40-node path must still converge in
    # O(log^2 n) alternating rounds, not O(diameter)
    edges = [(i, i + 1) for i in range(40)]
    _check(spark, edges)
