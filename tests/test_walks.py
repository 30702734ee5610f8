"""Deterministic hash walks vs a python step-by-step oracle."""

import hashlib

import pytest

from deepgraph_spark.algorithms import random_walks
from oracles import random_digraph


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute(edges, walk_length, seed, directed=False):
    adj = {}
    for s, t in edges:
        s, t = int(s), int(t)
        if s == t:
            continue
        adj.setdefault(s, set()).add(t)
        if not directed:
            adj.setdefault(t, set()).add(s)
    ranked = {v: sorted(ns) for v, ns in adj.items()}
    rows = set()
    for start in ranked:
        c = start
        rows.add((start, 0, start))
        for i in range(walk_length):
            ns = ranked.get(c)
            if not ns:
                break  # dead end: walk stops early
            c = ns[_hash60(f"{start}:{seed}:{i}:{c}") % len(ns)]
            rows.add((start, i + 1, c))
    return rows


def _run(spark, edges, **kw):
    e = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "s long, t long")
    return {
        (r["start"], r["step"], r["vertex"])
        for r in random_walks(e, **kw).collect()
    }


@pytest.mark.parametrize("seed,n,m", [(0, 25, 60), (1, 30, 120)])
def test_walks_vs_brute(spark, seed, n, m):
    e = random_digraph(n, m, seed=seed)
    assert _run(spark, e, walk_length=4, seed=7) == _brute(e, 4, 7)


def test_walks_directed_dead_ends_stop(spark):
    # chain 0->1->2: from 2 there is no out-neighbor, walk stops at step 0;
    # from 0 the walk is forced down the chain then stops
    e = [(0, 1), (1, 2)]
    got = _run(spark, e, walk_length=4, seed=7, directed=True)
    assert got == _brute(e, 4, 7, directed=True)
    assert (2, 1, 1) not in got  # no backtracking in directed mode
    assert (0, 1, 1) in got and (0, 2, 2) in got


def test_walks_seed_changes_corpus(spark):
    e = random_digraph(25, 120, seed=3)
    a = _run(spark, e, walk_length=4, seed=7)
    b = _run(spark, e, walk_length=4, seed=8)
    assert a != b
    # but each is reproducible
    assert a == _run(spark, e, walk_length=4, seed=7)


def test_walk_length_validated(spark):
    with pytest.raises(ValueError, match="walk_length"):
        _run(spark, [(0, 1)], walk_length=0)
