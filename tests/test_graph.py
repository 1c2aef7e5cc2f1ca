"""entity_pagerank: distributed power iteration vs a pure-Python twin,
stochastic-completion invariant (total rank 1.0), self-loop exclusion."""

import pytest
from pyspark.sql import Row

from kg.graph import entity_pagerank


def pagerank_local(links, damping=0.85, n_iters=3):
    """Driver-side twin: same fixed-point arithmetic as kg/graph.py."""
    nodes = sorted({x for e in links for x in e})
    n = len(nodes)
    out: dict[str, list[str]] = {}
    for s, t in links:
        out.setdefault(s, []).append(t)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(n_iters):
        dang = sum(pr[v] for v in nodes if v not in out)
        new = {v: (1.0 - damping) / n + damping * dang / n for v in nodes}
        for s, ts in out.items():
            for t in ts:
                new[t] += damping * pr[s] / len(ts)
        pr = new
    return pr


def _edges_df(spark, links):
    return spark.createDataFrame(
        [Row(subj=s, pred="rel", obj=t, doc_id="d0", weight=1.0) for s, t in links]
    )


def test_pagerank_matches_local_twin(spark):
    links = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("d", "a"),
        ("e", "a"), ("e", "b"), ("c", "c"),  # self-loop: must be ignored
    ]
    got = {
        r["entity_id"]: r["pagerank"]
        for r in entity_pagerank(_edges_df(spark, links)).collect()
    }
    want = pagerank_local([(s, t) for s, t in links if s != t])
    assert set(got) == set(want)
    for v, pr in want.items():
        assert got[v] == pytest.approx(pr, abs=1e-8)


def test_pagerank_mass_conserved(spark):
    # chain with a dangling tail: without stochastic completion the mass
    # leaks out of 'd' every iteration
    links = [("a", "b"), ("b", "c"), ("c", "d")]
    rows = entity_pagerank(_edges_df(spark, links), n_iters=5).collect()
    assert sum(r["pagerank"] for r in rows) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_sink_accumulates(spark):
    # star into a sink: the sink must outrank every spoke
    links = [("s1", "hub"), ("s2", "hub"), ("s3", "hub")]
    got = {
        r["entity_id"]: r["pagerank"]
        for r in entity_pagerank(_edges_df(spark, links)).collect()
    }
    assert got["hub"] > max(got["s1"], got["s2"], got["s3"])
