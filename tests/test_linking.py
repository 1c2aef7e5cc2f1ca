import pytest
from pyspark.sql import functions as F

from kg.linking import (
    band_keys,
    connected_components,
    jaccard,
    link_local,
    link_mentions,
    minhash_signature,
    shingle_hashes,
    _hash_params,
)


def test_shingles_deterministic_and_short_strings():
    a = shingle_hashes("中国致公党")
    b = shingle_hashes("中国致公党")
    assert sorted(a.tolist()) == sorted(b.tolist())
    assert shingle_hashes("中").size == 1  # < k chars: whole string


def test_jaccard_bounds():
    assert jaccard("abcd", "abcd") == 1.0
    assert jaccard("abcd", "wxyz") == 0.0
    assert 0.0 < jaccard("abcdef", "abcdeg") < 1.0


def test_minhash_approximates_jaccard():
    a, b = _hash_params(num_hashes=256)
    s1, s2 = "中国人民解放军总政治部", "中国人民解放军总参谋部"
    m1 = minhash_signature(s1, a, b)
    m2 = minhash_signature(s2, a, b)
    est = (m1 == m2).mean()
    true = jaccard(s1, s2)
    assert abs(est - true) < 0.2


def test_band_keys_shape():
    a, b = _hash_params()
    keys = band_keys(minhash_signature("北京市政府", a, b))
    assert len(keys) == 4 and len(set(keys)) == len(keys) or len(set(keys)) <= 4


def test_link_local_merges_variants():
    texts = [
        "中国人民解放军总政治部",
        "中国人民解放军总政治部门",  # near-duplicate -> merges
        "北京",  # singleton
    ]
    m = link_local(texts)
    assert m["中国人民解放军总政治部门"] == m["中国人民解放军总政治部"]
    assert m["北京"] == "北京"


def test_spark_linking_matches_local(spark):
    texts = [
        "中国人民解放军总政治部",
        "中国人民解放军总政治部门",
        "中华人民共和国国务院",
        "中华人民共和国国务院办公厅",
        "北京",
        "上海",
        "中国致公党第十一次全国代表大会",
        "中国致公党第十一次全国代表大会主席团",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "mention string")
    got = {r.mention: r.canonical for r in link_mentions(df).collect()}
    want = link_local(texts)
    assert got == want
    # at least one non-trivial merge actually happened
    assert any(k != v for k, v in got.items())


def test_salted_pairs_equal_plain_pairs(spark):
    from itertools import combinations

    from kg.linking import candidate_pairs

    # one hot bucket (40 members > salt_threshold) + one cold bucket
    rows = [(f"m{i:02d}", "HOT") for i in range(40)] + [
        ("a", "COLD"), ("b", "COLD")
    ]
    buckets = spark.createDataFrame(rows, "mention string, bucket string")
    got = {(r.m1, r.m2) for r in candidate_pairs(buckets).collect()}
    hot_members = sorted(f"m{i:02d}" for i in range(40))
    want = set(combinations(hot_members, 2)) | {("a", "b")}
    assert got == want  # salting loses no pair and invents none


def test_linking_verify_join_carries_no_text(spark):
    """VERDICT r4 item 3 (the kg/ops/dedup.py discipline, r2 item 2): no
    mention text crosses the candidate-pair shuffle — the verify runs
    JVM-side over shingle-hash arrays keyed by surrogate ids, and no
    Python kernel exists past the signature pass."""
    from kg.linking import mention_edge_ids, mention_shingle_buckets

    texts = ["alpha beta gamma", "alpha beta gamme", "unrelated thing"]
    df = spark.createDataFrame([(t,) for t in texts], "mention string")
    base = (
        mention_shingle_buckets(df)
        .withColumn("mid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    assert set(base.columns) == {"mention", "shingles", "buckets", "mid"}
    core = base.select("mid", "shingles", "buckets").localCheckpoint()
    plan = mention_edge_ids(core)._jdf.queryExecution().analyzed().toString()
    assert "array_intersect" in plan
    assert "mention" not in plan  # text stops at the (checkpointed) kernel
    assert "MapInPandas" not in plan  # verify is not a Python kernel


def test_verified_edge_ids_matches_python_jaccard(spark):
    """The JVM array_intersect verify computes the SAME exact Jaccard as
    the driver-side twin (shared shingle function), threshold inclusive."""
    from kg.linking import mention_edge_ids, mention_shingle_buckets

    texts = [
        "中国人民解放军总政治部",
        "中国人民解放军总政治部门",
        "中华人民共和国国务院",
        "北京",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "mention string")
    base = (
        mention_shingle_buckets(df)
        .withColumn("mid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    idmap = {r.mid: r.mention for r in base.select("mid", "mention").collect()}
    core = base.select("mid", "shingles", "buckets").localCheckpoint()
    got = {
        tuple(sorted((idmap[r.m1], idmap[r.m2]))): r.sim
        for r in mention_edge_ids(core, threshold=0.0).collect()
    }
    assert got, "candidates must exist on these near-duplicates"
    for (t1, t2), sim in got.items():
        assert sim == pytest.approx(jaccard(t1, t2), abs=1e-12)


def test_mega_bucket_dropped(spark):
    from kg.linking import candidate_pairs

    rows = [(f"x{i:03d}", "MEGA") for i in range(300)]
    buckets = spark.createDataFrame(rows, "mention string, bucket string")
    assert candidate_pairs(buckets, max_bucket=200).count() == 0


import pytest as _pytest


@_pytest.mark.parametrize("sg_threshold", [500_000, 0], ids=["small-path", "distributed"])
def test_connected_components_chain(spark, sg_threshold):
    # adversarial chain a-b-c-d-e: converges to min label 'a'
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "m1 string, m2 string",
    )
    comp = {
        r.mention: r.canonical
        for r in connected_components(edges, small_graph_threshold=sg_threshold).collect()
    }
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "a", "x": "x", "y": "x"}


def test_connected_components_long_chain_converges_fast(spark):
    # 64-node path: diameter 63; pointer jumping must converge well inside
    # max_iters=10 (plain propagation would need ~63 rounds)
    n = 64
    names = [f"n{i:03d}" for i in range(n)]
    edges = spark.createDataFrame(
        [(names[i], names[i + 1]) for i in range(n - 1)], "m1 string, m2 string"
    )
    comp = {
        r.mention: r.canonical
        for r in connected_components(
            edges, max_iters=10, small_graph_threshold=0
        ).collect()
    }
    assert set(comp.values()) == {"n000"}
    assert len(comp) == n


@_pytest.mark.parametrize("sg_threshold", [500_000, 0], ids=["small-path", "distributed"])
def test_connected_components_random_graph_matches_union_find(spark, sg_threshold):
    import random

    rng = random.Random(5)
    nodes = [f"v{i:02d}" for i in range(30)]
    pairs = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(25)})
    edges = spark.createDataFrame(pairs, "m1 string, m2 string")

    parent = {x: x for x in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in nodes if any(x in p for p in pairs)}

    got = {
        r.mention: r.canonical
        for r in connected_components(edges, small_graph_threshold=sg_threshold).collect()
    }
    # canonical = lexicographic min of component in both
    comp_min = {}
    for x, r in want.items():
        comp_min.setdefault(r, []).append(x)
    want_min = {x: min(members) for r, members in comp_min.items() for x in members}
    assert got == want_min


def test_cc_resumes_from_iteration_checkpoint(spark, tmp_path):
    """Kill-between-iterations recovery (VERDICT r1 item 7): with a
    StageCatalog, every k-th CC round is durably committed keyed by the
    edge-set fingerprint; a rerun resumes from the last committed round
    (skips it) instead of restarting propagation, and a rerun after
    convergence reuses the final stage without recomputing anything."""
    from kg.catalog import StageCatalog

    n = 40  # chain 0-1-...-40: needs several pointer-jumping rounds
    edges = spark.createDataFrame(
        [(f"m{i:03d}", f"m{i + 1:03d}") for i in range(n)], "m1 string, m2 string"
    )
    cat1 = StageCatalog(spark, str(tmp_path / "cc"))
    got1 = {
        r.mention: r.canonical
        for r in connected_components(
            edges, catalog=cat1, checkpoint_every=1, small_graph_threshold=0
        ).collect()
    }
    assert set(got1.values()) == {"m000"} and len(got1) == n + 1
    iters1 = [s for s in cat1.executed if "_iter" in s]
    assert len(iters1) >= 2, "chain must take multiple committed rounds"
    assert cat1.executed[-1] == "cc_final"

    # simulated kill after the last committed round: a fresh catalog on the
    # same dir with the final stage wiped must NOT recompute earlier rounds
    import shutil

    shutil.rmtree(tmp_path / "cc" / "cc_final")
    cat2 = StageCatalog(spark, str(tmp_path / "cc"))
    got2 = {
        r.mention: r.canonical
        for r in connected_components(
            edges, catalog=cat2, checkpoint_every=1, small_graph_threshold=0
        ).collect()
    }
    assert got2 == got1
    assert [s for s in cat2.executed if "_iter" in s] == []  # all rounds reused
    assert "cc_final" in cat2.executed

    # converged run: everything (incl. final) reused, zero recompute
    cat3 = StageCatalog(spark, str(tmp_path / "cc"))
    got3 = {
        r.mention: r.canonical
        for r in connected_components(
            edges, catalog=cat3, checkpoint_every=1, small_graph_threshold=0
        ).collect()
    }
    assert got3 == got1 and cat3.executed == []

    # changed edge set: stale rounds must not be reused (token mismatch)
    edges2 = spark.createDataFrame(
        [(f"m{i:03d}", f"m{i + 1:03d}") for i in range(n + 2)],
        "m1 string, m2 string",
    )
    cat4 = StageCatalog(spark, str(tmp_path / "cc"))
    got4 = {
        r.mention: r.canonical
        for r in connected_components(
            edges2, catalog=cat4, checkpoint_every=1, small_graph_threshold=0
        ).collect()
    }
    assert len(got4) == n + 3 and set(got4.values()) == {"m000"}
    assert any("_iter" in s for s in cat4.executed)


def test_cc_fingerprint_distinguishes_duplicate_multisets(spark, tmp_path):
    """ADVICE r2: xor alone cancels duplicate rows pairwise, so {a-b, c-d,
    c-d} and {a-b, e-f, e-f} (equal size, xor-colliding duplicates) must
    NOT reuse each other's committed labels — the sum component of the
    token distinguishes multiplicity."""
    from kg.catalog import StageCatalog

    e1 = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("c", "d")], "m1 string, m2 string"
    )
    e2 = spark.createDataFrame(
        [("a", "b"), ("e", "f"), ("e", "f")], "m1 string, m2 string"
    )
    cat = StageCatalog(spark, str(tmp_path / "fp"))
    got1 = {r.mention: r.canonical for r in connected_components(e1, catalog=cat).collect()}
    assert got1 == {"a": "a", "b": "a", "c": "c", "d": "c"}
    cat2 = StageCatalog(spark, str(tmp_path / "fp"))
    got2 = {r.mention: r.canonical for r in connected_components(e2, catalog=cat2).collect()}
    assert got2 == {"a": "a", "b": "a", "e": "e", "f": "e"}
    assert "cc_final" in cat2.executed  # token mismatch -> recomputed
