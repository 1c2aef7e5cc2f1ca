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


def test_connected_components_chain(spark):
    # adversarial chain a-b-c-d-e: converges to min label 'a'
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "m1 string, m2 string",
    )
    comp = {r.mention: r.canonical for r in connected_components(edges).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "a", "x": "x", "y": "x"}
