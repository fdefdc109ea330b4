"""Round-12 additions: q_quality_buckets (CCNet-style per-language
quality terciles) and q_url_normalize (URL canonicalization + dedup).
"""

from __future__ import annotations

from collections import Counter

from news_categorization_big_data_spark.plans import REGISTRY


def test_quality_buckets_partition_and_label_shape(spark, sf_dir):
    rows = REGISTRY["q_quality_buckets"].builder(spark, sf_dir).collect()
    assert rows
    assert {r["bucket"] for r in rows} <= {"head", "middle", "tail"}
    # ntile(3): per language, bucket sizes differ by at most 1 and
    # every bucket is populated once a language has >= 3 docs.
    per_lang = Counter((r["lang"], r["bucket"]) for r in rows)
    langs = {r["lang"] for r in rows}
    for lang in langs:
        sizes = [per_lang[(lang, b)] for b in ("head", "middle", "tail")]
        if sum(sizes) >= 3:
            assert max(sizes) - min(sizes) <= 1, (lang, sizes)


def test_quality_buckets_head_is_lowest_rarity(spark, sf_dir):
    """Within a language every head-bucket score <= every tail-bucket
    score (CCNet orientation: most-fluent third is 'head')."""
    rows = REGISTRY["q_quality_buckets"].builder(spark, sf_dir).collect()
    by_lang: dict[str, dict[str, list[int]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(
            r["mean_rarity_milli"]
        )
    for lang, buckets in by_lang.items():
        if "head" in buckets and "tail" in buckets:
            assert max(buckets["head"]) <= min(buckets["tail"]), lang


def test_url_normalize_merges_param_free_raw_spellings(spark, sf_dir):
    """Since round 13 each bucket plants FOUR raw variants (mod-4:
    uppercase https://WWW+slash, utm-first+surviving ref param,
    www+fragment, consecutive-utm+slash); the three param-free
    spellings must merge into one canonical group (n_raw_forms == 3
    once a bucket collects them all) while the ref= variant keeps its
    own group through the '&'→'?' promotion — and no canonical form
    may retain scheme, www., utm params, fragments, a trailing slash,
    or a dangling separator."""
    rows = REGISTRY["q_url_normalize"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        u = r["url_canonical"]
        assert u == u.lower()
        assert not u.startswith(("http", "www."))
        assert "utm_" not in u and not u.endswith(("/", "?", "&")) and "#" not in u
        assert r["n_docs"] >= r["n_raw_forms"] >= 1
        if "?" in u:  # the surviving-param group, promoted '&'→'?'
            assert u.count("?") == 1 and "ref=" in u.split("?", 1)[1]
    # sf0.001+ has enough docs that buckets collect all three
    # param-free spellings
    assert any(r["n_raw_forms"] == 3 for r in rows)
    assert any("?ref=" in r["url_canonical"] for r in rows)


def test_url_normalize_keeper_is_min_doc(spark, sf_dir):
    rows = REGISTRY["q_url_normalize"].builder(spark, sf_dir).collect()
    # keeper_doc's own canonical form must be the group it keys
    # (re-derive: bucket = keeper % 1000 appears in the canonical URL)
    for r in rows:
        assert str(r["keeper_doc"] % 21) in r["url_canonical"]
