"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The scale architecture (100 TB of documents):

- **exact**: hash the text to a 16-byte key, groupBy the hash — the
  shuffle carries keys, never documents.
- **n-gram Jaccard (exact near-dup)**: explode distinct k-word shingles,
  self-join on shingle, count intersections. The join key distribution
  is the shingle document-frequency distribution — cap it (drop shingles
  appearing in > max_df docs, which carry no discriminative signal) so
  no reducer sees a quadratic bucket.
- **MinHash + LSH (approximate near-dup, the scale path)**: fixed-size
  signature per doc (k min-hashes), banded into b bands; candidate pairs
  are equi-joins on (band_index, band_hash) — linear shuffle, no
  pairwise work outside buckets. Jaccard is then verified exactly on the
  candidates only.
- **SimHash**: per-doc 16-bit sketch whose Hamming distance approximates
  cosine over the token multiset; near-dup candidates share the sketch.

All hashes are md5-derived (functions/hashing.py) so every stage is
reproducible in the DuckDB oracle; swap hash60 → xxhash64 for ~3-5x
faster hashing when cross-engine reproducibility isn't required.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from news_categorization_big_data_spark.functions.hashing import (
    hash60,
    hash60_pair,
    hash_bits,
)
from news_categorization_big_data_spark.functions.groupcollapse import grouped_ids
from news_categorization_big_data_spark.functions.partitioning import fan_out
from news_categorization_big_data_spark.functions.text_exprs import word_shingles

#: MinHash signature length and banding (b bands of r rows: b*r = k).
#: A pair with true Jaccard j becomes a candidate with
#: P = 1 - (1 - j^r)^b, an S-curve whose threshold sits near
#: (1/b)^(1/r). Defaults (k=8, b=2 → r=4): threshold ≈ 0.84 — matched
#: to the registered q_dedup_near contract (planted dups at j≈0.98:
#: P ≈ 0.995; random pairs j≈0.05: P ≈ 1e-5). For 100-TB corpora at a
#: softer threshold, scale BOTH knobs — e.g. k=128, b=32 (r=4,
#: threshold ≈ 0.42) or k=128, b=16 (r=8, threshold ≈ 0.71) — every
#: operator below takes (k, bands) as parameters; the constants here
#: are only the oracle-checked default. Recall is asserted at a second
#: setting in tests/test_scale_ops.py.
MINHASH_K = 8
MINHASH_BANDS = 2


def pairs_from_buckets(
    buckets: DataFrame, ids_col: str, out_a: str, out_b: str
) -> DataFrame:
    """Distinct ordered id pairs co-occurring in ≥1 bucket.

    The shared tail of every bucketed candidate generator (shingle
    buckets, MinHash bands, SRP bands): two generates inside each
    bucket, ordered to halve the pair space, deduped across buckets.
    No pairwise work ever happens outside a bucket.
    """
    return (
        buckets.where(F.size(ids_col) > 1)
        .select(F.explode(ids_col).alias(out_a), F.col(ids_col))
        .select(out_a, F.explode(ids_col).alias(out_b))
        .where(F.col(out_a) < F.col(out_b))
        .distinct()
    )


def banded_pairs(
    signatures: DataFrame,
    band_keys: list,
    id_col: str,
    out_a: str,
    out_b: str,
    max_df: int | None = None,
) -> DataFrame:
    """Generic banded-LSH candidate generator: one Column expression per
    band key, exploded to (band_idx, band_key) rows, grouped into
    buckets, pairs emitted inside buckets only — the shared skeleton of
    MinHash banding (lsh_candidate_pairs) and SRP banding
    (operators/similarity.py:srp_candidate_pairs), factored once so
    band-handling fixes (skew caps, key hardening) land in one place.

    ``max_df`` is the SKEW CAP (round-6 VERDICT item): a
    boilerplate/template cluster of m near-identical docs puts all m
    ids into one band bucket and would emit O(m^2) pairs in a single
    task. Buckets larger than max_df are dropped ENTIRELY (recall
    trade, never a wrong pair — the same semantics as the jaccard
    prefix cap). Physical shape matters at 100 TB: the bucket size is
    a window count over the SAME (band_idx, band_key) shuffle the
    collect_list aggregation already needs — Catalyst reuses the
    exchange, so the corpus is scanned and min-hashed exactly ONCE and
    the big side shuffled exactly once (measured: a separate
    count+broadcast-anti-join branch re-scans and re-hashes the whole
    corpus, 2 scans / 5 exchanges vs 1 / 3 here). WindowExec buffers
    each bucket spill-safely (UnsafeExternalSorter), and the filter
    runs BEFORE collect_list, so an over-cap bucket's member array is
    never aggregated into memory — the failure mode of filtering on
    size(_ids) after the fact. Pick max_df >> the largest true
    near-dup cluster you expect (LSH_MAX_DF's doc); a capped bucket is
    template sludge whose pairs a curation pipeline removes wholesale
    by other means."""
    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band_idx"), key.alias("band_key"))
            for b, key in enumerate(band_keys)
        ]
    )
    banded = signatures.select(id_col, F.explode(band_structs).alias("b")).select(
        id_col, "b.band_idx", "b.band_key"
    )
    if max_df is not None:
        w = Window.partitionBy("band_idx", "band_key")
        banded = (
            banded.withColumn("_bn", F.count(F.lit(1)).over(w))
            .where(F.col("_bn") <= max_df)
            .drop("_bn")
        )
    buckets = banded.groupBy("band_idx", "band_key").agg(
        F.collect_list(id_col).alias("_ids")
    )
    return pairs_from_buckets(buckets, "_ids", out_a, out_b)


def shingle_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, shingle) rows — distinct k-word shingles per document.

    fan_out first: shingling + hashing is the CPU-heavy stage, and a
    single-file input would otherwise run it on one core.
    """
    return fan_out(docs).select(id_col, F.explode(word_shingles(text_col, k)).alias("shingle"))


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_df: int | None = None,
    persist_sets: bool = False,
) -> DataFrame:
    """n-gram Jaccard near-duplicate pairs: (doc_a, doc_b, jaccard).

    Candidate generation uses PREFIX FILTERING (the AllPairs/PPJoin
    family — Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07): with
    shingle-hashes sorted ascending as the canonical global order, any
    pair with J ≥ t must share an element inside each side's first
    ``sz - floor(t·sz) + 1`` hashes. Only those prefixes are exploded
    into buckets — at t=0.8 that is ~20% of the rows and ~4% of the
    in-bucket pair work — and exact recall is GUARANTEED by the prefix
    lemma (|x∩y| ≥ ⌈t·max(|x|,|y|)⌉ forces a shared prefix element;
    floor lengthens the prefix vs the tight ⌈⌉ bound, never shortens).
    Candidates are then verified exactly: join back to the sorted hash
    sets, jaccard = |array_intersect| / union — so the reported values
    are the true jaccard, not a bucket-count approximation.

    ``max_df`` caps PREFIX-bucket document frequency (skew cap — at
    corpus scale a stopword-ish shingle whose hash lands in many
    prefixes would otherwise create a quadratic bucket). Pairs whose
    only prefix-shared shingles are capped are dropped entirely (recall
    trade, never a wrong value). Mirror the identical cap in any oracle.

    Physical shape: one narrow pass builds (id, sz, sorted-hash-set);
    one shuffle buckets the exploded prefixes (8-byte hash keys); pairs
    emit inside buckets only; the verify join touches candidates — a
    vanishing fraction of the corpus — and AQE picks its strategy.

    r16 (guide §8 — the r15 distinct-value collapse applied to the LAST
    per-doc member of the dedup family): the whole machinery runs over
    DISTINCT TEXTS, not doc rows. Every stage is a function of the text
    alone — the shingle hashes, prefix, both PPJoin filters (s, p), the
    bucket df (counted in DOCS via sum(m), identical to the per-doc
    count since exact-dup docs contribute identical prefix rows), and
    the verified jaccard — so exact-duplicate documents (boilerplate at
    corpus scale; ~10x planted in the sf1 fixture) previously paid the
    duplication factor in md5 shingle hashing and its SQUARE in bucket
    pair generation + set-intersection verifies. Intra-group pairs are
    the group's SELF-pair routed through the same buckets/filters/cap
    (identical texts share every prefix hash at the same position, so
    self-pair survival mirrors per-doc survival exactly — including a
    super-cap dup cluster losing all its buckets) and verify to
    jaccard 1.0 by identity. Proven pair-for-pair equal to the per-doc
    implementation (exceptAll both ways = 0) and oracle-MATCH — see
    tests/test_group_collapse_equivalence.py.
    """
    hs = F.array_sort(
        F.array_distinct(
            F.transform(word_shingles(text_col, k), lambda s: hash60(s))
        )
    )
    # Collapse exact-duplicate texts first: one row per distinct text
    # carrying the sorted member-id list (group id = min member). The
    # groupBy's partial aggregation collapses duplicate keys map-side,
    # so the exchange carries ~distinct texts, and the md5 shingle
    # hashing below runs once per distinct text. fan_out keyed by the
    # text column: the repartition IS the groupBy distribution (one
    # exchange), and the keyed mode skips round-robin's local input
    # sort (guide §2.5). grouped_ids carries the
    # spark.graft.groupcollapse.cap valve (off by default): over-cap
    # duplicate clusters spill to singleton group rows so no single row
    # ever holds an unbounded member array (functions/groupcollapse.py).
    groups = grouped_ids(fan_out(docs, by=(text_col,)), (text_col,), id_col)
    # long, not int: the candidate length filters multiply _sz by 1e6
    # (ppm arithmetic) — int32 overflows for any doc with >= 2148
    # distinct shingles (~10 KB of text; ANSI hard error, found by the
    # /tmp/skew3 giant-doc fixture). One cast here keeps every
    # downstream product in int64.
    sized = groups.select(
        F.col("_ids")[0].alias("_gid"),
        F.size("_ids").cast("long").alias("_m"),
        F.col("_ids"),
        F.size(hs).cast("long").alias("_sz"),
        hs.alias("_hs"),
    )
    # `sized` feeds three consumers (prefix explode + both verify sides);
    # without persistence the groupBy's final aggregation + the
    # shingle+hash projection recompute per consumer (ReuseExchange
    # shares only the shuffle files, not the post-shuffle agg/hash
    # work). Measured (SCALE.md): materializing it once is 1.4x at
    # sf0.1 and 2.2x at the sf1 decade, output-identical — the
    # registered plan passes True. MEMORY_AND_DISK spills, never OOMs.
    # The operator default stays False so callers composing their own
    # pipelines opt in deliberately. pin() scopes the cache entry to
    # the enclosing REGISTERED query (functions/cachepin.py): any later
    # registered build releases it. A library caller outside a
    # registered query who wants to own the persist lifetime should
    # pass persist_sets=False and persist/unpersist the returned frame
    # itself (ADVICE round 9) — with True, a subsequent registered
    # build downgrades the cache to a lineage recompute (never wrong,
    # possibly slow), and if no registered build ever runs the pin
    # lasts until session end.
    if persist_sets:
        from news_categorization_big_data_spark.functions.cachepin import pin

        sized = pin(sized)
    prefix_len = (F.col("_sz") - F.floor(F.lit(threshold) * F.col("_sz")) + 1).cast("int")
    pref = sized.select(
        "_gid",
        "_m",
        "_sz",
        F.posexplode(F.slice("_hs", 1, prefix_len)).alias("_p", "_h"),
    )
    # _df = bucket document frequency in DOCS (sum of member counts) —
    # the exact quantity the per-doc path's size(_ids) measured, so the
    # max_df cap semantics (and the oracles' HAVING COUNT(*) mirrors)
    # are unchanged. _df > 1 is the pair-existence guard: a lone
    # singleton group can't pair, but a lone m>1 group self-pairs.
    buckets = pref.groupBy("_h").agg(
        F.collect_list(
            F.struct(
                F.col("_gid").alias("i"),
                F.col("_sz").alias("s"),
                F.col("_p").alias("p"),
                F.col("_m").alias("m"),
            )
        ).alias("_ids"),
        F.sum("_m").alias("_df"),
    )
    buckets = buckets.where(F.col("_df") > 1)
    if max_df is not None:
        buckets = buckets.where(F.col("_df") <= max_df)
    # LENGTH FILTER (PPJoin): J = |∩|/|∪| ≤ min(sz)/max(sz), so J ≥ t
    # forces min ≥ t·max — prune inside the buckets, before the pair
    # ever reaches the (expensive) set-intersection verify join. Sound:
    # pruned pairs cannot pass verification, so the RESULT is unchanged
    # and the oracle needs no mirror. Integer arithmetic (t scaled to
    # parts-per-million) so a pair at exactly J = t is never lost to a
    # float boundary (0.8·5 in binary is 4.0000000000000002 > 4).
    #
    # POSITIONAL FILTER (PPJoin's second prune, same soundness
    # argument): a shared prefix hash at 0-based sorted positions
    # (p_a, p_b) bounds the overlap from above by
    # ub = 1 + min(sz_a − p_a − 1, sz_b − p_b − 1), and J ≥ t needs
    # o ≥ t·(sz_a + sz_b)/(1+t). Occurrences failing ub·(1+t) ≥
    # t·(sz_a+sz_b) are dropped BEFORE the distinct; a true pair always
    # survives because its FIRST common element (in the shared sorted
    # order) sits inside both prefixes (prefix lemma) with no common
    # elements before it, so its ub ≥ o. Dissimilar pairs share only
    # deep-position prefix hashes and die here: measured at sf0.1 this
    # cuts verify candidates 85k → 30k with the output byte-identical
    # (the survivors share shallow prefix positions — near-threshold
    # lookalikes only the exact intersection can separate).
    t_ppm = round(threshold * 1_000_000)
    ub = F.lit(1) + F.least(
        F.col("_a.s") - F.col("_a.p") - 1, F.col("_b.s") - F.col("_b.p") - 1
    )
    # Pair condition: distinct groups (i < i'), OR the group's SELF-pair
    # (the same exploded element paired with itself — one occurrence per
    # bucket the group's prefix reaches) when it has 2+ members. The
    # self-pair rides the identical length/positional filters (both are
    # functions of (s, p), equal on both sides), so a dup cluster's
    # intra pairs survive exactly where the per-doc path's did — e.g. a
    # cluster bigger than every one of its prefix buckets' cap emits
    # nothing, same as before.
    cand = (
        buckets.select(F.explode("_ids").alias("_a"), F.col("_ids"))
        .select("_a", F.explode("_ids").alias("_b"))
        .where(
            (F.col("_a.i") < F.col("_b.i"))
            | ((F.col("_a.i") == F.col("_b.i")) & (F.col("_a.m") > 1))
        )
        .where(
            F.least("_a.s", "_b.s") * F.lit(1_000_000)
            >= F.lit(t_ppm) * F.greatest("_a.s", "_b.s")
        )
        .where(
            ub * F.lit(1_000_000 + t_ppm)
            >= F.lit(t_ppm) * (F.col("_a.s") + F.col("_b.s"))
        )
        .select(F.col("_a.i").alias("_ga"), F.col("_b.i").alias("_gb"))
        .distinct()
    )
    sa = sized.select(
        F.col("_gid").alias("_ga"),
        F.col("_sz").alias("_sza"),
        F.col("_hs").alias("_hsa"),
        F.col("_ids").alias("_idsa"),
    )
    sb = sized.select(
        F.col("_gid").alias("_gb"),
        F.col("_sz").alias("_szb"),
        F.col("_hs").alias("_hsb"),
        F.col("_ids").alias("_idsb"),
    )
    inter = F.size(F.array_intersect("_hsa", "_hsb"))
    jac = inter.cast("double") / (F.col("_sza") + F.col("_szb") - inter)
    # shuffle_merge hints: same reason as containment_pairs below — the
    # static size estimate of the pinned sets table is garbage (text →
    # hash-array widening is invisible to the estimator), so the planner
    # was broadcasting the full (id, sz, hash-array) table as a verify
    # build side (seen on the round-11 skew fixture; the containment
    # twin of this join was a measured broadcast-OOM there). The sets
    # table is O(corpus) — at 100 TB it is never broadcastable; SMJ is
    # spill-safe and AQE still skew-splits it. A self-pair verifies to
    # jaccard exactly 1.0 (|x∩x| = sz on both sides), so no special
    # case: identical-text pairs report 1.0 just as the per-doc
    # intersection did.
    ver = (
        cand.join(sa.hint("shuffle_merge"), "_ga")
        .join(sb.hint("shuffle_merge"), "_gb")
        .where(jac >= threshold)
        .select("_ga", "_gb", F.round(jac, 4).alias("jaccard"), "_idsa", "_idsb")
    )
    # Expand verified GROUP pairs to doc pairs in one pass: cross-group
    # pairs take every (x in A, y in B) once (disjoint groups, ordered
    # by least/greatest); the self-pair takes within-group combinations
    # (x < y over one array — _idsb IS _idsa after the self-join).
    return (
        ver.select("_ga", "_gb", F.explode("_idsa").alias("_x"), "_idsb", "jaccard")
        .select("_ga", "_gb", "_x", F.explode("_idsb").alias("_y"), "jaccard")
        .where((F.col("_ga") != F.col("_gb")) | (F.col("_x") < F.col("_y")))
        .select(
            F.least("_x", "_y").alias("doc_a"),
            F.greatest("_x", "_y").alias("doc_b"),
            "jaccard",
        )
    )


#: Modulus of the double-hash family: a PRIME just under 2^50
#: (2^50 − 27, Miller-Rabin-verified). Two constraints meet here:
#:
#: 1. **It must be a modulus at all** — g_j = h1 + j·h2m WITHOUT a wrap
#:    is monotone in j, so one shingle holding both a small h1 and a
#:    small h2m wins every coordinate and the "k" minhashes collapse to
#:    ~2 independent ones (argmin h1 and argmin h2m), silently wrecking
#:    banded-LSH recall. The mod-P wrap re-randomizes the argmin per j —
#:    the actual Kirsch-Mitzenberger construction.
#: 2. **Overflow headroom**: h1 < 2^60 and j·h2m < k·2^50 keep
#:    h1 + j·h2m < 2^63 for every k ≤ 7168, so the whole documented
#:    parameterization range (k up to 128+ for 100-TB configs) is
#:    overflow-free in BOTH engines (Spark would wrap, DuckDB would
#:    raise — either way a silent-or-loud divergence). Guarded below.
MINHASH_PRIME = (1 << 50) - 27
_MINHASH_MAX_K = ((1 << 63) - (1 << 60)) // (1 << 50)  # 7168


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = MINHASH_K) -> DataFrame:
    """Per-document MinHash signature: (id, mh0..mh{k-1}).

    One explode + one groupBy: the shuffle carries (id, shingle-hashes)
    once and computes all k min-hashes as parallel aggregates of the
    same rows. The k hash functions are Kirsch-Mitzenberger double
    hashes g_j = (h1 + j·(h2 mod P)) mod P (P prime, MINHASH_PRIME)
    where h1/h2 are the two halves of ONE md5 digest per shingle
    (hash60_pair) — md5 is the dominant
    per-row cost, so the signature stage hashes each shingle exactly
    once regardless of k (the standard construction, e.g. Mash). The
    halves are PROJECTED before the groupBy so the digest is provably
    evaluated once, not re-derived inside each of the k aggregate
    expressions. Docs with no shingles get no row (they can't be
    near-duplicates).
    """
    if k > _MINHASH_MAX_K:
        raise ValueError(
            f"k={k} exceeds the int64-overflow-safe bound {_MINHASH_MAX_K} "
            f"for the double-hash family ((h1 + j·(h2 % P)) % P)"
        )
    sh = shingle_table(docs, text_col, id_col)
    h1, h2 = hash60_pair("shingle")
    hashed = sh.select(
        id_col, h1.alias("_h1"), (h2 % F.lit(MINHASH_PRIME)).alias("_h2m")
    )
    aggs = [
        F.min((F.col("_h1") + F.lit(j) * F.col("_h2m")) % F.lit(MINHASH_PRIME)).alias(
            f"mh{j}"
        )
        for j in range(k)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


#: Default band-bucket skew cap for the MinHash/SRP LSH paths. True
#: near-dup clusters (mirror sites, syndicated articles) run tens to
#: low hundreds of members; 10_000 sits two orders of magnitude above
#: that, so the cap NEVER binds on organic similarity — it only fires
#: on template sludge (boilerplate pages, empty-ish docs sharing a
#: degenerate signature), exactly the buckets whose O(m^2) pairs would
#: dominate the stage at crawl scale. Capped buckets are dropped whole;
#: oracles mirror the identical HAVING filter.
LSH_MAX_DF = 10_000


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    max_df: int | None = LSH_MAX_DF,
) -> DataFrame:
    """Banded-LSH candidate pairs: docs agreeing on ALL minhashes of ≥1 band.

    The signature table is exploded to one (band_idx, band_key, id) row
    per band, grouped into buckets, and pairs are generated inside each
    bucket — a single shuffle on the compact band key, the signature
    subtree evaluated once, and no pairwise work outside hash buckets.
    That shape is what makes MinHash dedup linear-ish at corpus scale;
    the ``max_df`` bucket cap (default LSH_MAX_DF, see banded_pairs)
    bounds the one residual quadratic term.
    """
    rows = k // bands
    band_keys = [
        F.concat_ws("-", *[f"mh{j}" for j in range(b * rows, (b + 1) * rows)])
        for b in range(bands)
    ]
    return banded_pairs(signatures, band_keys, id_col, "doc_a", "doc_b", max_df=max_df)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Per-document SimHash sketch: (id, simhash).

    Each distinct token votes +1/-1 on each of `bits` lanes according to
    its md5-derived bit pattern; the sketch sets lanes with positive
    totals. One explode + one groupBy with `bits` conditional-sum
    aggregates — same shuffle shape as minhash_signatures.
    """
    toks = fan_out(docs).select(
        id_col, F.explode(F.array_distinct(F.split(text_col, r"\s+"))).alias("token")
    ).where(F.col("token") != "")
    # Materialize the md5-derived bit pattern ONCE per token row: the
    # `bits` lane aggregates each reference it, and Spark's aggregate
    # codegen does not common-subexpression across aggregate functions
    # — inlining the hash expression re-ran md5 `bits` times per row
    # (measured 13.3 s → 2.6 s at sf0.1 for the 32-bit sketch).
    hashed = toks.select(id_col, hash_bits("token", bits).alias("_h"))
    lane_sums = [
        F.sum(
            F.when(F.col("_h").bitwiseAND(F.lit(1 << b)) > 0, 1).otherwise(-1)
        ).alias(f"_s{b}")
        for b in range(bits)
    ]
    lanes = hashed.groupBy(id_col).agg(*lane_sums)
    sketch = reduce(
        lambda acc, b: acc + F.when(F.col(f"_s{b}") > 0, F.lit(1 << b)).otherwise(0),
        range(bits),
        F.lit(0),
    )
    return lanes.select(id_col, sketch.cast("long").alias("simhash"))


def containment_pairs(
    docs: DataFrame,
    threshold_pct: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_df: int | None = None,
    persist_sets: bool = False,
) -> DataFrame:
    """Asymmetric containment near-dup pairs: (doc_a, doc_b, containment)
    with C(A→B) = |A∩B| / |A| ≥ threshold_pct/100, A ≠ B.

    ``persist_sets`` mirrors jaccard_pairs: the (id, sz, sorted-hash)
    table feeds FIVE consumers here (probe prefix, index explode, the
    df-cap count, both verify sides), so the registered plan opts in —
    without it the shingle+hash transform recomputes per consumer
    (5 scans; round-8 multi-consumer coefficient, SCALE.md). Default
    False so composing callers opt in deliberately — and note the pin
    is scoped to the enclosing REGISTERED query (see the jaccard_pairs
    comment): library callers outside a registered build who need a
    durable cache should persist the returned frame themselves rather
    than pass True (ADVICE round 9).

    Containment is the dedup predicate Jaccard structurally misses: a
    passage quoted whole inside a much longer page has J ≈ |A|/|B| ≈ 0
    but C(A→B) ≈ 1 — near-superset detection is how a curation pipeline
    catches boilerplate wrappers and quote-inflation.

    Prefix filtering adapts asymmetrically (the containment variant of
    the PPJoin lemma): the probe side A explodes only its first
    ``sz − ⌈t·sz⌉ + 1`` sorted hashes (pigeonhole: any ⌈t·sz⌉-subset of
    A — in particular A∩B — must hit that prefix), while the INDEX side
    B explodes every hash (containment puts no lower bound on B's
    overlap position). Bucket df-cap ``max_df`` applies to the index
    side (documented recall trade, mirrored in the oracle). The
    threshold is integer parts-per-hundred so the boundary comparison
    ``inter·100 ≥ t_pct·sz`` is exact — no float can flip membership.
    """
    hs = F.array_sort(
        F.array_distinct(
            F.transform(word_shingles(text_col, k), lambda s: hash60(s))
        )
    )
    # r16: DISTINCT-TEXT collapse, the jaccard_pairs rewrite adapted to
    # containment's asymmetric probe/index shape. Every filter and the
    # reported containment are functions of the two TEXTS (prefix,
    # index membership, |A∩B|, |A|), so the machinery runs once per
    # distinct text pair and verified GROUP pairs expand to ORDERED doc
    # pairs at the end (no least/greatest — C(A→B) and C(B→A) are
    # separate candidates, as per-doc). The group SELF-pair carries the
    # identical-text pairs (containment exactly 1.0 = sza/sza; both
    # orderings emitted by the x ≠ y expansion), gated on the group
    # reaching ≥1 uncapped index hash through the same join — per-doc
    # survival semantics unchanged. Index df counts DOCS (sum of member
    # counts), so the max_df cap and its oracle mirrors are unchanged.
    # grouped_ids carries the spark.graft.groupcollapse.cap valve
    # (functions/groupcollapse.py).
    groups = grouped_ids(fan_out(docs, by=(text_col,)), (text_col,), id_col)
    # long, not int: the candidate length filters multiply _sz by 1e6
    # (ppm arithmetic) — int32 overflows for any doc with >= 2148
    # distinct shingles (~10 KB of text; ANSI hard error, found by the
    # /tmp/skew3 giant-doc fixture). One cast here keeps every
    # downstream product in int64.
    sized = groups.select(
        F.col("_ids")[0].alias("_gid"),
        F.size("_ids").cast("long").alias("_m"),
        F.col("_ids"),
        F.size(hs).cast("long").alias("_sz"),
        hs.alias("_hs"),
    )
    if persist_sets:
        from news_categorization_big_data_spark.functions.cachepin import pin

        sized = pin(sized)
    # ⌈t·sz⌉ in pure integers: (t_pct·sz + 99) div 100.
    ceil_t_sz = F.floor((F.col("_sz") * threshold_pct + 99) / 100).cast("int")
    prefix_len = (F.col("_sz") - ceil_t_sz + 1).cast("int")
    probe = sized.select(
        F.col("_gid").alias("_ga"),
        F.col("_m").alias("_ma"),
        F.col("_sz").alias("_szap"),
        ceil_t_sz.cast("long").alias("_cta"),
        F.posexplode(F.slice("_hs", 1, prefix_len)).alias("_pa", "_h"),
    )
    index = sized.select(
        F.col("_gid").alias("_gb"),
        F.col("_m").alias("_mb"),
        F.col("_sz").alias("_szbp"),
        F.posexplode("_hs").alias("_pb", "_h"),
    )
    # EVERY join below carries an explicit shuffle_merge hint: Catalyst's
    # static size estimate for these frames is garbage — the pinned
    # (id, sz, sorted-hash-array) table and the exploded probe/index
    # sides all descend from a narrow (doc_id, text) parquet scan
    # through transform/explode, whose output bytes the estimator can't
    # see, so BEFORE first materialization it happily plans
    # BroadcastHashJoin with the multi-hundred-MB SETS table (or even
    # the exploded probe!) as the build side. On the round-11 skew
    # fixture (50k docs, /tmp/skew1) that was a measured hard failure:
    # "Not enough memory to build and broadcast the table" — and at
    # 100 TB the sets/exploded sides are O(corpus), never broadcastable.
    # Sort-merge is the spill-safe strategy with AQE skew-split still
    # available; per-key right groups in the candidate join are bounded
    # by the df cap. Same pattern as the q_token_rarity vocab join
    # (plans/text.py) — declared strategy where the estimate is
    # known-garbage.
    if max_df is not None:
        # df in DOCS: sum of group member counts per hash — identical
        # to the per-doc COUNT(*) the oracles mirror.
        df_ok = (
            index.groupBy("_h")
            .agg(F.sum("_mb").alias("_df"))
            .where(F.col("_df") <= max_df)
            .select("_h")
        )
        index = index.join(df_ok.hint("shuffle_merge"), "_h")
    # r16 candidate pruning (the PPJoin filters' asymmetric forms; both
    # SOUND — a pruned occurrence can never verify, so the oracle needs
    # no mirror, and a qualifying pair's FIRST common element always
    # survives both):
    # - length: |A∩B| ≤ |B| and C(A→B) ≥ t force |B| ≥ ⌈t·|A|⌉;
    # - positional: a shared hash at sorted positions (p_a, p_b) bounds
    #   the overlap by 1 + min(|A|−p_a−1, |B|−p_b−1) ≥ ⌈t·|A|⌉ — on a
    #   low-diversity corpus this kills the deep-index-position matches
    #   that made the candidate set quadratic (measured at sf1:
    #   27.9M → see OPTIMIZATION_r16.md).
    ub = F.lit(1) + F.least(
        F.col("_szap") - F.col("_pa") - 1, F.col("_szbp") - F.col("_pb") - 1
    )
    cand = (
        probe.join(index.hint("shuffle_merge"), "_h")
        .where(
            (F.col("_ga") != F.col("_gb"))
            | ((F.col("_ga") == F.col("_gb")) & (F.col("_ma") > 1))
        )
        .where(F.col("_szbp") >= F.col("_cta"))
        .where(ub >= F.col("_cta"))
        .select("_ga", "_gb")
        .distinct()
    )
    sa = sized.select(
        F.col("_gid").alias("_ga"),
        F.col("_sz").alias("_sza"),
        F.col("_hs").alias("_hsa"),
        F.col("_ids").alias("_idsa"),
    )
    sb = sized.select(
        F.col("_gid").alias("_gb"),
        F.col("_hs").alias("_hsb"),
        F.col("_ids").alias("_idsb"),
    )
    inter = F.size(F.array_intersect("_hsa", "_hsb"))
    ver = (
        cand.join(sa.hint("shuffle_merge"), "_ga")
        .join(sb.hint("shuffle_merge"), "_gb")
        .where(inter * 100 >= F.col("_sza") * threshold_pct)
        .select(
            "_ga",
            "_gb",
            F.round(inter.cast("double") / F.col("_sza"), 4).alias("containment"),
            "_idsa",
            "_idsb",
        )
    )
    # ORDERED expansion: every (x ∈ A, y ∈ B) for direction A→B; the
    # self-pair (A = B) expands to both orderings of distinct members
    # (x ≠ y), each reporting containment 1.0 — per-doc identical.
    return (
        ver.select(
            F.explode("_idsa").alias("doc_a"), "_idsb", "containment"
        )
        .select("doc_a", F.explode("_idsb").alias("doc_b"), "containment")
        .where(F.col("doc_a") != F.col("doc_b"))
    )


def auto_simhash_bits(
    n_docs: int, bands: int = 4, floor: int = 32, cap: int = 60
) -> int:
    """The round-14-measured SimHash sizing law as code (r14 VERDICT
    item 4): block width must track ``log2(corpus)`` or banded
    candidate generation degenerates — at 500k docs a 16-bit sketch's
    4-bit blocks held ~31k docs per bucket (~550M candidate pairs, the
    hot bucket's explode serialized into ONE task) while the 60-bit
    sketch at the same corpus completed in 285 s. A caller passing a
    fixed ``bits`` at corpus scale can still hit that cliff silently;
    this derives the width from a corpus count instead.

    Returns ``bands * ceil(log2(n))`` rounded UP to a multiple of
    lcm(bands, 4) (band split + hex-granularity md5 lanes), floored at
    ``floor`` (=32, the stamped q_simhash_hamming profile) and capped
    at the largest such multiple ≤ ``cap`` (=60, hash_bits' overflow-
    safe BIGINT parse limit). Uncapped, expected bucket size
    n / 2^(bits/bands) stays ≤ 1; once the cap binds (n > 2^15 per
    band at the defaults) buckets grow as n / 2^15 — the documented
    residual, still 3 decades better than the 16-bit profile.
    """
    if bands < 1:
        raise ValueError(f"bands must be >= 1, got {bands}")
    import math

    step = bands * 4 // math.gcd(bands, 4)
    width = max(1, math.ceil(math.log2(max(n_docs, 2))))
    bits = max(bands * width, floor)
    bits = step * math.ceil(bits / step)
    max_bits = cap - cap % step
    if max_bits < step:
        raise ValueError(f"cap={cap} admits no multiple of lcm(bands,4)={step}")
    return min(bits, max_bits)


def simhash_hamming_auto(
    docs: DataFrame,
    max_distance: int = 3,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """``simhash_hamming_pairs`` with the sketch width derived from the
    corpus size (auto_simhash_bits) instead of a caller-fixed ``bits``
    — the scale-safe entry point. Costs one extra count() action over
    ``docs`` (metadata-fast on parquet scans) before the sketch build;
    the registered q_simhash_hamming plan keeps explicit 32-bit sketches
    because its brute-force oracle is stamped at that width (a different
    width IS a different query: the pair set is defined over the
    sketch)."""
    bits = auto_simhash_bits(docs.count(), bands=bands)
    return simhash_hamming_pairs(
        simhash(docs, text_col=text_col, id_col=id_col, bits=bits),
        max_distance=max_distance,
        bits=bits,
        bands=bands,
        id_col=id_col,
        max_df=max_df,
    )


def simhash_hamming_pairs(
    sketches: DataFrame,
    max_distance: int = 3,
    bits: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    sketch_col: str = "simhash",
    max_df: int | None = None,
) -> DataFrame:
    """Hamming-distance join over SimHash sketches: (doc_a, doc_b,
    hamming) for every pair with popcount(xor) ≤ ``max_distance``.

    Candidate generation is the Manku/Jain/Sarma pigeonhole banding
    (WWW'07 "Detecting Near-Duplicates for Web Crawling"): the sketch
    splits into ``bands`` equal bit-blocks; flipping ≤ max_distance
    bits can dirty at most max_distance blocks, so any qualifying pair
    agrees EXACTLY on ≥1 block whenever ``bands > max_distance``
    (asserted). Pairs are generated only inside (band_idx, band_value)
    buckets — banded_pairs, the same skeleton as MinHash/SRP banding —
    then verified exactly with one bit_count(xor) per candidate, so
    recall is total and every reported distance is true.

    Scale: bucket sizes are n / 2^(bits/bands) in expectation; the
    production parameterization grows the sketch so block width tracks
    log2(n) — Manku's crawl config is 64-bit sketches, 4×16-bit blocks
    at d≤3. The 16-bit default matches the engine's q_dedup_simhash
    sketch for the testdata corpus, and UNDERSIZING IS NOT GRACEFUL
    (round-14 sf1 measurement): at 500k docs the 16-bit sketch's
    4-bit blocks hold ~31k docs per bucket ⇒ ~550M candidate pairs,
    and because each bucket explodes from ONE collect_list row, a hot
    bucket's pair generation runs in ONE task — the job serializes
    long before the verify join costs anything. The same corpus with a
    60-bit/4-band sketch (block width ~log2(n), the documented rule)
    completes in 285 s with 7.06M true pairs. Callers at corpus scale
    must size ``bits`` from log2(n) (or cap degenerate buckets with
    ``max_df`` where recall loss is acceptable).
    """
    if bands <= max_distance:
        raise ValueError(
            f"pigeonhole needs bands > max_distance; got {bands} <= {max_distance}"
        )
    if bits % bands:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    width = bits // bands

    def _band_keys(col: str) -> list:
        return [
            F.shiftright(F.col(col), b * width).bitwiseAND(F.lit((1 << width) - 1))
            for b in range(bands)
        ]

    # max_df stays None-by-default here: pigeonhole recall is this
    # operator's contract ("recall is total"), and block buckets are
    # n/2^width by DESIGN — the scale answer is a wider sketch (Manku's
    # 64-bit/4-block crawl config), not a cap. The cap is an emergency
    # valve for callers who accept recall loss on degenerate corpora.
    if max_df is not None:
        # Capped path: the cap's drop unit is DOCS per band bucket, so
        # banding must stay per-doc — the distinct-sketch rewrite below
        # would change which buckets trip the cap.
        cand = banded_pairs(
            sketches, _band_keys(sketch_col), id_col, "doc_a", "doc_b", max_df=max_df
        )
        sa = sketches.select(
            F.col(id_col).alias("doc_a"), F.col(sketch_col).alias("_ska")
        )
        sb = sketches.select(
            F.col(id_col).alias("doc_b"), F.col(sketch_col).alias("_skb")
        )
        hamming = F.bit_count(F.col("_ska").bitwiseXOR(F.col("_skb")))
        # shuffle_hash on the SKETCH side: the candidate table is a
        # structurally WIDENED frame (double explode of bucket id-lists)
        # whose static estimate is garbage — at sf1 the planner estimated
        # it below the sketches and BROADCAST the 550M-row pair table
        # (round-14 find; Spark's 512M-row broadcast hard cap killed the
        # job, and AQE never demotes a statically-chosen broadcast join).
        # The declared hint makes the join a shuffled-hash with the
        # one-row-per-doc sketch side as build — no sort of the pair
        # table, no broadcast of anything corpus-sized, the same remedy
        # the r12 skew program applied to the containment/jaccard verify
        # joins. (sketches scale with the corpus, so a broadcast hint on
        # THEM would be the q18 class — shuffle_hash shards both sides.)
        return (
            cand.join(sa.hint("shuffle_hash"), "doc_a")
            .join(sb.hint("shuffle_hash"), "doc_b")
            .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_distance)
        )

    # Default (uncapped) path — band over DISTINCT SKETCHES, not docs
    # (r15, guide §8: decide on a lightweight proxy, multiply the heavy
    # rows out once at the end). Exact-duplicate documents share a
    # sketch, so every band bucket held every copy of every cluster and
    # in-bucket pair generation was quadratic in the DUPLICATED count —
    # and each hot bucket exploded from one collect_list row in ONE
    # task (measured: the registered 32-bit plan took 1473 s at the sf1
    # decade, whose corpus carries ~10x exact dups). Grouping docs by
    # sketch first shrinks buckets by the duplication factor (pair work
    # falls quadratically), the group id IS the sketch so candidate
    # Hamming needs NO verify join at all, and the output pair set is
    # IDENTICAL: intra-group pairs are exactly the distance-0 pairs,
    # inter-group pairs expand the member lists of qualifying sketch
    # pairs (disjoint groups ⇒ no duplicates; least/greatest keeps the
    # doc_a < doc_b convention; null sketches, which the per-doc path
    # drops via NULL hamming, are filtered up front). Verified MATCH
    # against the unchanged DuckDB oracle and pair-for-pair against the
    # old path at sf0.01/sf0.1.
    groups = (
        sketches.where(F.col(sketch_col).isNotNull())
        .groupBy(sketch_col)
        .agg(F.array_sort(F.collect_list(id_col)).alias("_ids"))
    )
    cand = banded_pairs(groups, _band_keys(sketch_col), sketch_col, "_ska", "_skb")
    hamming = F.bit_count(F.col("_ska").bitwiseXOR(F.col("_skb")))
    qual = cand.where(hamming <= max_distance).select(
        "_ska", "_skb", hamming.cast("int").alias("hamming")
    )
    ga = groups.select(F.col(sketch_col).alias("_ska"), F.col("_ids").alias("_idsa"))
    gb = groups.select(F.col(sketch_col).alias("_skb"), F.col("_ids").alias("_idsb"))
    # shuffle_hash on the group side: same widened-frame rationale as
    # the capped path's verify joins (the member arrays are
    # corpus-sized in total — never broadcastable).
    inter = (
        qual.join(ga.hint("shuffle_hash"), "_ska")
        .join(gb.hint("shuffle_hash"), "_skb")
        .select(F.explode("_idsa").alias("_a"), "_idsb", "hamming")
        .select("_a", F.explode("_idsb").alias("_b"), "hamming")
        .select(
            F.least("_a", "_b").alias("doc_a"),
            F.greatest("_a", "_b").alias("doc_b"),
            "hamming",
        )
    )
    intra = (
        groups.where(F.size("_ids") > 1)
        .select(F.explode("_ids").alias("doc_a"), F.col("_ids"))
        .select("doc_a", F.explode("_ids").alias("doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("int").alias("hamming"))
    )
    return inter.unionByName(intra)


def lsh_probe_pairs(
    signatures: DataFrame,
    probe_col: str = "is_probe",
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    max_df: int | None = LSH_MAX_DF,
) -> DataFrame:
    """Incremental-dedup probe: candidate pairs TOUCHING the probe set
    (new-batch docs vs the whole corpus, including probe-vs-probe) —
    the production dedup shape: a crawl delta is checked against the
    stored signature index without regenerating corpus-internal pairs.

    ``signatures`` is the minhash_signatures output plus a boolean
    ``probe_col``. Band rows for the PROBE side equi-join band rows for
    the WHOLE index on (band_idx, band_key): work is
    |probe bands| x bucket width, independent of how many base-base
    pairs exist — at 100 TB the index side is the persisted signature
    table and only the delta pays the shingle/minhash cost. Pairs
    canonicalize (least, greatest) + distinct, so a probe-probe pair
    found from both sides emits once. Output-equal to filtering the
    full lsh_candidate_pairs down to rows touching the probe set
    (the oracle proves it).
    """
    rows = k // bands
    band_keys = [
        F.concat_ws("-", *[f"mh{j}" for j in range(b * rows, (b + 1) * rows)])
        for b in range(bands)
    ]
    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band_idx"), key.alias("band_key"))
            for b, key in enumerate(band_keys)
        ]
    )
    banded = signatures.select(
        id_col, probe_col, F.explode(band_structs).alias("b")
    ).select(id_col, probe_col, "b.band_idx", "b.band_key")
    if max_df is not None:
        # Same skew cap as banded_pairs (window count over the bucket
        # shuffle, one scan), counted over the WHOLE bucket (index
        # side) so probe-vs-base and base-vs-base agree on which
        # buckets are template sludge — keeps the documented
        # output-equivalence with a capped lsh_candidate_pairs.
        w = Window.partitionBy("band_idx", "band_key")
        banded = (
            banded.withColumn("_bn", F.count(F.lit(1)).over(w))
            .where(F.col("_bn") <= max_df)
            .drop("_bn")
        )
    probe = banded.where(F.col(probe_col)).select(
        F.col(id_col).alias("_p"), "band_idx", "band_key"
    )
    index = banded.select(F.col(id_col).alias("_i"), "band_idx", "band_key")
    return (
        probe.join(index, ["band_idx", "band_key"])
        .where(F.col("_p") != F.col("_i"))
        .select(
            F.least("_p", "_i").alias("doc_a"),
            F.greatest("_p", "_i").alias("doc_b"),
        )
        .distinct()
    )
