"""Property-based spot checks (SURVEY.md §5.2.4): Column-expression
identities vs the reference's Python semantics, on driver-local data
(one Spark round-trip per property keeps these fast)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"), max_codepoint=0x2FF),
    max_size=80,
)


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_substring_matches_python_slice(spark, texts):
    """substring(x, 1, k) ≙ Python x[:k] (news_summarization_batch.py:65)."""
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r.s for r in df.select(F.substring("t", 1, 10).alias("s")).collect()]
    assert got == [t[:10] for t in texts]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=-1000, max_value=10000), min_size=1, max_size=8))
def test_least_greatest_matches_python_clamp(spark, ns):
    """least(100, greatest(20, n)) ≙ min(100, max(20, n))
    (news_summarization_batch.py:67)."""
    df = spark.createDataFrame([(n,) for n in ns], "n int")
    got = [
        r.c
        for r in df.select(
            F.least(F.lit(100), F.greatest(F.lit(20), F.col("n"))).alias("c")
        ).collect()
    ]
    assert got == [min(100, max(20, n)) for n in ns]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(TEXT.filter(lambda s: s.strip()), max_size=4), min_size=1, max_size=6))
def test_array_join_matches_python_join(spark, lists):
    """array_join(xs, ', ') ≙ ', '.join(xs) (raw_news_to_telegram.py:62)."""
    df = spark.createDataFrame([(xs,) for xs in lists], "xs array<string>")
    got = [r.j for r in df.select(F.array_join("xs", ", ").alias("j")).collect()]
    assert got == [", ".join(xs) for xs in lists]


@settings(max_examples=15, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_trim_matches_python_strip_spaces(spark, texts):
    """trim ≙ .strip() for space-padded text (news_summarization_batch.py:61)."""
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r.s for r in df.select(F.trim("t").alias("s")).collect()]
    assert got == [t.strip(" ") for t in texts]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
        unique=True,
    )
)
def test_jaccard_prefix_filter_matches_brute_force(spark, docs):
    """The prefix-filtered jaccard operator must equal a Python
    brute-force ground truth exactly — candidates lost to the prefix
    lemma would surface here (tiny vocabulary ⇒ heavy shingle overlap,
    the adversarial regime for prefix filtering)."""
    from news_categorization_big_data_spark.operators.dedup import jaccard_pairs

    threshold = 0.5
    rows = [(i, t) for i, t in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(sdf, threshold, max_df=None).collect()
    }

    def shingles(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for i, a in rows:
        for j, b in rows:
            if i >= j:
                continue
            sa, sb = shingles(a), shingles(b)
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if jac >= threshold:
                want[(i, j)] = round(jac, 4)

    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # minimize
            st.integers(min_value=0, max_value=20),  # maximize
        ),
        min_size=1,
        max_size=16,
    )
)
def test_skyline_matches_brute_force(spark, points):
    """The aggregate+window skyline ≙ the O(n²) dominance definition,
    including co-frontier duplicates (operators/olap.py)."""
    from news_categorization_big_data_spark.operators.olap import (
        dominance_check,
        skyline_min_max,
    )

    df = spark.createDataFrame([(a, b) for a, b in points], "price int, size int")
    sky = [(r.price, r.size) for r in skyline_min_max(df, "price", "size").collect()]
    assert dominance_check(points, sky)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), st.sampled_from("abcd")),
        min_size=1,
        max_size=24,
    )
)
def test_grouped_mode_matches_python_counter(spark, rows):
    """grouped_mode ≙ Counter.most_common with lexicographic ties
    (operators/olap.py)."""
    from collections import Counter

    from news_categorization_big_data_spark.operators.olap import grouped_mode

    df = spark.createDataFrame(rows, "k int, v string")
    got = {r.k: (r.mode_v, r.n) for r in grouped_mode(df, "k", "v").collect()}
    expected = {}
    for k in {k for k, _ in rows}:
        c = Counter(v for kk, v in rows if kk == k)
        # ties: highest count, then smallest value
        top = min(v for v, n in c.items() if n == c.most_common(1)[0][1])
        expected[k] = (top, c[top])
    assert got == expected


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
        unique=True,
    )
)
def test_containment_matches_brute_force(spark, docs):
    """The asymmetric containment operator ≙ the Python |A∩B|/|A|
    ground truth on every ORDERED pair — the prefix-probe/full-index
    asymmetry and the integer threshold must lose nothing (tiny
    vocabulary ⇒ heavy shingle overlap, the adversarial regime)."""
    from news_categorization_big_data_spark.operators.dedup import (
        containment_pairs,
    )

    pct = 50
    rows = [(i, t) for i, t in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(sdf, pct, max_df=None).collect()
    }

    def shingles(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for i, a in rows:
        for j, b in rows:
            if i == j:
                continue
            sa, sb = shingles(a), shingles(b)
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter * 100 >= len(sa) * pct:
                want[(i, j)] = round(inter / len(sa), 4)

    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_bfs(spark, raw_edges):
    """connected_components (which takes the driver union-find path at
    this size) ≙ a Python BFS ground truth with min-id labels, on
    arbitrary random graphs (self-loops dropped, duplicates and both
    orientations allowed)."""
    from collections import defaultdict, deque

    from news_categorization_big_data_spark.operators.graph import (
        connected_components,
    )

    edges = [(a, b) for a, b in raw_edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        (r.doc_id, r.component) for r in connected_components(pairs).collect()
    }

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want, seen = set(), set()
    for v in adj:
        if v in seen:
            continue
        comp, q = [], deque([v])
        seen.add(v)
        while q:
            x = q.popleft()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    q.append(y)
        lbl = min(comp)
        want |= {(x, lbl) for x in comp}

    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 32) - 1),
        min_size=2,
        max_size=24,
    ),
    st.integers(min_value=0, max_value=3),
)
def test_simhash_hamming_banding_lossless(spark, sketches, d):
    """Pigeonhole banding over ARBITRARY 32-bit sketches (including
    duplicates and pairs at exactly distance d and d+1) must equal the
    brute-force Hamming join at every radius 0..3."""
    from news_categorization_big_data_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    rows = [(i, s) for i, s in enumerate(sketches)]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_hamming_pairs(df, max_distance=d, bits=32).collect()
    }
    brute = {
        (rows[i][0], rows[j][0]): bin(rows[i][1] ^ rows[j][1]).count("1")
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if bin(rows[i][1] ^ rows[j][1]).count("1") <= d
    }
    assert got == brute


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 60) - 1),
        min_size=2,
        max_size=20,
    ),
    st.integers(min_value=0, max_value=3),
)
def test_simhash_hamming_wide_sketch_lossless(spark, sketches, d):
    """The documented crawl-scale configuration (Manku-style wide
    sketch / 4 blocks, here 60-bit — the BIGINT-hex-parse ceiling of
    hash_bits): pigeonhole banding must stay lossless at radius ≤ 3
    with 15-bit blocks, duplicates and boundary distances included."""
    from news_categorization_big_data_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    rows = [(i, s) for i, s in enumerate(sketches)]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_hamming_pairs(
            df, max_distance=d, bits=60, bands=4
        ).collect()
    }
    brute = {
        (rows[i][0], rows[j][0]): bin(rows[i][1] ^ rows[j][1]).count("1")
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if bin(rows[i][1] ^ rows[j][1]).count("1") <= d
    }
    assert got == brute


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),
            st.integers(min_value=0, max_value=200),
        ),
        min_size=2,
        max_size=20,
    )
)
def test_grid_join_covers_exact_radius_boundary(spark, coords):
    """The 3×3 grid probe must find every pair within r — including
    pairs at EXACTLY distance r and co-located duplicate points — and
    emit each exactly once. Mirrors q_geo_grid_join's shape on
    generated coordinates (cell width = r = 50)."""
    r = 50
    pts = [(i, x, y) for i, (x, y) in enumerate(coords)]
    df = spark.createDataFrame(pts, "event_id long, x long, y long")
    probe = df.select(
        F.col("event_id").alias("event_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        ((F.col("x") / r).cast("long") + dx).alias("cx"),
                        ((F.col("y") / r).cast("long") + dy).alias("cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("_c"),
    ).select("event_a", "xa", "ya", "_c.cx", "_c.cy")
    home = df.select(
        F.col("event_id").alias("event_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        (F.col("x") / r).cast("long").alias("cx"),
        (F.col("y") / r).cast("long").alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    rows = (
        probe.join(home, ["cx", "cy"])
        .where(F.col("event_a") < F.col("event_b"))
        .where(d2 <= F.lit(r * r))
        .select("event_a", "event_b", d2.alias("dist2"))
        .collect()
    )
    got = {(r_.event_a, r_.event_b): r_.dist2 for r_ in rows}
    assert len(rows) == len(got), "pair emitted more than once"
    brute = {
        (a, b): (xa - xb) ** 2 + (ya - yb) ** 2
        for (a, xa, ya) in pts
        for (b, xb, yb) in pts
        if a < b and (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r
    }
    assert got == brute


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.one_of(
                st.none(),
                st.integers(min_value=-50, max_value=50).map(lambda n: n / 4.0),
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=997),
)
def test_grouped_order_stats_matches_brute_force(spark, rows, pm):
    """The round-8 single-pass order-stats core (value_counts +
    order_stats_from_counts) against brute force at an arbitrary
    per-mille rank, with NULLs and duplicate values mixed in: rank k =
    (n_tot − 1)·pm div 1000 + 1 computed from the TOTAL count (NULLs
    included) and indexed into the null-free sorted values; overruns
    and all-NULL groups yield NULL."""
    from pyspark.sql import functions as F

    from news_categorization_big_data_spark.functions.ordered import (
        grouped_order_stats,
    )

    df = spark.createDataFrame(rows, "g string, v double").repartition(5)
    k = (((F.col("_n_tot") - 1) * pm) / 1000).cast("int") + 1
    got = {
        r.g: r.stat
        for r in grouped_order_stats(df, ["g"], F.col("v"), {"stat": k}).collect()
    }
    by_g: dict[str, list] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    want = {}
    for g, vs in by_g.items():
        nn = sorted(x for x in vs if x is not None)
        ki = (len(vs) - 1) * pm // 1000 + 1
        want[g] = nn[ki - 1] if ki <= len(nn) else None
    assert got == want
