"""Third-implementation cross-checks for the refinement tier: pure-
Python brute force (hashlib md5, fractions.Fraction exact rationals)
recomputes each operator from the raw parquet and must agree exactly —
independent of BOTH engines' SQL/expression stacks."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from fractions import Fraction

import duckdb

from news_categorization_big_data_spark.plans import REGISTRY
from news_categorization_big_data_spark.plans.refinement import (
    FLUENCY_MIN_HEAD,
    WOR_BAND,
    WOR_K,
    WOR_WCAP,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_sample_wor_matches_python_brute_force(spark, sf_dir):
    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    pri = {}
    for doc_id, n_chars in docs:
        w = min(n_chars, WOR_WCAP)
        if w < 1:
            continue
        r = (w + WOR_BAND - 1) // WOR_BAND
        pri[doc_id] = (
            min(_h60(f"wor:{doc_id}:{i}") for i in range(1, r + 1)),
            doc_id,
        )
    want = sorted(pri.values())[:WOR_K]
    got = sorted(
        (r["priority"], r["doc_id"])
        for r in REGISTRY["q_sample_wor"].builder(spark, sf_dir).collect()
    )
    assert got == want


def test_twap_matches_exact_rational_brute_force(spark, sf_dir):
    ev = duckdb.sql(
        f"""SELECT event_type, event_id, epoch_us(ts), value
            FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"""
    ).fetchall()
    series = defaultdict(list)
    for et, eid, tus, v in ev:
        # the operator's DECIMAL(18,6) grid: round-half-up to micros
        v_micro = int(
            (Fraction(str(v)) * 1_000_000 + Fraction(1, 2)).__floor__()
        )
        series[et].append((tus, eid, v_micro))
    want = {}
    for et, rows in series.items():
        rows.sort()
        num = den = 0
        for (t0, _, vm), (t1, _, _) in zip(rows, rows[1:]):
            num += vm * (t1 - t0)
            den += t1 - t0
        want[et] = (len(rows) - 1, den, num // den)  # exact integer floor
    got = {
        r["event_type"]: (r["n_intervals"], r["total_us"], r["twap_micro"])
        for r in REGISTRY["q_twap"].builder(spark, sf_dir).collect()
    }
    assert got == want


def test_doc_fluency_matches_python_brute_force(spark, sf_dir):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' WHERE text <> ''"
    ).fetchall()
    import re

    def toks(t):
        return [x for x in re.split(r"\s+", t.lower()) if x != ""]

    lm = Counter()
    doc_pairs = {}
    for doc_id, text in docs:
        ts = toks(text)
        # mirror the split-then-drop-empties pair semantics: pairs are
        # formed on the RAW split (empties break adjacency), then
        # empty-containing pairs are dropped
        raw = re.split(r"\s+", text.lower())
        pairs = [
            (a, b) for a, b in zip(raw, raw[1:]) if a != "" and b != ""
        ]
        if pairs:
            doc_pairs[doc_id] = Counter(pairs)
            lm.update(pairs)
        del ts
    head_tot = Counter()
    for (h, _), c in lm.items():
        head_tot[h] += c
    cond = {
        p: (c * 1_000_000) // head_tot[p[0]]
        for p, c in lm.items()
        if head_tot[p[0]] >= FLUENCY_MIN_HEAD
    }
    want = {}
    for doc_id, pc in doc_pairs.items():
        n = sum(pc.values())
        hits = sum(k for p, k in pc.items() if p in cond)
        s = sum(k * cond.get(p, 0) for p, k in pc.items())
        want[doc_id] = (n, hits, s // n)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_hits"], r["mean_cond_ppm"])
        for r in REGISTRY["q_doc_fluency"].builder(spark, sf_dir).collect()
    }
    assert got == want
