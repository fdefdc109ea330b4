"""JSON corpus reader tests: array vs JSON-Lines parse equivalence,
malformed-line skip, and the union-typed authors normalization
(SURVEY.md §2.1 q_scan_json, §7 hard part 5)."""

from __future__ import annotations

import json

from news_categorization_big_data_spark.sources.json_corpus import (
    flatten_message,
    normalize_authors,
    read_json_corpus,
)

ARTICLES = [
    {"headline": "A", "authors": ["X", "Y"], "short_description": "d1"},
    {"headline": "B", "authors": "Solo Author", "short_description": "d2"},
    {"headline": "C", "short_description": "d3"},  # authors absent
    {"headline": "", "authors": None, "short_description": ""},
]


def test_array_vs_jsonl_equivalence(spark, tmp_path):
    array_path = str(tmp_path / "array.json")
    jsonl_path = str(tmp_path / "lines.json")
    with open(array_path, "w") as f:
        json.dump(ARTICLES, f)
    with open(jsonl_path, "w") as f:
        for a in ARTICLES:
            f.write(json.dumps(a) + "\n")

    a = read_json_corpus(spark, array_path).orderBy("headline").collect()
    b = read_json_corpus(spark, jsonl_path).orderBy("headline").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert len(a) == 4


def test_jsonl_malformed_lines_skipped(spark, tmp_path):
    path = str(tmp_path / "dirty.json")
    with open(path, "w") as f:
        f.write(json.dumps(ARTICLES[0]) + "\n")
        f.write("{{{ not json\n")
        f.write(json.dumps(ARTICLES[1]) + "\n")
    df = read_json_corpus(spark, path)
    assert df.count() == 2  # malformed line dropped, not fatal


def test_authors_union_normalization(spark, tmp_path):
    path = str(tmp_path / "authors.json")
    with open(path, "w") as f:
        for a in ARTICLES:
            f.write(json.dumps(a) + "\n")
    df = normalize_authors(read_json_corpus(spark, path))
    rows = {r.headline: r.authors for r in df.collect()}
    assert rows["A"] == ["X", "Y"]
    assert rows["B"] == ["Solo Author"]
    assert rows["C"] == []
    assert rows[""] == []


def test_flatten_message_defaults(spark, tmp_path):
    path = str(tmp_path / "flat.json")
    with open(path, "w") as f:
        for a in ARTICLES:
            f.write(json.dumps(a) + "\n")
    df = flatten_message(normalize_authors(read_json_corpus(spark, path)))
    messages = sorted(r.message for r in df.collect())
    assert "Headline: A, Authors: X, Y, Description: d1" in messages
    assert "Headline: B, Authors: Solo Author, Description: d2" in messages
    assert "Headline: C, Authors: Unknown, Description: d3" in messages
    assert "Headline: , Authors: Unknown, Description: " in messages
