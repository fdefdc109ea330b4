"""Composite operators the built-in DataFrame surface lacks.

Each is a composition of native Spark operators where semantics allow
(asof, dedup, similarity); Pandas-UDF-backed only where genuinely opaque
(multimodal decode, pluggable model inference).
"""
