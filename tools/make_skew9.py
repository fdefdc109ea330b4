"""UNICODE/LOCALE text fixture: /tmp/skew9 — mixed-script documents
(r14 VERDICT item 6).

Every standard fixture's text is a 31-word ASCII vocabulary, so the
regex-heavy text family (q_text_clean's regexp_replace, q_pii_scrub,
q_regex_extract, q_url_normalize, q_char_classes, the tokenizers, the
case/length scalar functions) has never been swept against DuckDB on
input where the engines' regex/case-fold semantics can genuinely
diverge: Java regex vs RE2 word boundaries and \\s classes outside
ASCII, ICU vs simple case folding (ß, Turkish dotted/dotless i, final
sigma), combining marks (é composed vs e+U+0301), astral-plane emoji
(UTF-16 surrogate pairs on the JVM vs UTF-8 code points in DuckDB —
length(), substr() off-by-N class), RTL scripts, full-width forms,
zero-width joiners, and non-ASCII whitespace (NBSP U+00A0, ideographic
space U+3000) that ASCII-only \\s+ tokenizers must NOT split on.

Construction (deterministic, df-structure-preserving):

- each ASCII vocab token maps to ONE fixed rendering chosen by a hash
  of the token — same token, same rendering everywhere, so the corpus
  document-frequency distribution (which the dedup caps, tfidf cuts
  and LSH banding are tuned against) is preserved exactly;
- renderings cycle through script families: accented Latin, Cyrillic,
  Greek, CJK, kana, Hangul, Arabic (RTL), Devanagari, emoji-suffixed,
  combining-mark, full-width, and case-fold hazard forms (ß/ı/İ/ς);
- ~1 in 8 docs additionally gets a deterministic unicode "spice"
  token (ZWJ emoji sequence, NBSP-glued pair, bidi-marked word) so
  the sweep also sees sequences no vocabulary token contains;
- n_chars is recomputed as the code-point length of the new text
  (both engines' length() count code points).

Everything except documents passes through from sf0.01 untouched.

Usage:  python tools/make_skew9.py [/tmp/skew9]
Sweep:  SPARK_GRAFT_SIM_SF=/tmp/skew9 python tools/subset_sim.py
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
PASSTHROUGH = (
    "region nation customer supplier part orders lineitem events embeddings"
).split()

#: One rendering PER SCRIPT FAMILY, applied to a token by suffix/wrap
#: so distinct ASCII tokens stay distinct after rendering (no two vocab
#: words may collapse — that would change the dedup answer structure,
#: not just its spelling).
_FAMILIES = [
    # accented latin: swap vowels for accented forms
    lambda t: t.translate(str.maketrans("aeiou", "àéîöü")),
    # cyrillic lookalikes for a few letters
    lambda t: t.translate(str.maketrans("aeokcpxt", "аеоксрхт")),
    # greek suffix
    lambda t: t + "λόγος"[: 1 + len(t) % 3],
    # CJK suffix
    lambda t: t + "的数据引擎"[: 1 + len(t) % 3],
    # kana suffix
    lambda t: t + "データ"[: 1 + len(t) % 3],
    # hangul suffix
    lambda t: t + "데이터"[: 1 + len(t) % 3],
    # arabic (RTL) suffix
    lambda t: t + "بيانات"[: 1 + len(t) % 3],
    # devanagari suffix
    lambda t: t + "डेटा"[: 1 + len(t) % 3],
    # emoji suffix (astral plane -> JVM surrogate pair)
    lambda t: t + "😀🔥✨"[len(t) % 3],
    # combining mark: decomposed e + COMBINING ACUTE appended
    lambda t: t + "é",
    # full-width render of the first two chars
    lambda t: "".join(
        chr(ord(c) - 0x61 + 0xFF41) if "a" <= c <= "z" else c for c in t[:2]
    )
    + t[2:],
    # case-fold hazards: German ß, Turkish dotless ı, Greek final ς
    lambda t: t + "ßız"[len(t) % 3] + ("ς" if len(t) % 2 else "İ"),
]

#: Doc-level spice tokens (exercised even though no vocab token
#: contains them): ZWJ family emoji, NBSP-glued pair (single token to
#: ASCII \s+), bidi-embedded word, ideographic-space neighbor (a real
#: separator in neither engine's \s+ ASCII class).
_SPICE = [
    "👩‍💻",
    "no break",
    "‫مرحبا‬",
    "全　角",
]


def render_token(tok: str) -> str:
    """Deterministic mixed-script rendering; identity for ~1/4 of
    tokens so plain-ASCII paths stay represented in the same corpus."""
    h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "little")
    if h % 4 == 0:
        return tok
    return _FAMILIES[h % len(_FAMILIES)](tok)


def render_text(doc_id: int, text: str) -> str:
    toks = [render_token(t) for t in text.split(" ") if t != ""]
    if doc_id % 8 == 0 and toks:
        toks.insert(doc_id % len(toks), _SPICE[(doc_id // 8) % len(_SPICE)])
    return " ".join(toks)


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew9"
    os.makedirs(dst, exist_ok=True)
    for t in PASSTHROUGH:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"passthrough: {' '.join(PASSTHROUGH)}")

    docs = pq.read_table(f"{SRC}/documents.parquet")
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    # Injectivity guard: no two distinct vocab tokens may collapse to
    # one rendering, or the fixture would CHANGE the dedup/df answer
    # structure instead of merely re-spelling it.
    vocab = {t for txt in texts if txt for t in txt.split(" ") if t}
    rendered = {t: render_token(t) for t in vocab}
    assert len(set(rendered.values())) == len(vocab), "rendering collision"
    new_texts = [
        render_text(i, t) if t is not None else None
        for i, t in zip(ids, texts)
    ]
    cols = {f.name: docs.column(f.name) for f in docs.schema}
    cols["text"] = pa.array(new_texts, type=pa.string())
    cols["n_chars"] = pa.array(
        [len(t) if t is not None else None for t in new_texts],
        type=pa.int64(),
    )
    pq.write_table(pa.table(cols, schema=docs.schema), f"{dst}/documents.parquet")
    n_ascii = sum(1 for t in new_texts if t is not None and t.isascii())
    print(
        f"documents: {len(new_texts)} rows, {len(new_texts) - n_ascii} "
        f"non-ASCII texts ({n_ascii} still pure-ASCII)"
    )


if __name__ == "__main__":
    main()
