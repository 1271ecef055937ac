"""Reusable text-analysis Column expressions (SURVEY.md §2.3 extensions).

All JVM-side built-ins (split/filter/transform/aggregate higher-order
functions) — no Python UDFs in any text hot path, so whole-stage codegen
applies and the same expressions run unchanged over 100 TB of documents.

Every expression has a DuckDB-equivalent formulation (see queries/text.py)
so the oracle gate covers the semantics exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F

# Per-language marker words for the n-gram/stopword language-ID heuristic.
# Deterministic argmax with fixed tie order (en > es > fr > de > zh).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "fr": ["le", "la", "les", "et", "des", "une", "est", "dans"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "for", "on", "with", "as", "at", "by", "an"]

# BPE-ish tokenizer: word runs or single non-space punctuation.
BPE_REGEX = r"\w+|[^\w\s]"


def tokens(col: str | F.Column = "text") -> F.Column:
    r"""Lower-cased whitespace tokens, empties dropped.

    ``regexp_extract_all(lower(text), '\S+')`` — extract the non-whitespace
    runs directly instead of trim-then-split.  The r11 review surfaced a
    latent cross-engine seam in the old idiom: Spark's ``trim`` strips only
    0x20 spaces, so a document with a leading tab/newline split into a
    spurious empty first token, while every DuckDB oracle mirror
    (``list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')``)
    filters ALL-whitespace empties.  Extraction can never produce an empty
    match, so the two engines now agree on every input, including
    tab/newline-padded documents (adversarially exercised by the
    ``text_tokenizer_whitespace_edge`` gate and pinned corpus-bit-identical
    to the old idiom for space-clean documents in
    tests/test_text_functions.py).  ``RegExpExtractAll`` is a JVM built-in
    inside whole-stage codegen — no HOF lambda, no Python.

    ``col`` may be a column NAME or a Column EXPRESSION (the
    whitespace-edge gate tokenizes synthesized tab/newline-padded
    variants of the corpus text)."""
    c = col if isinstance(col, F.Column) else F.col(col)
    return F.regexp_extract_all(F.lower(c), F.lit(r"\S+"), F.lit(0))


def token_count(col: str | F.Column = "text") -> F.Column:
    return F.size(tokens(col)).cast("long")


def bpe_token_count(col: str = "text") -> F.Column:
    """Token count under the BPE-ish regex (words + punctuation marks)."""
    return F.size(F.regexp_extract_all(F.col(col), F.lit(BPE_REGEX), F.lit(0))).cast("long")


def marker_hits(toks: F.Column, markers: list[str]) -> F.Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).cast("long")


def lang_scores(col: str = "text") -> dict[str, F.Column]:
    t = tokens(col)
    return {lang: marker_hits(t, m) for lang, m in LANG_MARKERS.items()}


def predicted_lang(col: str = "text") -> F.Column:
    """argmax of marker hits, strict-> comparisons in fixed order so ties
    resolve deterministically; all-zero -> 'unknown'."""
    s = lang_scores(col)
    best = F.greatest(*s.values())
    expr = F.lit("unknown")
    for lang in reversed(list(LANG_MARKERS)):  # reversed so earlier langs win ties
        expr = F.when((s[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def punct_count(col: str = "text") -> F.Column:
    return F.size(F.regexp_extract_all(F.col(col), F.lit(r"[^\w\s]"), F.lit(0))).cast("long")


def mean_token_len(col: str = "text") -> F.Column:
    t = tokens(col)
    total = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return total.cast("double") / F.nullif(F.size(t).cast("double"), F.lit(0.0))


def stopword_ratio(col: str = "text") -> F.Column:
    t = tokens(col)
    return marker_hits(t, EN_STOPWORDS).cast("double") / F.nullif(
        F.size(t).cast("double"), F.lit(0.0)
    )


def quality_score(col: str = "text") -> F.Column:
    """Composite [0,1]-ish quality heuristic: long enough, low punctuation
    noise, natural stopword density, sane word lengths.  Fixed expression
    order -> bit-deterministic doubles."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_ratio = punct_count(col).cast("double") / F.nullif(
        F.length(col).cast("double"), F.lit(0.0)
    )
    punct_score = F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))
    sw = F.coalesce(stopword_ratio(col), F.lit(0.0))
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.4))
    mtl = F.coalesce(mean_token_len(col), F.lit(0.0))
    wordlen_score = F.lit(1.0) - F.least(F.abs(mtl - F.lit(5.0)) / F.lit(5.0), F.lit(1.0))
    return (
        F.lit(0.3) * len_score
        + F.lit(0.2) * punct_score
        + F.lit(0.25) * sw_score
        + F.lit(0.25) * wordlen_score
    )


def shingles(col: str = "text", k: int = 3) -> F.Column:
    """Word-level k-shingles (distinct), the unit for Jaccard/MinHash dedup."""
    t = tokens(col)
    n = F.size(t)
    idx = F.sequence(F.lit(0), n - F.lit(k))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(k)])
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(F.array().cast("array<string>"))


def fingerprint_md5(col: str = "text") -> F.Column:
    return F.md5(F.col(col))
