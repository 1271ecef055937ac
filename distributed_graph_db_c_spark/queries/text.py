"""Text-analysis queries over ``documents`` (SURVEY.md §2.3): token stats,
term frequency, language ID, quality scoring, fingerprinting, shingles.

Spark side uses only higher-order Column functions (functions/text.py);
oracles re-express the identical semantics in DuckDB list/regex functions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.text import (
    EN_STOPWORDS,
    LANG_MARKERS,
    bpe_token_count,
    fingerprint_md5,
    lang_scores,
    predicted_lang,
    punct_count,
    quality_score,
    shingles,
    token_count,
    tokens,
)
from ..registry import register
from ..sources.tables import load_table

# DuckDB fragments mirroring functions/text.py exactly.
_TOKS_SQL = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"


def _marker_sql(words: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"CAST(len(list_filter(t, x -> list_contains({arr}, x))) AS BIGINT)"


_TOKEN_STATS_SQL = rf"""
WITH toks AS (SELECT doc_id, n_chars, text, {_TOKS_SQL} AS t FROM documents)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_punct,
       CAST(length(text) AS BIGINT) AS n_chars_live,
       n_chars
FROM toks
"""


@register("text_token_stats", oracle=_TOKEN_STATS_SQL)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counting (SURVEY §2.3 'token
    counting'); pure codegen expressions, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count().alias("n_tokens"),
        bpe_token_count().alias("n_bpe_tokens"),
        punct_count().alias("n_punct"),
        F.length("text").cast("long").alias("n_chars_live"),
        "n_chars",
    )


_TERM_FREQ_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
terms AS (SELECT unnest(t) AS term FROM toks)
SELECT term, COUNT(*) AS n FROM terms
GROUP BY term ORDER BY n DESC, term LIMIT 20
"""


@register("text_term_frequency", oracle=_TERM_FREQ_SQL)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency: explode + count + top-k.  At 100 TB this is
    the canonical map-side-combine aggregation; explode stays JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


def _langid_sql() -> str:
    score_cols = ",\n       ".join(
        f"{_marker_sql(m)} AS s_{lang}" for lang, m in LANG_MARKERS.items()
    )
    best = "greatest(s_en, s_es, s_fr, s_de, s_zh)"
    case = "CASE "
    for lang in LANG_MARKERS:
        case += f"WHEN s_{lang} = {best} AND {best} > 0 THEN '{lang}' "
    case += "ELSE 'unknown' END"
    return rf"""
WITH toks AS (SELECT doc_id, lang, {_TOKS_SQL} AS t FROM documents),
scored AS (SELECT doc_id, lang,
       {score_cols}
FROM toks)
SELECT lang, {case} AS predicted, COUNT(*) AS n
FROM scored GROUP BY 1, 2
"""


@register("text_language_id", oracle=_langid_sql())
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (n-gram heuristic, SURVEY §2.3) — confusion
    matrix against the labelled ``lang`` column."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", predicted_lang().alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


def _quality_sql() -> str:
    sw = _marker_sql(EN_STOPWORDS)
    return rf"""
WITH toks AS (SELECT doc_id, text, {_TOKS_SQL} AS t FROM documents),
m AS (
    SELECT doc_id,
           CAST(len(t) AS DOUBLE) AS n_tok,
           CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(list_aggregate(list_transform(t, x -> CAST(length(x) AS BIGINT)), 'sum') AS DOUBLE) AS tok_chars,
           CAST({sw} AS DOUBLE) AS n_sw
    FROM toks
)
SELECT doc_id,
       0.3 * least(n_tok / 20.0, 1.0)
     + 0.2 * (1.0 - least((n_punct / nullif(n_chars, 0.0)) * 4.0, 1.0))
     + 0.25 * (1.0 - abs(coalesce(n_sw / nullif(n_tok, 0.0), 0.0) - 0.4))
     + 0.25 * (1.0 - least(abs(coalesce(tok_chars / nullif(n_tok, 0.0), 0.0) - 5.0) / 5.0, 1.0))
       AS quality
FROM m
"""


@register("text_quality_score", oracle=_quality_sql())
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (length/punct/stopword/word-length) —
    the filter stage of a 100 TB corpus-cleaning pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score().alias("quality"))


_FP_SQL = """
SELECT doc_id, md5(text) AS fp FROM documents
"""


@register("text_fingerprint", oracle=_FP_SQL)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of raw text) — the exact-dedup key."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_md5().alias("fp"))


_SHINGLE_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
SELECT doc_id,
       CAST(CASE WHEN len(t) >= 3
            THEN len(list_distinct(list_transform(generate_series(0, len(t)-3),
                                                  i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])))
            ELSE 0 END AS BIGINT) AS n_shingles
FROM toks
"""


@register("text_shingle_stats", oracle=_SHINGLE_SQL)
def text_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.size(shingles()).cast("long").alias("n_shingles"))


def _pipeline_sql() -> str:
    """quality-filter -> exact-dedup (keep lowest doc_id per fingerprint)
    -> per-language corpus stats, as one DuckDB CTE chain."""
    sw = _marker_sql(EN_STOPWORDS)
    return rf"""
WITH toks AS (SELECT doc_id, lang, text, {_TOKS_SQL} AS t FROM documents),
m AS (
    SELECT doc_id, lang, text,
           CAST(len(t) AS BIGINT) AS n_tok_i,
           CAST(len(t) AS DOUBLE) AS n_tok,
           CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(list_aggregate(list_transform(t, x -> CAST(length(x) AS BIGINT)), 'sum') AS DOUBLE) AS tok_chars,
           CAST({sw} AS DOUBLE) AS n_sw
    FROM toks),
q AS (
    SELECT doc_id, lang, text, n_tok_i,
           0.3 * least(n_tok / 20.0, 1.0)
         + 0.2 * (1.0 - least((n_punct / nullif(n_chars, 0.0)) * 4.0, 1.0))
         + 0.25 * (1.0 - abs(coalesce(n_sw / nullif(n_tok, 0.0), 0.0) - 0.4))
         + 0.25 * (1.0 - least(abs(coalesce(tok_chars / nullif(n_tok, 0.0), 0.0) - 5.0) / 5.0, 1.0))
           AS quality
    FROM m),
kept AS (SELECT * FROM q WHERE quality > 0.89),
first AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
ded AS (SELECT k.* FROM kept k JOIN first f ON k.doc_id = f.doc_id)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tok_i) AS BIGINT) AS n_tokens,
       MIN(quality) AS min_quality, MAX(quality) AS max_quality
FROM ded GROUP BY lang
"""


@register("pipeline_training_prep", oracle=_pipeline_sql())
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-preparation pipeline, composed from this
    module's stages: quality-score filter (> 0.89,
    the corpus median — half the docs drop) -> exact dedup on the md5
    fingerprint keeping the lowest doc_id (this corpus has no exact dups —
    near-dup removal is dedup_minhash_pairs' job — so the stage is
    verified as a pass-through here) -> per-language doc/token
    stats.  One declarative plan: Catalyst fuses the scoring expressions
    into the scan stage, the dedup is one shuffle on the fingerprint, the
    final rollup one more — at 100 TB this is scan + 2 exchanges total,
    no materialization between 'stages'.  min/max (not avg) of quality
    keep the doubles order-independent for the oracle hash-match."""
    docs = load_table(spark, sf_dir, "documents")
    # fingerprint computed BEFORE the shuffle and text dropped: the dedup
    # window only needs (fp, doc_id, lang, quality, n_tok_i), so the
    # shuffle carries ~50 bytes/row instead of the document body — at
    # 100 TB that's the difference between shuffling kilobytes and the
    # whole corpus
    enriched = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("_fp"),
        quality_score().alias("quality"),
        token_count().alias("n_tok_i"),
    )
    kept = enriched.filter(F.col("quality") > 0.89)
    # keep-first dedup as ONE window pass (rank over fingerprint, ordered
    # by doc_id) — a groupBy-min + semi-join back would re-evaluate the
    # expensive scoring expressions for the probe side; this shape scans
    # once and shuffles once (on the fingerprint)
    from pyspark.sql import Window

    w = Window.partitionBy("_fp").orderBy("doc_id")
    ded = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_fp")
    )
    return ded.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok_i").alias("n_tokens"),
        F.min("quality").alias("min_quality"),
        F.max("quality").alias("max_quality"),
    )
