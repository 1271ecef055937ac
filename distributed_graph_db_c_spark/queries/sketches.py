"""Sketch aggregates — the sublinear-memory path for 100 TB cardinality
and quantile questions (SURVEY.md §2.3 scale surface; the reference has no
aggregation surface at all, §2.2).

Why sketches are the scale answer: COUNT(DISTINCT) shuffles every distinct
key; percentile_exact shuffles every value.  A sketch is a few KB per
group, merges associatively in the map-side partial aggregate, and the
shuffle carries only the sketch bytes.  Spark's hll_sketch_agg is the
Apache DataSketches HLL; estimates are deterministic for a given input
multiset (no RNG at query time) but implementation-specific, so these
register rows-only (no DuckDB hash-match; DuckDB's approx_distinct is a
different sketch).  Accuracy and mergeability are pinned by
tests/test_sketches.py instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.tables import load_table


@register("sketch_hll_distinct_parts")
def sketch_hll_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct parts per return flag via DataSketches HLL: the partial
    aggregate ships a ~KB sketch per (partition, group) instead of the
    distinct key set — the COUNT(DISTINCT) replacement at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


@register("sketch_hll_mergeable_union")
def sketch_hll_mergeable_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregation WITHOUT rescanning: per-group sketches from the query
    above union into the global sketch (hll_union_agg over sketch binaries)
    — the rollup pattern where tier-2 aggregates consume tier-1 sketch
    columns, never raw data.  (Union keeps the HLL error bound but is not
    bit-identical to a single-pass sketch — mode transitions differ.)"""
    li = load_table(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sketch")
    )
    return per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_parts_global")
    )


@register("sketch_quantiles_totalprice")
def sketch_quantiles_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price quantiles per priority via percentile_approx (Greenwald-
    Khanna sketch): rank-error bounded by 1/accuracy, memory O(accuracy),
    vs an exact percentile's full sort+shuffle of every value.

    The sketch evaluates all four ranks in ONE pass (a single array-typed
    percentile_approx), then the array is flattened to scalar columns so
    the result is canonicalizable by hash/sort drivers — array-typed
    result columns are not (pandas ``sort_values`` cannot factorize
    lists)."""
    o = load_table(spark, sf_dir, "orders")
    q = o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75, 0.95], 10000).alias("qs"),
        F.count("*").alias("n_orders"),
    )
    return q.select(
        "o_orderpriority",
        F.element_at("qs", 1).alias("p25"),
        F.element_at("qs", 2).alias("p50"),
        F.element_at("qs", 3).alias("p75"),
        F.element_at("qs", 4).alias("p95"),
        "n_orders",
    )


# -- round 9: per-group mergeable quantile sketches --------------------------

_DOCLEN_Q_SQL = r"""
WITH b AS (SELECT lang, n_chars,
                  CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                       x -> x <> '')) AS BIGINT) AS n_toks
           FROM documents)
SELECT lang,
       quantile_disc(n_chars, 0.25) AS chars_p25,
       quantile_disc(n_chars, 0.50) AS chars_p50,
       quantile_disc(n_chars, 0.75) AS chars_p75,
       quantile_disc(n_chars, 0.95) AS chars_p95,
       quantile_disc(n_toks, 0.50) AS toks_p50,
       quantile_disc(n_toks, 0.95) AS toks_p95,
       COUNT(*) AS n_docs
FROM b GROUP BY lang
"""


@register("sketch_quantiles_doclen_by_lang", oracle=_DOCLEN_Q_SQL)
def sketch_quantiles_doclen_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP mergeable quantile sketches (round 9 — the banked r8
    candidate a): per-language document-length quantiles (chars AND
    whitespace tokens) — the corpus-curation question the global GK
    gate doesn't answer ("is the French slice full of stubs?"), asked
    per language so filtering thresholds can be set per language.

    Scale shape: one GK sketch per (partition, lang) in the map-side
    partial aggregate — a few KB each — merged associatively in the
    shuffle; values never funnel through a sort, and group skew is
    bounded by sketch size, not group size.  Per-partition merge-order
    invariance is pytest-pinned (5 vs 32 partitions), as is the rank
    error bound in the lossy regime.

    CORPUS-CONTINGENT ORACLE: every language group holds fewer rows
    than the sketch accuracy (10,000) at the driver SFs, so GK runs in
    its EXACT regime, where Spark's query rank (the smallest element
    whose rank covers ceil(p*n)) coincides with DuckDB's
    quantile_disc — probed over mixed multisets, pinned by
    test_quantiles_exact_regime_matches_rank.  At sf1+ group sizes
    exceed the accuracy and the gate's values become estimates with
    rank error <= n/10000 (the bench path; no oracle claim there)."""
    from ..functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    q = docs.groupBy("lang").agg(
        F.percentile_approx("n_chars", [0.25, 0.5, 0.75, 0.95], 10000).alias("cq"),
        F.percentile_approx(token_count(), [0.5, 0.95], 10000).alias("tq"),
        F.count("*").alias("n_docs"),
    )
    return q.select(
        "lang",
        F.element_at("cq", 1).alias("chars_p25"),
        F.element_at("cq", 2).alias("chars_p50"),
        F.element_at("cq", 3).alias("chars_p75"),
        F.element_at("cq", 4).alias("chars_p95"),
        F.element_at("tq", 1).alias("toks_p50"),
        F.element_at("tq", 2).alias("toks_p95"),
        "n_docs",
    )


_FREQ_SQL = """
SELECT CAST(p_brand AS VARCHAR) AS item,
       COUNT(*) AS est_count,
       CAST(0 AS BIGINT) AS err_ub
FROM part
GROUP BY p_brand
ORDER BY est_count DESC, item
LIMIT 5
"""


@register("sketch_freq_items_brand", oracle=_FREQ_SQL)
def sketch_freq_items_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the mergeable Misra–Gries sketch (round 6):
    top-5 part brands by frequency.  Capacity 64 exceeds the 25 distinct
    brands, so the sketch runs in its EXACT regime (err_ub = 0, counts
    exact) and the DuckDB exact-count oracle hash-matches — the same
    oracle-split discipline as mm_ahash_pairs_from_hashes: the exact
    regime is driver-checked here, the lossy regime's n/(k+1) error
    bound and merge invariance are pinned by tests/test_frequency.py.

    Scale: one mapInPandas pass emits <= 64 summary rows per partition;
    the merge is a groupBy-sum over those summaries.  No full-key
    shuffle at any corpus size — the COUNT GROUP BY replacement when
    the key domain (URLs, shingles, tokens) is itself 100 TB-scale."""
    from ..operators.frequency import misra_gries

    part = load_table(spark, sf_dir, "part")
    hh = misra_gries(part, "p_brand", capacity=64)
    return (
        hh.orderBy(F.col("est_count").desc(), F.col("item"))
        .limit(5)
        .select("item", "est_count", "err_ub")
    )


@register("sketch_approx_count_distinct")
def sketch_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=0.02) beside the group
    row count — the one-expression form of the HLL pattern."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
        F.count("*").alias("n_orders"),
    )


@register("sketch_hll_corpus_overlap", oracle=None)
def sketch_hll_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-CORPUS OVERLAP via HLL set algebra (round 7, rows-only —
    register-level sketches are engine-specific; accuracy and the
    exact-merge property are pytest-pinned in tests/test_sketches.py):
    two overlapping document sets (A = first 70%, B = last 70% by
    doc_id, true overlap 40%) are sketched INDEPENDENTLY — one register
    row per partition, values never shuffled — and the estimates
    |A|, |B|, |A∪B|, |A∩B| come from the merge algebra
    (union = elementwise register max, intersection by
    inclusion–exclusion).  This is the "how much of the eval set leaked
    into training?" contamination-rate question at a scale where the
    exact join is unaffordable; the built-in approx_count_distinct
    cannot answer it (its sketch is opaque — no union of separately
    built sketches, no intersection at all)."""
    from ..operators.hll import (
        hll_estimate,
        hll_intersect_estimate,
        hll_sketch,
        hll_union_estimate,
        merge_registers,
    )

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    a = docs.filter(F.col("doc_id") < int(n * 0.7))
    b = docs.filter(F.col("doc_id") >= int(n * 0.3))
    ra = merge_registers(hll_sketch(a, "doc_id"))
    rb = merge_registers(hll_sketch(b, "doc_id"))
    rows = [
        ("A", float(hll_estimate(ra))),
        ("B", float(hll_estimate(rb))),
        ("union", float(hll_union_estimate(ra, rb))),
        ("intersection", float(hll_intersect_estimate(ra, rb))),
    ]
    return spark.createDataFrame(rows, "set_name string, est_cardinality double")


# -- round 10: two-level quantile rollup (lang x source) ----------------------

ROLLUP_ALL = "<ALL>"

# The oracle mirrors the histogram-merge computation cell for cell: the
# same three-level UNION ALL, the same cumulative-rank rule
# (smallest value whose running count reaches ceil(p*n)) — no
# quantile_disc, so there is NO rank-convention seam between engines.
_ROLLUP_Q_SQL = """
WITH hist AS (
  SELECT lang, source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1, 2, 3),
lang_hist AS (
  SELECT lang, n_chars, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM hist GROUP BY 1, 2),
global_hist AS (
  SELECT n_chars, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM lang_hist GROUP BY 1),
lvl AS (
  SELECT lang, source, n_chars, cnt FROM hist
  UNION ALL
  SELECT lang, '<ALL>' AS source, n_chars, cnt FROM lang_hist
  UNION ALL
  SELECT '<ALL>' AS lang, '<ALL>' AS source, n_chars, cnt FROM global_hist),
cum AS (
  SELECT lang, source, n_chars, cnt,
         SUM(cnt) OVER (PARTITION BY lang, source ORDER BY n_chars) AS c,
         SUM(cnt) OVER (PARTITION BY lang, source) AS n
  FROM lvl)
SELECT lang, source,
       MIN(CASE WHEN c >= CAST(ceil(0.25 * n) AS BIGINT) THEN n_chars END) AS chars_p25,
       MIN(CASE WHEN c >= CAST(ceil(0.50 * n) AS BIGINT) THEN n_chars END) AS chars_p50,
       MIN(CASE WHEN c >= CAST(ceil(0.75 * n) AS BIGINT) THEN n_chars END) AS chars_p75,
       MIN(CASE WHEN c >= CAST(ceil(0.95 * n) AS BIGINT) THEN n_chars END) AS chars_p95,
       CAST(MAX(n) AS BIGINT) AS n_docs
FROM cum GROUP BY 1, 2
"""


def _hist_quantiles(
    hist: DataFrame,
    lang_col=None,
    source_col=None,
    value_col: str = "n_chars",
    prefix: str = "chars",
) -> DataFrame:
    """Per-group quantiles FROM A HISTOGRAM: running count over the
    value axis, then the smallest value whose running count reaches
    ceil(p*n).  The window partitions by group and orders by value, so
    the shuffle carries histogram CELLS (bounded by the value domain),
    never raw rows.  Pass a pre-labeled (lang, source, value, cnt)
    frame with the column args omitted when the labels must survive as
    REAL data columns (the global tier — see the gates).  ``value_col``
    names the bounded-integer metric axis — the round-11 token rollup
    reuses the identical machinery over a DERIVED metric."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang", "source")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("lang", "source")
    if lang_col is not None:
        hist = hist.select(
            lang_col.alias("lang"), source_col.alias("source"), value_col, "cnt"
        )
    h = hist.withColumn("c", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wt)
    )

    def q(p: float):
        rank = F.ceil(F.lit(p) * F.col("n")).cast("long")
        return F.min(F.when(F.col("c") >= rank, F.col(value_col)))

    return h.groupBy("lang", "source").agg(
        q(0.25).alias(f"{prefix}_p25"),
        q(0.50).alias(f"{prefix}_p50"),
        q(0.75).alias(f"{prefix}_p75"),
        q(0.95).alias(f"{prefix}_p95"),
        F.max("n").alias("n_docs"),
    )


@register("sketch_quantiles_rollup_lang_source", oracle=_ROLLUP_Q_SQL)
def sketch_quantiles_rollup_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-LEVEL quantile rollup (round 10 — the banked r9 handoff
    candidate a): document-length quantiles at (lang, source), per-lang,
    and global, where each rollup level is computed by MERGING the
    level below's summaries — raw rows are scanned exactly once
    (pytest plan-pinned), the sketch-rollup pattern the HLL union gate
    established, applied to quantiles.  The curation ask this answers:
    "which SOURCE within a language is full of stubs?" — per-source
    thresholds need the leaf level; per-language context needs the
    rollup beside it.

    The mergeable summary here is a VALUE HISTOGRAM, not GK: document
    length is a bounded integer domain (every corpus: n_chars <= a few
    million distinct values), so (value, count) cells are a summary
    that (a) merges associatively by addition — the lang level is a
    re-agg of leaf cells, the global level a re-agg of lang cells,
    neither touching documents — and (b) is EXACT at every scale, not
    just below a sketch accuracy: unlike the per-lang GK gate, this
    oracle is NOT corpus-contingent (no lossy regime exists; the
    sf1-and-beyond story is the same arithmetic).  Memory per group is
    bounded by the value domain, never group size.  Quantile rule on
    both engines: smallest value whose running count reaches ceil(p*n)
    — stated identically in the SQL, so no rank-convention seam.

    Scale shape: one raw scan builds the leaf histogram (map-side
    partial combine on (lang, source, value)); every later exchange
    carries histogram cells.  The cumulative window partitions by
    group, so skew is bounded by domain size.  Merge-path invariance
    (leaf cells -> lang -> global vs direct computation) and the
    single-scan plan are pytest-pinned."""
    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.groupBy("lang", "source", "n_chars")
        .agg(F.count("*").alias("cnt"))
        # one raw scan feeds three levels: materialize the (domain-
        # bounded) leaf histogram instead of re-reading documents
        .localCheckpoint(eager=True)
    )
    lang_hist = hist.groupBy("lang", "n_chars").agg(F.sum("cnt").alias("cnt"))
    global_hist = lang_hist.groupBy("n_chars").agg(F.sum("cnt").alias("cnt"))
    leaf = _hist_quantiles(hist, F.col("lang"), F.col("source"))
    lang_lvl = _hist_quantiles(lang_hist, F.col("lang"), F.lit(ROLLUP_ALL))
    # The global tier has ONE group; with literal '<ALL>' labels in the
    # window's partitionBy, Catalyst constant-folds the spec away and
    # WindowExec warns "No Partition Defined" — benign here (the input
    # is the domain-bounded cell aggregate, never raw rows), but the
    # warning would mask a REAL unpartitioned-window regression one
    # day (r10 verdict item 7).  Bake the labels into a MATERIALIZED
    # single-partition frame instead: folding cannot cross the RDD
    # barrier, so the tier's window partitions by real data columns —
    # one partition BY DATA, explicitly, and the run is warning-free.
    global_labeled = (
        global_hist.select(
            F.lit(ROLLUP_ALL).alias("lang"),
            F.lit(ROLLUP_ALL).alias("source"),
            "n_chars",
            "cnt",
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    global_lvl = _hist_quantiles(global_labeled)
    return leaf.unionByName(lang_lvl).unionByName(global_lvl)


# The oracle mirrors the token rollup cell for cell — same tokenizer
# fragment as the token-stats family (functions/text.tokens: trim,
# lower, split on \s+), same three-level UNION ALL, same cumulative-
# rank rule, no quantile_disc (no rank-convention seam).
_TOKEN_ROLLUP_SQL = r"""
WITH toks AS (
  SELECT lang, source,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_toks
  FROM documents),
hist AS (
  SELECT lang, source, n_toks, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2, 3),
lang_hist AS (
  SELECT lang, n_toks, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM hist GROUP BY 1, 2),
global_hist AS (
  SELECT n_toks, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM lang_hist GROUP BY 1),
lvl AS (
  SELECT lang, source, n_toks, cnt FROM hist
  UNION ALL
  SELECT lang, '<ALL>' AS source, n_toks, cnt FROM lang_hist
  UNION ALL
  SELECT '<ALL>' AS lang, '<ALL>' AS source, n_toks, cnt FROM global_hist),
cum AS (
  SELECT lang, source, n_toks, cnt,
         SUM(cnt) OVER (PARTITION BY lang, source ORDER BY n_toks) AS c,
         SUM(cnt) OVER (PARTITION BY lang, source) AS n
  FROM lvl)
SELECT lang, source,
       MIN(CASE WHEN c >= CAST(ceil(0.25 * n) AS BIGINT) THEN n_toks END) AS toks_p25,
       MIN(CASE WHEN c >= CAST(ceil(0.50 * n) AS BIGINT) THEN n_toks END) AS toks_p50,
       MIN(CASE WHEN c >= CAST(ceil(0.75 * n) AS BIGINT) THEN n_toks END) AS toks_p75,
       MIN(CASE WHEN c >= CAST(ceil(0.95 * n) AS BIGINT) THEN n_toks END) AS toks_p95,
       CAST(MAX(n) AS BIGINT) AS n_docs
FROM cum GROUP BY 1, 2
"""


@register("sketch_token_quantiles_rollup", oracle=_TOKEN_ROLLUP_SQL)
def sketch_token_quantiles_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-LEVEL TOKEN-COUNT quantile rollup (round 11 — the r10
    handoff's banked candidate a): the histogram-merge machinery of
    sketch_quantiles_rollup_lang_source generalized to a DERIVED
    bounded-integer metric — whitespace token count — proving the
    shape works for ANY such metric, not just a stored column.  The
    curation ask: token budgets are what training mixtures are priced
    in, so "which SOURCE within a language is full of token-starved
    stubs?" wants TOKEN quantiles at (lang, source) with per-lang and
    global rollups beside them.

    Identical scale contract as the chars rollup (shared
    _hist_quantiles): ONE raw scan computes the token count per doc
    (pure codegen expression — functions/text.token_count, no Python
    anywhere) and builds the leaf histogram via map-side partial
    combine; the lang and global tiers MERGE histogram cells by
    addition, never re-reading documents (plan-pinned); exact at every
    scale — token count is a bounded integer domain, so the MERGE has
    no lossy regime.  No oracle contingency: the histogram arithmetic
    is exact on both engines, and as of r12 the token counts agree on
    EVERY input — ``functions/text.tokens`` extracts ``\\S+`` runs
    (never an empty token) exactly matching the DuckDB mirror's
    all-whitespace filter, with the former trim-then-split edge
    (leading tab/newline => spurious empty token) closed and
    adversarially gated by text_tokenizer_whitespace_edge.  The
    global tier rides the same
    materialized-label single-partition window as the chars gate
    (windows always partition by real data columns)."""
    from ..functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.select("lang", "source", token_count().alias("n_toks"))
        .groupBy("lang", "source", "n_toks")
        .agg(F.count("*").alias("cnt"))
        # one raw scan feeds three levels: materialize the (domain-
        # bounded) leaf histogram instead of re-reading documents
        .localCheckpoint(eager=True)
    )
    lang_hist = hist.groupBy("lang", "n_toks").agg(F.sum("cnt").alias("cnt"))
    global_hist = lang_hist.groupBy("n_toks").agg(F.sum("cnt").alias("cnt"))
    leaf = _hist_quantiles(
        hist, F.col("lang"), F.col("source"), value_col="n_toks", prefix="toks"
    )
    lang_lvl = _hist_quantiles(
        lang_hist, F.col("lang"), F.lit(ROLLUP_ALL),
        value_col="n_toks", prefix="toks",
    )
    # same structural warning fix as the chars rollup: materialize the
    # constant labels so the global tier's window partitions by real
    # data columns (see sketch_quantiles_rollup_lang_source)
    global_labeled = (
        global_hist.select(
            F.lit(ROLLUP_ALL).alias("lang"),
            F.lit(ROLLUP_ALL).alias("source"),
            "n_toks",
            "cnt",
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    global_lvl = _hist_quantiles(
        global_labeled, value_col="n_toks", prefix="toks"
    )
    return leaf.unionByName(lang_lvl).unionByName(global_lvl)
