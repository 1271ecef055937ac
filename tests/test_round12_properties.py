"""Round-12 property pins.

1. Tokenizer whitespace-edge alignment (the r11 review's latent find,
   r11 verdict item 3): ``functions/text.tokens`` now extracts ``\\S+``
   runs, which (a) is BIT-IDENTICAL to the old trim-then-split idiom on
   every driver corpus document (the equality sweep below is the
   evidence bridge for the token-family gates whose driver re-pin
   rotates on the normal horizon rather than holding an r12 head slot),
   and (b) diverges from the old idiom EXACTLY on the adversarial
   whitespace-padded inputs where the old idiom disagreed with the
   DuckDB oracle mirrors — pinned with hand-computed expectations.

2. Generation-versioned minhash/LSH index reads (r11 verdict item 5):
   the IVF generation-directory pattern applied to the persisted
   minhash and LSH-bucket indexes — a reader that resolved before a
   nightly rebuild keeps answering from its generation bit-identically
   (tests mirror test_ivf_reader_during_swap_pins_old_generation).
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _old_tokens(col: str = "text") -> F.Column:
    """The pre-r12 trim-then-split idiom, kept here verbatim as the
    equality-sweep reference (space-trim only — the seam under test)."""
    trimmed = F.trim(F.lower(F.col(col)))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def test_tokens_corpus_bit_identical_to_old_idiom(spark):
    """The alignment is a NO-OP on every driver corpus document (both
    test scale factors): the old and new token arrays are equal row for
    row.  This is the evidence bridge that lets the token-family gates
    not holding an r12 head slot keep their published driver rows: the
    diff cannot have changed their results on driver fixtures."""
    from distributed_graph_db_c_spark.functions.text import tokens

    for sf in ("sf0.001", "sf0.01"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        diff = (
            docs.select(tokens().alias("new"), _old_tokens().alias("old"))
            .filter(
                ~(F.col("new") == F.col("old"))
                | F.col("new").isNull()
                | F.col("old").isNull()
            )
            .count()
        )
        assert diff == 0, f"{sf}: {diff} documents tokenize differently"


def test_tokens_whitespace_edge_adversarial(spark):
    """Hand-computed expectations on the exact inputs the r11 review
    named: leading tab, trailing newline, all-whitespace, empty, and a
    non-breaking space (NOT \\s in either engine's default regex class —
    must stay inside a token)."""
    from distributed_graph_db_c_spark.functions.text import tokens

    rows = [
        ("\thello World",),
        ("hello world\n",),
        (" \t\n ",),
        ("",),
        ("a b",),
        ("one  two\tthree\nfour",),
    ]
    got = [
        r.t
        for r in spark.createDataFrame(rows, ["text"])
        .select(tokens().alias("t"))
        .collect()
    ]
    assert got == [
        ["hello", "world"],
        ["hello", "world"],
        [],
        [],
        ["a b"],
        ["one", "two", "three", "four"],
    ]
    # and the OLD idiom genuinely diverged on the padded inputs — the
    # seam was real, not hypothetical
    old = [
        r.t
        for r in spark.createDataFrame(rows, ["text"])
        .select(_old_tokens().alias("t"))
        .collect()
    ]
    assert old[0] == ["", "hello", "world"]
    assert old[1] == ["hello", "world", ""]


def test_tokens_matches_duckdb_filter_semantics_on_padded_corpus(spark):
    """Cross-engine differential on MANUFACTURED adversarial inputs: pad
    every sf0.001 document with the tab/newline variants the
    text_tokenizer_whitespace_edge gate uses and compare per-document
    token COUNTS against DuckDB's all-whitespace-filter idiom."""
    import duckdb

    from distributed_graph_db_c_spark.functions.text import token_count

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r.doc_id: (r.tp, r.pd)
        for r in docs.select(
            "doc_id",
            token_count(F.concat(F.lit("\t"), F.col("text"))).alias("tp"),
            token_count(F.concat(F.lit(" \t"), F.col("text"), F.lit("\n "))).alias(
                "pd"
            ),
        ).collect()
    }
    con = duckdb.connect()
    toks = r"len(list_filter(string_split_regex(lower({e}), '\s+'), x -> x <> ''))"
    want = {
        int(doc_id): (int(tp), int(pd))
        for doc_id, tp, pd in con.execute(
            f"""SELECT doc_id,
                       {toks.format(e="chr(9) || text")},
                       {toks.format(e="' ' || chr(9) || text || chr(10) || ' '")}
                FROM '{SF_DIR}/documents.parquet'"""
        ).fetchall()
    }
    assert got == want
