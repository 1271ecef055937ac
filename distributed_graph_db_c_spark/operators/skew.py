"""Skew-mitigation join (SURVEY.md build notes: 'skewed keys -> salting or
AQE skew-join').

AQE's skew-join splitting handles skewed SHUFFLE PARTITIONS transparently
(enabled in session.py); explicit salting is still the tool when one key's
rows exceed a single task's memory no matter how partitions split, or when
AQE statistics are unavailable (e.g. inside a foreachBatch).  The classic
decomposition:

- fact side: append salt = pmod(xxhash64(<unique col>), n_salts) — rows of
  one hot key scatter across n_salts sub-keys, deterministically.
- dim side:  explode each row into all n_salts salt values.
- equi-join on (key, salt): the hot key's work spreads over n_salts tasks;
  dim fan-out costs n_salts x |dim|, the price of the spread.

Result set is EXACTLY the plain join's (verified in tests/test_skew.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    fact_unique_col: str | None = None,
) -> DataFrame:
    """Inner equi-join of ``fact`` (skewed) with ``dim`` (small/medium) on
    ``on``, salted ``n_salts`` ways.  ``fact_unique_col`` seeds the salt
    (any well-distributed column; defaults to every fact column, i.e. the
    whole row)."""
    seed_cols = [fact_unique_col] if fact_unique_col else list(fact.columns)
    f = fact.withColumn("_salt", F.pmod(F.xxhash64(*seed_cols), F.lit(n_salts)))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, on=[on, "_salt"]).drop("_salt")
