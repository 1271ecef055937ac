"""Dev harness mimicking the correctness driver: run every registered query
on Spark AND its DuckDB oracle at sf0.01, compare row count, column names,
and exact values (order-insensitive).

Default is STRICT (driver-faithful): pandas dtypes must match and floats
compare bit-exact — a DuckDB HUGEINT coming back as float64/object where
Spark returns int64 is a FAIL here exactly as it hash-fails in the driver.
``--tolerant`` restores the forgiving numeric compare (useful to tell a
representation mismatch from a genuinely wrong answer).

Usage:
    python tools/oracle_check.py [--tolerant] [query_name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from distributed_graph_db_c_spark.registry import REGISTRY, _ensure_loaded
from distributed_graph_db_c_spark.schemas import TABLE_NAMES
from distributed_graph_db_c_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order: sort by every column (stringified for mixed types)
    key = df.astype(str)
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)


def compare(
    name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, strict: bool = True
) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for col in s.columns:
        sv, dv = s[col], d[col]
        if strict and sv.dtype != dv.dtype:
            problems.append(
                f"col {col}: dtype mismatch spark={sv.dtype} duck={dv.dtype}"
                " (representation drift -> driver hash fail)"
            )
            continue
        if not strict and (sv.dtype.kind == "f" or dv.dtype.kind == "f"):
            svf = pd.to_numeric(sv, errors="coerce")
            dvf = pd.to_numeric(dv, errors="coerce")
            if not ((svf == dvf) | (svf.isna() & dvf.isna())).all():
                diff = (svf - dvf).abs().max()
                problems.append(f"col {col}: float mismatch, max abs diff {diff}")
        else:
            # bit-exact via repr: floats must match to the last digit, the
            # same bar the driver's value hash sets
            eq_mask = (sv.astype(str) == dv.astype(str)) | (sv.isna() & dv.isna())
            if not eq_mask.all():
                bad = (~eq_mask).idxmax()
                problems.append(
                    f"col {col}: value mismatch at sorted row {bad}: spark={sv[bad]!r} duck={dv[bad]!r}"
                )
    return problems


def main() -> int:
    _ensure_loaded()
    argv = sys.argv[1:]
    strict = "--tolerant" not in argv
    argv = [a for a in argv if a != "--tolerant"]
    names = argv or list(REGISTRY)
    spark = get_spark("oracle-check")
    con = duck_connect(SF_DIR)
    failures = 0
    for name in names:
        spec = REGISTRY[name]
        try:
            spark_pdf = spec.run(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"skip  {name}: no oracle (rows-only) — spark rows={len(spark_pdf)}")
            continue
        try:
            duck_pdf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf, strict=strict)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name} ({len(spark_pdf)} rows)")
    print(f"\n{len(names) - failures}/{len(names)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
