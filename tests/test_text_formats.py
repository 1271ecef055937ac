"""CSV/JSONL codecs: round-trip fidelity against the parquet source of
truth, FAILFAST on garbage, quarantine capture in permissive mode."""

from __future__ import annotations

import os

import pytest
from py4j.protocol import Py4JJavaError

from distributed_graph_db_c_spark.sources.tables import load_table
from distributed_graph_db_c_spark.sources.text_formats import (
    read_csv,
    read_jsonl,
    read_jsonl_permissive,
)
from distributed_graph_db_c_spark.streaming.sources import cleanup, scratch_dir

SF_DIR = "/root/testdata/sf0.001"
NATION_DDL = "n_nationkey int, n_name string, n_regionkey int"


@pytest.fixture(scope="module")
def nation_rows(spark):
    return sorted(tuple(r) for r in load_table(spark, SF_DIR, "nation").collect())


def test_csv_roundtrip_matches_parquet(spark, nation_rows):
    scratch = scratch_dir("csv")
    try:
        src = load_table(spark, SF_DIR, "nation")
        src.coalesce(1).write.mode("overwrite").option("header", True).csv(f"{scratch}/n")
        got = read_csv(spark, f"{scratch}/n", NATION_DDL)
        assert sorted(tuple(r) for r in got.collect()) == nation_rows
    finally:
        cleanup(scratch)


def test_jsonl_roundtrip_matches_parquet(spark, nation_rows):
    scratch = scratch_dir("jsonl")
    try:
        src = load_table(spark, SF_DIR, "nation")
        src.coalesce(1).write.mode("overwrite").json(f"{scratch}/n")
        got = read_jsonl(spark, f"{scratch}/n", NATION_DDL)
        assert sorted(tuple(r) for r in got.collect()) == nation_rows
    finally:
        cleanup(scratch)


def test_failfast_rejects_malformed(spark):
    scratch = scratch_dir("badjson")
    try:
        os.makedirs(f"{scratch}/in", exist_ok=True)
        with open(f"{scratch}/in/a.jsonl", "w") as f:
            f.write('{"n_nationkey": 1, "n_name": "X", "n_regionkey": 0}\n')
            f.write("THIS IS NOT JSON\n")
        with pytest.raises(Py4JJavaError):
            read_jsonl(spark, f"{scratch}/in", NATION_DDL).collect()
    finally:
        cleanup(scratch)


def test_permissive_quarantines_malformed(spark):
    scratch = scratch_dir("quarantine")
    try:
        os.makedirs(f"{scratch}/in", exist_ok=True)
        with open(f"{scratch}/in/a.jsonl", "w") as f:
            f.write('{"n_nationkey": 1, "n_name": "X", "n_regionkey": 0}\n')
            f.write("THIS IS NOT JSON\n")
        got = read_jsonl_permissive(spark, f"{scratch}/in", NATION_DDL)
        clean = got.filter("_corrupt IS NULL").collect()
        dirty = got.filter("_corrupt IS NOT NULL").collect()
        assert len(clean) == 1 and clean[0]["n_name"] == "X"
        assert len(dirty) == 1 and dirty[0]["_corrupt"] == "THIS IS NOT JSON"
    finally:
        cleanup(scratch)
