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


def test_xml_roundtrip_preserves_values_and_types(spark, tmp_path):
    """XML write -> strict read roundtrip over a typed slice of nation:
    values and dtypes survive, schema is enforced (never inferred)."""
    from distributed_graph_db_c_spark.sources.tables import load_table
    from distributed_graph_db_c_spark.sources.text_formats import (
        read_xml,
        write_xml,
    )

    nation = load_table(spark, "/root/testdata/sf0.01", "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "nation_xml")
    write_xml(nation, path, row_tag="nation")
    back = read_xml(
        spark, path, "n_nationkey int, n_name string, n_regionkey int",
        row_tag="nation",
    )
    orig = sorted(tuple(r) for r in nation.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == orig
    assert dict(back.dtypes) == dict(nation.dtypes)


def test_xml_permissive_quarantines_malformed_rows(spark, tmp_path):
    """A malformed row element must land in _corrupt (dead-letter
    contract), never silently drop, while good rows parse."""
    import os

    from distributed_graph_db_c_spark.sources.text_formats import (
        read_xml_permissive,
    )

    d = tmp_path / "dirty"
    os.makedirs(d)
    (d / "part.xml").write_text(
        "<rows>"
        "<row><id>1</id><name>ok</name></row>"
        "<row><id>not_a_number</id><name>bad</name></row>"
        "<row><id>3</id><name>ok2</name></row>"
        "</rows>"
    )
    got = read_xml_permissive(
        spark, str(d), "id long, name string"
    ).collect()
    good = [r for r in got if r["_corrupt"] is None]
    bad = [r for r in got if r["_corrupt"] is not None]
    assert {r["id"] for r in good} == {1, 3}
    assert len(bad) == 1 and bad[0]["id"] is None
