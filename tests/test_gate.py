"""The local correctness gate must replicate the driver's canonicalizer:
sort the RAW pandas frame (no stringification) and reject non-scalar output
columns. Round 2 shipped a list-valued `media_refs` column that the local
gate canonicalized happily while the driver crashed — these tests pin the
gate to the driver's behavior so that class of bug cannot ship green again.
"""

import sys

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo/scripts")

from check_oracles import canon, nonscalar_cols  # noqa: E402


def test_canon_raises_on_list_column():
    df = pd.DataFrame({"a": [1, 2], "refs": [["x"], ["y", "z"]]})
    with pytest.raises(TypeError):
        canon(df)


def test_canon_sorts_raw_scalars():
    df = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    out = canon(df)
    assert list(out.columns) == ["a", "b"]
    assert out["a"].tolist() == ["x", "y"]


def test_nonscalar_cols_flags_arrays_and_structs():
    tbl = pa.table(
        {
            "ok_str": pa.array(["a"]),
            "ok_int": pa.array([1]),
            "bad_list": pa.array([["x"]]),
            "bad_struct": pa.array([{"k": 1}]),
        }
    )
    bad = nonscalar_cols(tbl)
    assert any(b.startswith("bad_list:") for b in bad)
    assert any(b.startswith("bad_struct:") for b in bad)
    assert not any(b.startswith("ok_") for b in bad)


def test_driver_facing_chunk_queries_have_no_list_columns(spark):
    """Every queries() output schema must be scalar-typed (the driver sorts
    raw frames). Checks schemas only — no execution — so it covers every
    entry cheaply."""
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            assert f.dataType.typeName() in {
                "string", "integer", "long", "double", "float", "boolean",
                "date", "timestamp", "decimal", "short", "byte",
            }, f"{name}.{f.name} is non-scalar: {f.dataType.simpleString()}"


def test_oracled_queries_fit_driver_window():
    """The driver's correctness file records only the first 50 queries()
    entries (the round-3 window-overflow lesson): every key in oracle_sql()
    must land inside that window, and every oracle key must name a query."""
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    oracled = set(entrymod.oracle_sql())
    assert oracled <= set(names)
    window = set(names[:50])
    missing = oracled - window
    assert not missing, f"oracled queries outside the 50-entry window: {missing}"


def test_docs_scan_split_guard(spark):
    """_docs_scan spreads a single-split scan to defaultParallelism and
    leaves a well-split input alone (no repartition shuffle at scale)."""
    import __spark_entry__ as entrymod

    par = spark.sparkContext.defaultParallelism
    docs = entrymod._docs_scan(spark, "/root/testdata/sf0.001")
    assert docs.rdd.getNumPartitions() == par  # one file -> spread
    assert set(docs.columns) == {"doc_id", "text"}
    # well-split stand-in: >= par partitions must pass through untouched
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = f"{td}/documents.parquet"
        spark.range(0, 2 * par).selectExpr(
            "id AS doc_id", "CAST(id AS STRING) AS text"
        ).repartition(2 * par).write.parquet(p)
        # tiny files pack into one split via openCostInBytes — inflate it
        # so the 2*par files really plan as >= par splits
        key = "spark.sql.files.openCostInBytes"
        old = spark.conf.get(key)
        spark.conf.set(key, str(128 * 1024 * 1024))
        try:
            wide = entrymod._docs_scan(spark, td)
            plan = wide._jdf.queryExecution().optimizedPlan().toString()
            assert "Repartition" not in plan, plan
        finally:
            spark.conf.set(key, old)


def test_corpus_word_count_within_oracle_caps():
    """The closed-form oracles enumerate bounded generate_series ranges
    (extract_docs: 40 paragraphs x 8 words = 320; fold oracles: 80
    sections / 400 words). A corpus doc outgrowing the tightest cap would
    silently truncate the ORACLE side only (CLAUDE.md invariant) — pin it
    here instead of discovering it as an unexplained hash mismatch."""
    import os

    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        p = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        (mn, mx) = duckdb.sql(
            f"SELECT min(len(regexp_split_to_array(trim(text), '\\s+'))),"
            f" max(len(regexp_split_to_array(trim(text), '\\s+')))"
            f" FROM '{p}'"
        ).fetchone()
        assert mx <= 320, f"sf{sf}: {mx} words > extract_docs oracle cap"
        # layout_docs/table_docs hard-slice words 1..10: a doc shorter than
        # 10 words would emit empty-text spans the kernel filter path and
        # the SQL oracle treat differently (ADVICE r4)
        assert mn >= 10, f"sf{sf}: {mn}-word doc < layout_docs oracle floor"
