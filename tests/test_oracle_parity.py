"""Guard the Spark↔DuckDB oracle parity at sf0.001 (the driver's gate runs
the full set at sf0.01; this keeps the contract green in pytest)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from ragflow_spark.ops.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

# fast, representative subset (one per family)
SUBSET = [
    "token_stats",
    "quality_score",
    "text_profile",
    "retrieval_quality",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "embedding_neardup",
    "knn_bruteforce",
    "pricing_summary",
    "sessionize",
    # round-3 families: chunker folds, dispatch union, model-fronted doc
    # assembly, tokenizer-backed docs, embedding blend
    "chunk_naive_docs",
    "chunk_book_laws_docs",
    # round-5: table/figure assembly through the real construct_table path
    "table_docs",
    "chunk_manual_docs",
    "chunk_presentation_docs",
    "chunk_resume",
    "chunk_audio",
    "es_docs",
    "title_vector_blend",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "fiu":
            df[c] = df[c].astype(float)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_match(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.sql(entrymod.oracle_sql()[name]).df()
    a, b = canon(sdf), canon(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
