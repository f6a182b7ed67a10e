"""The five _ltks-backed driver oracles must survive a corpus that is NOT
all-lowercase ascii (the standing five-oracle trap from CLAUDE.md: the
oracles used to mirror only en_normalize, relying on tokenize()'s
lowercase + full→half width folds being no-ops).

This builds an uppercase / capitalized / full-width-latin corpus profile
(a pure function of doc index — no RNG) as a documents.parquet in tmp and
runs each query's REAL Spark path against its DuckDB oracle on it.
Separators stay ASCII spaces (RE2 '\\s' is ascii-only; full-width space
handling is documented out of the oracle contract)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

# mixed case, full-width latin (Ｆ..ｚ), digits-in-word, suffix-bearing
# forms — every class tokenize() folds
_POOL = [
    "KEY", "Agg", "ROW", "scan", "ｓｌｏｗ", "ＦＡＳＴ", "Table", "value",
    "PARTS", "hash", "Merging", "studies", "ＳＰＡＲＫ２", "windowED",
]

_LTKS_QUERIES = [
    "tokenize_docs",
    "es_docs",
    "chunk_picture",
    "chunk_audio",
    "chunk_resume",
]


@pytest.fixture(scope="module")
def mixed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mixed_corpus")
    rows = []
    for i in range(16):
        words = [_POOL[(i + j) % len(_POOL)] for j in range(12)]
        text = " ".join(words)
        rows.append((i, text, "en", f"s{i % 3}", len(text)))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(d / "documents.parquet")
    return str(d)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "fiu":
            df[c] = df[c].astype(float)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", _LTKS_QUERIES)
def test_ltks_oracle_survives_mixed_case(spark, mixed_dir, name):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{mixed_dir}/documents.parquet'"
    )
    sdf = _canon(entrymod.queries()[name](spark, mixed_dir).toPandas())
    odf = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(sdf.columns) == list(odf.columns), name
    assert len(sdf) == len(odf), (name, len(sdf), len(odf))
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)
