"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() in DuckDB at sf0.01, compare row count, sorted
column names, exact values (rows sorted by all columns), AND arrow dtypes —
the driver hashes *typed* values, so a DuckDB HUGEINT (decimal128) vs Spark
int64 mismatch fails the driver even when every value is numerically equal.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from ragflow_spark.ops.tables import TABLES  # noqa: E402
from ragflow_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's canonicalizer EXACTLY: sort the RAW frame by all
    columns (no stringification first). A list/dict-valued column raises
    TypeError here just like it does in the driver — that divergence is how
    the round-2 media_refs regression shipped green locally."""
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


_SCALAR_ARROW_PREFIXES = (
    "int", "uint", "float", "double", "bool", "string", "large_string",
    "date", "timestamp", "decimal", "halffloat",
)


def nonscalar_cols(tbl) -> list[str]:
    """Arrow columns the driver cannot sort/hash (array/map/struct/binary)."""
    bad = []
    for f in tbl.schema:
        t = str(f.type)
        if not t.startswith(_SCALAR_ARROW_PREFIXES):
            bad.append(f"{f.name}:{t}")
    return bad


def arrow_types(tbl) -> dict[str, str]:
    return {f.name: str(f.type) for f in tbl.schema}


def compare(
    name: str,
    sdf: pd.DataFrame,
    odf: pd.DataFrame,
    stypes: dict[str, str] | None = None,
    otypes: dict[str, str] | None = None,
) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    for c in sorted((stypes or {}).keys()):
        st, ot = stypes[c], (otypes or {}).get(c)
        if ot is not None and st != ot:
            problems.append(f"dtype {c}: spark={st} oracle={ot}")
    if len(sdf) != len(odf):
        problems.append(f"rowcount: spark={len(sdf)} oracle={len(odf)}")
    a, b = canon(sdf), canon(odf)
    if len(a) == len(b):
        for c in a.columns:
            if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                import numpy as np

                av = a[c].astype(float).to_numpy()
                bv = b[c].astype(float).to_numpy()
                bad = ~(
                    (av == bv) | (pd.isna(av) & pd.isna(bv))
                )
                if bad.any():
                    md = float(np.nanmax(np.abs(av - bv)))
                    problems.append(f"col {c}: {int(bad.sum())} mismatches, maxdiff={md:.3e}")
            else:
                if not a[c].equals(b[c]):
                    n = int((a[c] != b[c]).sum())
                    i = (a[c] != b[c]).idxmax()
                    problems.append(
                        f"col {c}: {n} mismatches e.g. row{i}: {a[c][i]!r} vs {b[c][i]!r}"
                    )
    return problems


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = [a for a in args if not a.startswith("/")]
    spark = get_spark()
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sarrow = fn(spark, sf_dir).toArrow()
            sdf = sarrow.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {e}")
            failed.append(name)
            continue
        dt = time.time() - t0
        bad = nonscalar_cols(sarrow)
        if bad:
            print(f"FAIL {name}: non-scalar output columns {bad} "
                  "(driver canonicalizer cannot sort these)")
            failed.append(name)
            continue
        try:
            canon(sdf)
        except TypeError as e:
            print(f"FAIL {name}: driver-style raw sort raises {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(sdf)} ({dt:.1f}s) [rows-only]")
            if len(sdf) == 0:
                print(f"WARN {name}: empty result")
            continue
        try:
            oarrow = con.sql(oracles[name]).arrow()
            odf = oarrow.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf, arrow_types(sarrow), arrow_types(oarrow))
        if problems:
            print(f"FAIL {name}: rows={len(sdf)} vs {len(odf)} ({dt:.1f}s)")
            for p in problems:
                print(f"     {p}")
            failed.append(name)
        else:
            print(f"ok   {name}: rows={len(sdf)} == oracle ({dt:.1f}s)")
    print(f"\n{len(failed)} failures: {failed}" if failed else "\nALL OK")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
