"""Full-scale dictionary proof (r4 verdict ask #2): the pluggable knobs
accept reference-sized files, but nothing had shown the trie builder, DFS
segmentation, broadcast path and oracle SQL behave AT that scale
(~500k-entry huqie.txt — rag/nlp/rag_tokenizer.py:38-88 — and a ~30k-entry
synonym json). Dictionaries here are synthetic and deterministic (pure
functions of the entry index; no real-world word lists shipped)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BIG_DICT_N = 500_000
_BIG_DICT_PATH = f"/tmp/ragflow_spark_big_huqie_v1_{BIG_DICT_N}.txt"


def _write_big_dict(path: str, n: int = BIG_DICT_N) -> None:
    """Synthetic huqie-format file: n three-char CJK words over an 80-char
    syllabary (80^3 = 512k combinations), raw counts + cycling POS tags."""
    chars = [chr(0x4E00 + i) for i in range(80)]
    pos = ["n", "v", "a", "ns", "nt", "d"]
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        k = 0
        for a in chars:
            for b in chars:
                for c in chars:
                    if k >= n:
                        break
                    fh.write(f"{a}{b}{c} {(k * 7) % 999_983 + 1} {pos[k % 6]}\n")
                    k += 1
                if k >= n:
                    break
            if k >= n:
                break
    os.replace(tmp, path)


def big_dict_path() -> str:
    if not os.path.exists(_BIG_DICT_PATH):
        _write_big_dict(_BIG_DICT_PATH)
    return _BIG_DICT_PATH


def test_big_dict_trie_build_and_segmentation():
    """Driver-side: a 500k-entry trie builds inside a sane time bound and
    the FW/BW + DFS segmentation still returns dictionary words."""
    from ragflow_spark.functions.trie_tokenizer import (
        TrieTokenizer,
        load_dict_file,
    )

    path = big_dict_path()
    t0 = time.time()
    entries = load_dict_file(path)
    t_load = time.time() - t0
    assert len(entries) == BIG_DICT_N
    t0 = time.time()
    tok = TrieTokenizer(entries)
    t_build = time.time() - t0
    # generous CI bound; measured ~2-4 s load + ~2-5 s build locally
    assert t_load + t_build < 120, (t_load, t_build)

    # a sentence of dictionary words segments into exactly those words
    w1, w2, w3 = entries[0][0], entries[123_456][0], entries[499_999][0]
    got = tok.tokenize(w1 + w2 + w3)
    assert all(t in tok._dict or len(t) == 1 for t in got.split())
    # every 3-char dict word must be reachable by direct lookup
    assert tok.freq(w2) == entries[123_456][1]
    print(f"# big-dict load {t_load:.1f}s build {t_build:.1f}s")


def test_big_dict_executor_equals_driver():
    """Subprocess (env must be set before the JVM forks python workers):
    with $RAGFLOW_SPARK_HUQIE_DICT at 500k entries, the executor-side
    with_ltks output equals the driver-side kernel tokenize on the same
    text — the fail-loud contract's other half (both sides resolved the
    SAME dictionary)."""
    path = big_dict_path()
    code = r"""
import sys
sys.path.insert(0, %(repo)r)
from ragflow_spark.session import get_spark
from ragflow_spark.operators.extract import with_ltks
from ragflow_spark.functions.trie_tokenizer import tokenize

spark = get_spark(cores=2, shuffle_partitions=4)
chars = [chr(0x4E00 + i) for i in range(80)]
texts = [
    "".join(chars[(i * 13 + j) %% 80] for j in range(9)) + " spark rows"
    for i in range(24)
]
df = spark.createDataFrame(
    [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
)
rows = {r["doc_id"]: r["content_ltks"] for r in with_ltks(df).collect()}
bad = [i for i, t in enumerate(texts) if rows[str(i)] != tokenize(t)]
assert not bad, bad
multi = sum(1 for t in rows.values() if any(len(tk) == 3 for tk in t.split()))
assert multi > 0, "big dict never produced a 3-char segmentation"
spark.stop()
print("EXECUTOR_EQ_DRIVER_OK")
""" % {"repo": REPO}
    env = dict(os.environ, RAGFLOW_SPARK_HUQIE_DICT=path)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd="/tmp",
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert "EXECUTOR_EQ_DRIVER_OK" in out.stdout


def test_full_scale_synonym_join_path(spark, tmp_path):
    """In-process via reset_dictionaries(): a 30k-entry synonym json takes
    the broadcast-dim-join plan (>1000 entries), query_build completes on
    the corpus, emits expansions from the big dictionary, and the
    regenerated 30k-row VALUES oracle still matches in DuckDB."""
    import duckdb
    import pandas as pd

    from ragflow_spark.ops import retrieval as r

    syn = {f"ztok{i}": [f"zs{i}a", f"zs{i}b"] for i in range(29_999)}
    syn["fast"] = ["quick30k"]  # corpus word → expansion must surface
    p = tmp_path / "syn30k.json"
    p.write_text(json.dumps(syn))
    os.environ[r.SYNONYM_ENV] = str(p)
    try:
        r.reset_dictionaries()
        assert len(r.SYNONYMS) == 30_000
        df = r.query_build(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" in plan  # dim join, not a 30k-entry literal map
        sdf = df.toPandas()
        syn_terms = set(
            sdf[sdf["term_type"] == "synonym"]["term"].tolist()
        )
        assert "quick30k" in syn_terms
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'"
        )
        odf = con.sql(r.QUERY_BUILD_SQL).df()
        key = ["query_id", "pos", "term", "term_type", "boost_r4"]
        a = sdf[key].sort_values(key, ignore_index=True)
        b = odf[key].sort_values(key, ignore_index=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
    finally:
        del os.environ[r.SYNONYM_ENV]
        r.reset_dictionaries()
