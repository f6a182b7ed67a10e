"""Trie tokenizer goldens (engine analog of rag/nlp/rag_tokenizer.py
tokenize/fine_grained_tokenize — forward+backward max-match, scored DFS
disagreement resolution, second-best sub-splits)."""

from ragflow_spark.functions.trie_tokenizer import (
    TrieTokenizer,
    en_normalize,
    fine_grained_tokenize,
    full_to_half,
    split_by_lang,
    tokenize,
)


def test_cjk_greedy_longest_match():
    assert tokenize("中华人民共和国是一个大国") == "中华人民共和国 是 一 个 大 国"
    assert tokenize("中国科学院的机器学习模型") == "中国科学院 的 机器学习 模型"


def test_fw_bw_disagreement_resolved_by_score():
    """人民共和国: forward eats 人民共和国 whole; a tokenizer with only
    人民+共和国 in dict must still yield the dictionary segmentation, not
    per-char fallback."""
    tk = TrieTokenizer([("人民", 7, "n"), ("共和国", 6, "n"), ("国是", 3, "n")])
    assert tk.tokenize("人民共和国是") == "人民 共和国 是"


def test_fine_grained_second_best_subsplit():
    t = tokenize("中华人民共和国")
    assert t == "中华人民共和国"
    assert fine_grained_tokenize(t) == "中华 人民 共和国"
    # short and numeric tokens pass through
    assert fine_grained_tokenize("12.5 ab") == "12.5 ab"


def test_english_path_normalizes():
    assert (
        tokenize("The tables were sorted, holding queries!")
        == "the table were sort hold query"
    )
    # english fine-grained applies the normalizer (english_normalize_)
    assert fine_grained_tokenize("tables a/b") == "table a b"


def test_en_normalize_rules():
    assert en_normalize("queries") == "query"
    assert en_normalize("sorting") == "sort"
    assert en_normalize("sorted") == "sort"
    assert en_normalize("tables") == "table"
    assert en_normalize("glass") == "glass"   # -ss guarded
    assert en_normalize("as") == "as"         # too short
    assert en_normalize("被") == "被"          # non-latin untouched


def test_full_width_and_lang_runs():
    assert full_to_half("ＡＢ　１２！") == "AB 12!"
    assert split_by_lang("abc中文de") == [
        ("abc", False), ("中文", True), ("de", False),
    ]
    assert tokenize("ＦＵＬＬ　ｗｉｄｔｈ") == "full width"


def test_mixed_language_line():
    assert (
        tokenize("hybrid 查询 engine 数据库index")
        == "hybrid 查询 engine 数据库 index"
    )


def test_with_ltks_columns(spark):
    from ragflow_spark.operators.extract import with_ltks

    df = spark.createDataFrame(
        [("d1", "<table><tr><td>tables sorted</td></tr></table>"),
         ("d2", "中华人民共和国")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in with_ltks(df).collect()}
    # table tags stripped before tokenization (rag/nlp/__init__.py:260)
    assert out["d1"]["content_ltks"] == "table sort"
    assert out["d2"]["content_ltks"] == "中华人民共和国"
    assert out["d2"]["content_sm_ltks"] == "中华 人民 共和国"


def test_segmentation_cap_reaches_greedy_split():
    """DFS must explore longest candidates first: under the 256-result cap
    the fully-greedy segmentation of a long repeated-word string has to be
    among the enumerated set (a shortest-first order exhausts the cap on
    near-atomized prefixes and never reaches it)."""
    from ragflow_spark.functions.trie_tokenizer import TrieTokenizer

    tt = TrieTokenizer(
        [("ab", 5, "n"), ("abc", 6, "n"), ("bc", 5, "n"),
         ("cd", 5, "n"), ("abcd", 7, "n")]
    )
    segs = tt._segmentations("abcd" * 5)
    assert ["abcd"] * 5 in segs
    # and the winner contains no single-char atomization
    assert all(len(t) >= 2 for t in tt._best_segmentations("abcd" * 5)[0])


def test_load_dict_file_scaling_and_dedup(tmp_path):
    """huqie-format loader: log-scale freq math int(log(f/1e6)+.5)
    (rag_tokenizer.py:47-50), lowercased keys, higher-freq dedup,
    comment/blank skipping."""
    import math

    from ragflow_spark.functions.trie_tokenizer import load_dict_file

    p = tmp_path / "dict.txt"
    p.write_text(
        "# comment line\n"
        "中国 1000000 ns\n"
        "数据 2718281828 n\n"
        "\n"
        "数据 1000000 n\n"          # duplicate, lower freq — ignored
        "Mixed\t54365637\tn\n"      # tab-separated, lowercased key
        "nofreq\n",
        encoding="utf-8",
    )
    entries = {w: (f, pos) for w, f, pos in load_dict_file(str(p))}
    assert entries["中国"] == (0, "ns")            # log(1)=0
    assert entries["数据"][0] == int(math.log(2718.281828) + 0.5)  # == 8
    assert entries["数据"][0] == 8
    assert "mixed" in entries and "Mixed" not in entries
    assert entries["mixed"][0] == int(math.log(54.365637) + 0.5)  # == 4
    assert entries["nofreq"] == (0, "")


def test_env_dict_golden_1k(tmp_path, monkeypatch):
    """Full-scale dictionary knob: a generated 1000-entry huqie file via
    $RAGFLOW_SPARK_HUQIE_DICT drives the DFS/max-match path exactly like
    the vendored table (rag/nlp/rag_tokenizer.py:54-88 analog)."""
    import math

    from ragflow_spark.functions import trie_tokenizer as tt

    # vendored words re-emitted at raw counts that scale back to their
    # vendored log freqs, padded to 1000 with rare-codepoint two-char
    # fillers (0x9C00.. — disjoint from every vendored word's chars)
    lines = [
        f"{w} {round(math.exp(f) * 1_000_000)} {pos}"
        for w, f, pos in tt.VENDORED_DICT
    ]
    fillers = []
    while len(lines) + len(fillers) < 1000:
        i = len(fillers)
        w = chr(0x9C00 + i % 400) + chr(0x9C00 + (i * 7 + 3) % 397)
        fillers.append(f"{w} {1_000_000 * (2 + i % 40)} n")
    p = tmp_path / "huqie_1k.txt"
    p.write_text("\n".join(lines + fillers) + "\n", encoding="utf-8")

    monkeypatch.setenv(tt.DICT_ENV, str(p))
    tt.reset_default_tokenizer()
    try:
        tok = tt.default_tokenizer()
        assert len(tok._dict) >= 990  # filler collisions may dedup a few
        # vendored-table goldens hold under the loaded dictionary
        assert tok.tokenize("中华人民共和国的机器学习模型") == \
            "中华人民共和国 的 机器学习 模型"
        # a generated filler entry is live in the trie: it segments out of
        # a run against a neighboring single rare char
        w0 = chr(0x9C00) + chr(0x9C03)
        solo = chr(0x9DFF)
        assert tok.freq(w0) == int(math.log(2.0) + 0.5)
        assert tok.tokenize(w0 + solo) == f"{w0} {solo}"
    finally:
        tt.reset_default_tokenizer()


def test_env_dict_missing_path_raises(monkeypatch):
    from ragflow_spark.functions import trie_tokenizer as tt

    monkeypatch.setenv(tt.DICT_ENV, "/nonexistent/huqie.txt")
    tt.reset_default_tokenizer()
    try:
        import pytest

        with pytest.raises(FileNotFoundError):
            tt.default_tokenizer()
    finally:
        tt.reset_default_tokenizer()


def test_tokenize_cjk_driver_query_equals_kernel(spark):
    """The tokenize_cjk driver query's Spark path (with_ltks mapInPandas)
    must equal the single-doc kernel tokenize()/fine_grained_tokenize()
    on the same deterministic CJK construction (CLAUDE.md: new physical
    paths need an equality test vs the single-doc kernel)."""
    import duckdb

    import __spark_entry__ as entrymod
    from ragflow_spark.functions.trie_tokenizer import (
        fine_grained_tokenize,
        tokenize,
    )

    sf = "/root/testdata/sf0.001"
    out = {
        r["doc_id"]: (r["text"], r["content_ltks"], r["content_sm_ltks"])
        for r in entrymod._q_tokenize_cjk(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT doc_id, trim(text) FROM '{sf}/documents.parquet'"
    ).fetchall()
    assert len(out) == len(rows) > 0
    n = len(entrymod._CJK_VOCAB)
    v = entrymod._CJK_VOCAB
    t = entrymod._CJK_TRAD
    checked_multi = 0
    folded_hits = 0
    for doc_id, text in rows:
        built = (
            v[doc_id % n] + v[(doc_id + 3) % n] + "，"
            + v[(doc_id + 7) % n] + " " + t[doc_id % len(t)]
            + " " + text.split()[0]
        )
        got_text, got_ltks, got_sm = out[f"cj-{doc_id}"]
        assert got_text == built
        assert got_ltks == tokenize(built)
        assert got_sm == fine_grained_tokenize(tokenize(built))
        if len(got_ltks.split()) > 4:
            checked_multi += 1
        # the traditional compound must fold into its simplified dict
        # entry (中華人民共和國 → the single token 中华人民共和国, etc.)
        if any(
            tok in ("中华人民共和国", "机器学习", "数据库")
            for tok in got_ltks.split()
        ):
            folded_hits += 1
    assert checked_multi > 0  # compounds actually segmented into pieces
    assert folded_hits == len(rows)  # every trad form folded + matched


def test_load_dict_file_bad_lines(tmp_path):
    """A zero/negative freq clamps to the no-freq scale instead of a math
    domain error; a non-numeric freq names the file and line (ADVICE r4)."""
    import pytest

    from ragflow_spark.functions.trie_tokenizer import load_dict_file

    ok = tmp_path / "ok.txt"
    ok.write_text("alpha 0 n\nbeta -3 n\ngamma\n")
    entries = {w: (f, p) for w, f, p in load_dict_file(str(ok))}
    assert entries == {"alpha": (0, "n"), "beta": (0, "n"), "gamma": (0, "")}

    bad = tmp_path / "bad.txt"
    bad.write_text("alpha 10 n\nbeta oops n\n")
    with pytest.raises(ValueError, match=r"bad\.txt:2: non-numeric"):
        load_dict_file(str(bad))


def test_trad_to_simp_fold():
    """Traditional-form input tokenizes identically to its simplified
    form (rag_tokenizer.py:116 tradi2simp analog, vendored subset)."""
    from ragflow_spark.functions.trie_tokenizer import (
        add_trad_simp,
        tokenize,
        trad_to_simp,
    )

    assert trad_to_simp("中華人民共和國") == "中华人民共和国"
    assert tokenize("中華人民共和國") == tokenize("中华人民共和国")
    assert tokenize("機器學習和數據庫") == tokenize("机器学习和数据库")
    # runtime extension hook
    add_trad_simp({"㊣": "正"})
    assert trad_to_simp("㊣") == "正"


def test_en_normalize_fidelity_goldens():
    """Recorded word→normal-form table for the r5 stemmer fidelity pass
    (reference chain: PorterStemmer().stem(WordNetLemmatizer()
    .lemmatize(t)), rag_tokenizer.py:296). Rows marked `exact` reproduce
    the reference output bit-for-bit; the rest are the documented
    deviation (no Porter e-deletion / suffix chains — readable stems).
    The DuckDB mirror must agree on every row (second loop)."""
    import duckdb

    from ragflow_spark.functions.trie_tokenizer import (
        EN_NORM_DUCK_SQL,
        IRR_DUCK_SQL,
        en_normalize,
    )

    golden = {
        # irregular plurals (exact: Porter leaves the lemma intact)
        "mice": "mouse", "children": "child", "feet": "foot",
        "teeth": "tooth", "women": "woman", "men": "man",
        "leaves": "leaf", "lives": "life", "indices": "index",
        "matrices": "matrix", "criteria": "criterion", "data": "datum",
        # post-ing/ed undoubling (exact: Porter step-1b cleanup)
        "running": "run", "stopped": "stop", "fitted": "fit",
        "planning": "plan", "dropped": "drop",
        # l/s/z never undouble (exact)
        "falling": "fall", "pressed": "press", "buzzing": "buzz",
        "rolling": "roll", "missed": "miss",
        # sibilant -es plurals (exact)
        "boxes": "box", "churches": "church", "glasses": "glass",
        "hashes": "hash", "classes": "class",
        # pre-existing rules (documented deviations from Porter where the
        # reference would e-delete or re-suffix: tabl, queri, studi …)
        "queries": "query", "studies": "study", "tables": "table",
        "sorted": "sort", "sorting": "sort", "windowed": "window",
        "merging": "merg", "cats": "cats", "as": "as", "glass": "glass",
        "ran": "ran", "被": "被",
    }
    for w, exp in golden.items():
        assert en_normalize(w) == exp, (w, en_normalize(w), exp)

    expr = EN_NORM_DUCK_SQL.format(c=IRR_DUCK_SQL.format(c="w"))
    vals = ", ".join(
        "('{}')".format(w) for w in golden if w.isascii()
    )
    for w, got in duckdb.sql(
        f"SELECT w, {expr} AS n FROM (VALUES {vals}) t(w)"
    ).fetchall():
        assert got == golden[w], (w, got, golden[w])
