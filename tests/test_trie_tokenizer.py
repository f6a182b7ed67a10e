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
