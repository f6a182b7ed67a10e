"""Bilingual (CJK + latin) tokenizer — the engine's from-scratch analog of
the reference's huqie trie tokenizer (rag/nlp/rag_tokenizer.py:249-432).

Semantics matched to the reference:

- ``tokenize``: non-word chars → space, full→half width, lowercase; the
  line splits into language runs; latin runs get lightweight
  lemmatize+stem normalization; CJK runs are segmented by forward AND
  backward greedy maximum-match over a frequency trie, agreement regions
  accepted as-is, disagreement regions re-segmented by exhaustive DFS and
  scored ``B/len(tks) + L + F`` (B=30, L = multi-char token ratio, F =
  summed term frequency — rag_tokenizer.py:212-222), best score wins.
- ``fine_grained_tokenize``: sub-splits long tokens with the SECOND-best
  DFS segmentation (rag_tokenizer.py:394-432).

Deliberate deviations (documented):

- The dictionary is a small vendored table (simplified-form CJK words with
  self-assigned log-scale frequencies + POS tags) instead of the
  reference's ~500k-entry huqie.txt; callers can extend the dictionary at
  runtime. Traditional→simplified folding uses a vendored common-character
  subset (TRAD2SIMP) of the published conversion table, extensible via
  add_trad_simp().
- English normalization is a deterministic 4-rule suffix stemmer (ies→y,
  ing-, ed-, plural-s) instead of NLTK WordNet+Porter — NLTK isn't a
  dependency; the rules are shared verbatim with the DuckDB oracle
  (EN_NORM_DUCK_SQL).
"""

from __future__ import annotations

import math
import os
import re

# ------------------------------------------------------------- dictionary

# (word, freq, pos) — freq on the reference's log scale (higher = more
# common); entries are self-authored common simplified-Chinese vocabulary
# plus domain words used by the test corpus.
VENDORED_DICT: list[tuple[str, int, str]] = [
    ("的", 10, "d"), ("是", 9, "v"), ("在", 9, "p"), ("和", 9, "c"),
    ("了", 9, "d"), ("有", 8, "v"), ("我", 8, "r"), ("他", 8, "r"),
    ("中国", 8, "ns"), ("北京", 7, "ns"), ("上海", 7, "ns"),
    ("人民", 7, "n"), ("共和", 5, "n"), ("共和国", 6, "n"),
    ("人民共和国", 5, "n"), ("中华", 6, "ns"), ("中华人民共和国", 6, "ns"),
    ("数据", 7, "n"), ("数据库", 6, "n"), ("分布", 5, "n"),
    ("分布式", 5, "n"), ("系统", 6, "n"), ("分布式系统", 4, "n"),
    ("计算", 6, "n"), ("计算机", 6, "n"), ("机器", 5, "n"),
    ("学习", 5, "n"), ("机器学习", 5, "n"), ("模型", 5, "n"),
    ("查询", 5, "n"), ("索引", 5, "n"), ("文档", 5, "n"),
    ("提取", 5, "v"), ("内容", 5, "n"), ("主要", 5, "a"),
    ("主要内容", 4, "n"), ("处理", 5, "v"), ("大规模", 4, "a"),
    ("规模", 5, "n"), ("表格", 5, "n"), ("识别", 5, "v"),
    ("布局", 5, "n"), ("页面", 5, "n"), ("段落", 4, "n"),
    ("合并", 4, "v"), ("切分", 4, "v"), ("科学", 5, "n"),
    ("科学院", 5, "n"), ("中国科学院", 4, "nt"),
]


class TrieTokenizer:
    """Greedy bidirectional maximum-match with DFS disagreement scoring."""

    _B = 30.0  # segment-count prior (rag_tokenizer.py:214)

    def __init__(self, entries: list[tuple[str, int, str]] | None = None):
        self._dict: dict[str, tuple[int, str]] = {}
        self._prefixes: set[str] = set()
        for w, f, p in entries if entries is not None else VENDORED_DICT:
            self.add_word(w, f, p)

    def add_word(self, w: str, freq: int, pos: str = "") -> None:
        self._dict[w] = (freq, pos)
        for i in range(1, len(w) + 1):
            self._prefixes.add(w[:i])

    def freq(self, w: str) -> int:
        return self._dict.get(w, (0, ""))[0]

    def tag(self, w: str) -> str:
        return self._dict.get(w, (0, ""))[1]

    # ----------------------------------------------------------- scoring

    def _score(self, tks: list[str]) -> float:
        if not tks:
            return 0.0
        freq_sum = sum(self.freq(t) for t in tks)
        multi = sum(1 for t in tks if len(t) >= 2) / len(tks)
        return self._B / len(tks) + multi + freq_sum

    # ------------------------------------------------------ greedy passes

    def _max_forward(self, line: str) -> list[str]:
        out, s = [], 0
        n = len(line)
        while s < n:
            e = s + 1
            # extend while the slice is still a dictionary prefix
            while e < n and line[s:e] in self._prefixes:
                e += 1
            # retract to the longest slice that is an actual entry
            while e - s > 1 and line[s:e] not in self._dict:
                e -= 1
            out.append(line[s:e])
            s = e
        return out

    def _max_backward(self, line: str) -> list[str]:
        out, e = [], len(line)
        while e > 0:
            s = e - 1
            while s > 0 and line[s - 1:e] in self._prefixes:
                s -= 1
            while e - s > 1 and line[s:e] not in self._dict:
                s += 1
            out.append(line[s:e])
            e = s
        return out[::-1]

    # ------------------------------------------------------ segmentations

    def _segmentations(
        self, text: str, cap: int = 256
    ) -> list[list[str]]:
        """All segmentations of ``text`` where every multi-char piece is a
        dictionary entry (single chars always allowed) — the reference's
        dfs_ enumeration, bounded by ``cap`` results."""
        n = len(text)
        outs: list[list[str]] = []
        stack: list[tuple[int, list[str]]] = [(0, [])]
        while stack and len(outs) < cap:
            s, acc = stack.pop()
            if s >= n:
                outs.append(acc)
                continue
            # longest candidates first so greedy-looking splits surface
            # early: the stack pops the LAST pushed, so push ascending —
            # the longest end lands on top (pushing reversed would explore
            # fully-atomized splits first and exhaust the cap on them)
            ends = [
                e
                for e in range(s + 1, n + 1)
                if e == s + 1 or text[s:e] in self._dict
            ]
            for e in ends:
                stack.append((e, acc + [text[s:e]]))
        return outs

    def _best_segmentations(self, text: str) -> list[list[str]]:
        segs = self._segmentations(text)
        return sorted(segs, key=self._score, reverse=True)

    # ------------------------------------------------------------ merge

    _SPLIT_CHAR = re.compile(r"([ ,\.<>/?;:'\[\]\\`!@#$%^&*\(\)\{\}\|_+=《》，。？、；‘’：“”【】~！￥%……（）——-]+|[a-zA-Z0-9,\.-]+)")

    def _merge(self, joined: str) -> str:
        """Re-join adjacent tokens whose concatenation (containing a split
        char) is itself a dictionary word (rag_tokenizer.py:231-247).
        The dict lookup runs first — it is a hash probe and almost always
        misses, so the regex (the expensive side of the conjunction)
        rarely executes."""
        tks = re.sub(r" +", " ", joined).split()
        out, s = [], 0
        while s < len(tks):
            e = s + 1
            for cand_e in range(s + 2, min(len(tks) + 1, s + 6)):
                tk = "".join(tks[s:cand_e])
                if self.freq(tk) and self._SPLIT_CHAR.search(tk):
                    e = cand_e
            out.append("".join(tks[s:e]))
            s = e
        return " ".join(out)

    # ------------------------------------------------------------- public

    def tokenize(self, line: str) -> str:
        line = re.sub(r"\W+", " ", line, flags=re.UNICODE)
        line = full_to_half(line).lower()
        if not line.isascii():
            # traditional→simplified fold (rag_tokenizer.py:116) so
            # traditional-form text hits the simplified-form dictionary
            line = line.translate(_T2S_TABLE)
        res: list[str] = []
        for run, zh in split_by_lang(line):
            if not zh:
                res.extend(en_normalize(t) for t in run.split())
                continue
            if len(run) < 2 or re.match(r"[a-z\.-]+$", run) or re.match(
                r"[0-9\.-]+$", run
            ):
                res.append(run)
                continue
            res.extend(self._segment_cjk(run))
        return self._merge(" ".join(r for r in res if r))

    def _segment_cjk(self, run: str) -> list[str]:
        fw = self._max_forward(run)
        bw = self._max_backward(run)
        if fw == bw:
            return fw
        # align by character offsets; agreement spans pass through, each
        # disagreement span is re-segmented by scored DFS (same contract as
        # the reference's index-walk merge, rag_tokenizer.py:345-388 — this
        # offset formulation is equivalent and simpler)
        fw_off = _offsets(fw)
        bw_off = _offsets(bw)
        common = sorted(set(fw_off) & set(bw_off))
        out: list[str] = []
        for a, b in zip(common, common[1:]):
            piece_fw = [t for t, o in zip(fw, fw_off) if a <= o < b]
            piece_bw = [t for t, o in zip(bw, bw_off) if a <= o < b]
            if piece_fw == piece_bw:
                out.extend(piece_fw)
            else:
                best = self._best_segmentations(run[a:b])
                out.extend(best[0] if best else [run[a:b]])
        return out

    def fine_grained_tokenize(self, tks: str) -> str:
        toks = tks.split()
        zh_n = sum(1 for t in toks if t and is_cjk_char(t[0]))
        if zh_n < len(toks) * 0.2:
            out: list[str] = []
            for t in toks:
                out.extend(t.split("/"))
            return " ".join(en_normalize(t) for t in out)
        out = []
        for tk in toks:
            if len(tk) < 3 or re.match(r"[0-9,\.-]+$", tk):
                out.append(tk)
                continue
            if len(tk) > 10:
                out.append(tk)
                continue
            segs = self._best_segmentations(tk)
            if len(segs) < 2:
                out.append(tk)
                continue
            stk = segs[1]
            if len(stk) == len(tk):  # fully atomized: keep the original
                out.append(tk)
            elif re.match(r"[a-z\.-]+$", tk) and any(
                len(t) < 3 for t in stk
            ):
                out.append(tk)
            else:
                out.append(" ".join(stk))
        return " ".join(en_normalize(t) for t in out)


def _offsets(tks: list[str]) -> list[int]:
    offs, o = [], 0
    for t in tks:
        offs.append(o)
        o += len(t)
    offs.append(o)  # sentinel end offset
    return offs


# --------------------------------------------------------------- helpers


def is_cjk_char(ch: str) -> bool:
    return "一" <= ch <= "鿿"


# traditional→simplified fold (rag_tokenizer.py:116 tradi2simp — the
# reference uses the hanziconv table; the character correspondences are
# public knowledge). Vendored common subset covering the test vocabulary
# plus frequent characters; extensible via add_trad_simp(). One-to-one
# char map → str.translate (no per-char python loop).
TRAD2SIMP: dict[str, str] = {
    "國": "国", "學": "学", "會": "会", "書": "书", "愛": "爱",
    "馬": "马", "鳥": "鸟", "龍": "龙", "東": "东", "車": "车",
    "門": "门", "開": "开", "關": "关", "長": "长", "風": "风",
    "雲": "云", "電": "电", "語": "语", "話": "话", "讀": "读",
    "寫": "写", "聽": "听", "說": "说", "謝": "谢", "請": "请",
    "問": "问", "間": "间", "時": "时", "鐘": "钟", "錢": "钱",
    "銀": "银", "鐵": "铁", "飛": "飞", "機": "机", "歡": "欢",
    "樂": "乐", "醫": "医", "藥": "药", "頭": "头", "體": "体",
    "聲": "声", "覺": "觉", "夢": "梦", "廣": "广", "場": "场",
    "買": "买", "賣": "卖", "貝": "贝", "見": "见", "視": "视",
    "親": "亲", "觀": "观", "紅": "红", "綠": "绿", "藍": "蓝",
    "黃": "黄", "點": "点", "線": "线", "網": "网", "頁": "页",
    "數": "数", "據": "据", "庫": "库", "計": "计", "統": "统",
    "單": "单", "雙": "双", "幾": "几", "萬": "万", "億": "亿",
    "兩": "两", "為": "为", "爲": "为", "這": "这", "邊": "边",
    "過": "过", "還": "还", "進": "进", "運": "运", "動": "动",
    "務": "务", "業": "业", "產": "产", "鄉": "乡", "縣": "县",
    "區": "区", "島": "岛", "華": "华", "漢": "汉", "簡": "简",
    "譯": "译", "識": "识", "記": "记", "憶": "忆", "藝": "艺",
    "術": "术", "師": "师", "員": "员", "隊": "队", "級": "级",
    "類": "类", "總": "总", "結": "结", "構": "构", "圖": "图",
    "報": "报", "紙": "纸", "筆": "笔", "畫": "画", "對": "对",
    "錯": "错", "讓": "让", "從": "从", "們": "们", "來": "来",
    "個": "个", "麼": "么", "沒": "没", "陽": "阳", "陰": "阴",
    "濕": "湿", "熱": "热", "氣": "气", "壓": "压", "優": "优",
    "質": "质", "價": "价", "標": "标", "測": "测", "試": "试",
    "驗": "验", "證": "证", "確": "确", "認": "认", "設": "设",
    "備": "备", "傳": "传", "輸": "输", "處": "处", "節": "节",
    "約": "约", "號": "号", "碼": "码", "習": "习", "規": "规",
    "選": "选", "頻": "频", "積": "积", "極": "极", "離": "离",
    "雜": "杂", "純": "纯", "維": "维", "張": "张", "發": "发",
}
_T2S_TABLE = str.maketrans(TRAD2SIMP)


def trad_to_simp(s: str) -> str:
    return s.translate(_T2S_TABLE)


def add_trad_simp(pairs: dict[str, str]) -> None:
    """Extend the fold at runtime (full-scale deployments load the
    complete published table)."""
    TRAD2SIMP.update(pairs)
    global _T2S_TABLE
    _T2S_TABLE = str.maketrans(TRAD2SIMP)


def full_to_half(s: str) -> str:
    """Full-width → half-width (rag_tokenizer.py:101-114). ASCII has no
    full-width characters — skip the per-character scan."""
    if s.isascii():
        return s
    out = []
    for ch in s:
        code = ord(ch)
        if code == 0x3000:
            out.append(" ")
        elif 0xFF01 <= code <= 0xFF5E:
            out.append(chr(code - 0xFEE0))
        else:
            out.append(ch)
    return "".join(out)


def split_by_lang(line: str) -> list[tuple[str, bool]]:
    """Maximal same-language runs: (text, is_cjk)
    (rag_tokenizer.py:299-320). Pure-ASCII lines (the common case for an
    english corpus) short-circuit to whitespace words — identical output,
    no per-character scan."""
    if line.isascii():
        return [(w, False) for w in line.split()]
    runs: list[tuple[str, bool]] = []
    for part in re.split(r"(\s+)", line):
        if not part or part.isspace():
            continue
        s = 0
        zh = is_cjk_char(part[0])
        for e in range(1, len(part)):
            z = is_cjk_char(part[e])
            if z != zh:
                runs.append((part[s:e], zh))
                s, zh = e, z
        runs.append((part[s:], zh))
    return runs


# lightweight english lemmatize+stem stand-in; rules mirrored bit-for-bit
# by EN_NORM_DUCK_SQL (first matching rule wins). r5 fidelity pass toward
# the reference's stem(lemmatize(t)) chain (rag_tokenizer.py:296,331):
# - irregular-plural lemma table (the WordNetLemmatizer behavior on the
#   common irregulars — after the fold, Porter leaves these words intact,
#   so the mapped form IS the reference output for this set)
# - post-ing/ed consonant undoubling (Porter step-1b cleanup: running→run,
#   fitted→fit; l/s/z never undouble: falling→fall, pressed→press)
# - sibilant -es plurals (boxes→box, churches→church, glasses→glass —
#   WordNet lemmatizes these; the old [^s]s rule produced boxe/glasse)
# Remaining documented divergences from NLTK: no Porter e-deletion or
# suffix chains (table stays table, not tabl; relational stays
# relational, not relat), no verb-frame lemmatization (ran stays ran),
# irregulars beyond the vendored table.
_IRREGULAR_LEMMAS = {
    "mice": "mouse", "feet": "foot", "teeth": "tooth", "geese": "goose",
    "children": "child", "men": "man", "women": "woman", "wives": "wife",
    "knives": "knife", "leaves": "leaf", "lives": "life", "halves": "half",
    "shelves": "shelf", "indices": "index", "matrices": "matrix",
    "vertices": "vertex", "criteria": "criterion",
    "phenomena": "phenomenon", "data": "datum",
}

_EN_RULES = [
    (re.compile(r"^(.{2,})ies$"), r"\1y", False),
    (re.compile(r"^(.{2,}(?:ch|sh|ss|x|z))es$"), r"\1", False),
    (re.compile(r"^(.{3,})ing$"), r"\1", True),
    (re.compile(r"^(.{3,})ed$"), r"\1", True),
    (re.compile(r"^(.{3,}[^s])s$"), r"\1", False),
]
_DOUBLED = re.compile(r"([bcdfghjkmnpqrtvwxy])\1$")


from functools import lru_cache


@lru_cache(maxsize=65536)
def en_normalize(t: str) -> str:
    if not re.match(r"[a-zA-Z_-]+$", t):
        return t
    t = _IRREGULAR_LEMMAS.get(t, t)
    for pat, rep, undouble in _EN_RULES:
        if pat.match(t):
            t = pat.sub(rep, t)
            if undouble:
                t = _DOUBLED.sub(r"\1", t)
            return t
    return t


# DuckDB mirrors for oracle SQL; {c} is the token column. Composition:
# EN_NORM_DUCK_SQL expects its input ALREADY irregular-folded — callers
# wrap the column with IRR_DUCK_SQL first (splitting the two keeps the
# expanded expression size linear in the template, since {c} appears ~17
# times here and only twice in the irregular fold). RE2 has no
# backreferences, so the undouble is a doubled-pair alternation test +
# left() instead of ([x])\1.
IRR_DUCK_SQL = (
    "(CASE {c} "
    + " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in _IRREGULAR_LEMMAS.items()
    )
    + " ELSE {c} END)"
)

_DOUBLED_DUCK = (
    "(bb|cc|dd|ff|gg|hh|jj|kk|mm|nn|pp|qq|rr|tt|vv|ww|xx|yy)$"
)


def _undouble_duck(expr: str) -> str:
    return (
        "(CASE WHEN regexp_matches(" + expr + ", '" + _DOUBLED_DUCK + "') "
        "THEN left(" + expr + ", length(" + expr + ") - 1) "
        "ELSE " + expr + " END)"
    )


EN_NORM_DUCK_SQL = (
    "(CASE WHEN NOT regexp_matches({c}, '^[a-zA-Z_-]+$') THEN {c} "
    "WHEN regexp_matches({c}, '^.{{2,}}ies$') "
    "THEN regexp_replace({c}, '^(.{{2,}})ies$', '\\1y') "
    "WHEN regexp_matches({c}, '^.{{2,}}(ch|sh|ss|x|z)es$') "
    "THEN regexp_replace({c}, '^(.{{2,}}(ch|sh|ss|x|z))es$', '\\1') "
    "WHEN regexp_matches({c}, '^.{{3,}}ing$') "
    "THEN " + _undouble_duck("regexp_replace({c}, '^(.{{3,}})ing$', '\\1')")
    + " WHEN regexp_matches({c}, '^.{{3,}}ed$') "
    "THEN " + _undouble_duck("regexp_replace({c}, '^(.{{3,}})ed$', '\\1')")
    + " WHEN regexp_matches({c}, '^.{{3,}}[^s]s$') "
    "THEN regexp_replace({c}, '^(.{{3,}}[^s])s$', '\\1') "
    "ELSE {c} END)"
)


# ------------------------------------------------- pluggable dictionary

# The reference ships a ~500k-entry frequency file (rag/res/huqie.txt)
# loaded by rag_tokenizer.py:38-56; this engine vendors a small table but
# accepts a full-scale file in the same format through this env var. On a
# cluster, ship the file with --files / spark.executorEnv so every worker
# resolves the same path.
DICT_ENV = "RAGFLOW_SPARK_HUQIE_DICT"

_HUQIE_DENOMINATOR = 1_000_000.0


def load_dict_file(path: str) -> list[tuple[str, int, str]]:
    """Parse a huqie-format frequency file: one ``word freq [pos]`` per
    line, space/tab separated, ``#`` comments and blank lines skipped.
    Raw counts are re-scaled to the reference's log scale
    ``int(log(freq/1e6) + .5)`` and duplicate words keep the higher
    scaled frequency (rag_tokenizer.py:37-50 semantics, including the
    lowercased key)."""
    out: dict[str, tuple[int, str]] = {}
    with open(path, encoding="utf-8") as fh:
        for lineno, raw in enumerate(fh, 1):
            parts = re.split(r"[ \t]+", raw.strip())
            if not parts or not parts[0] or parts[0].startswith("#"):
                continue
            w = parts[0].lower()
            if len(parts) > 1:
                try:
                    freq = float(parts[1])
                except ValueError as e:
                    # one bad line in a 500k-entry file must point at itself,
                    # not abort every executor with a bare ValueError
                    raise ValueError(
                        f"{path}:{lineno}: non-numeric frequency "
                        f"{parts[1]!r} for word {parts[0]!r}"
                    ) from e
                # freq <= 0 is legal-looking input (a zero-count survey
                # entry): clamp to the no-freq scaled value instead of
                # letting math.log raise a domain error
                f = (
                    int(math.log(freq / _HUQIE_DENOMINATOR) + 0.5)
                    if freq > 0
                    else 0
                )
            else:
                f = 0
            p = parts[2] if len(parts) > 2 else ""
            if w not in out or out[w][0] < f:
                out[w] = (f, p)
    return [(w, f, p) for w, (f, p) in out.items()]


_DEFAULT: TrieTokenizer | None = None


def default_tokenizer() -> TrieTokenizer:
    """Process-wide instance — the full-scale dictionary named by
    $RAGFLOW_SPARK_HUQIE_DICT when set, else the vendored table. Built
    lazily so executors pay the trie build once per worker, not per
    batch — and nothing pickles the trie through closures. A set-but-
    missing path raises (a silent fallback would tokenize differently on
    driver vs executor, corrupting every downstream hash)."""
    global _DEFAULT
    if _DEFAULT is None:
        path = os.environ.get(DICT_ENV, "")
        if path:
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"{DICT_ENV}={path!r} does not exist on this worker; "
                    "ship the dictionary with --files or fix the path"
                )
            _DEFAULT = TrieTokenizer(load_dict_file(path))
        else:
            _DEFAULT = TrieTokenizer()
    return _DEFAULT


def reset_default_tokenizer() -> None:
    """Drop the cached instance (tests flip $RAGFLOW_SPARK_HUQIE_DICT)."""
    global _DEFAULT
    _DEFAULT = None


def tokenize(line: str) -> str:
    return default_tokenizer().tokenize(line)


def fine_grained_tokenize(tks: str) -> str:
    return default_tokenizer().fine_grained_tokenize(tks)
