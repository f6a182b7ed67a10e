"""Retrieval-side operators (reference: rag/nlp/term_weight.py,
rag/nlp/search.py — documented in SURVEY.md §2.6). Rebuilt as DataFrame ops:

- ``term_idf``: corpus document-frequency + idf per token (the reference's
  term weighting backbone, term_weight.py:162-244).
- ``hybrid_search``: fulltext token-overlap similarity fused with dense
  cosine ``0.05·text + 0.95·vector`` (search.py:100-133, FusionExpr) and a
  window top-k (search.py:355-381).

Scale: the token df aggregation is one shuffle with map-side combine; the
query side of hybrid search is broadcast (queries ≪ corpus).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ragflow_spark.ops.tables import load

TOP_K = 10
QUERY_MOD = 100  # query docs: doc_id % QUERY_MOD == 0


def term_idf(spark: SparkSession, sf_dir: str, min_df: int = 2) -> DataFrame:
    """(token, df, idf_r6) over the documents corpus;
    idf = ln((N+1)/(df+1)) rounded to 6 (absorbs last-ulp libm diffs).
    N is computed in the same plan (broadcast 1-row aggregate) — no separate
    driver-side count() scan per invocation."""
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    tokens = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        ).alias("token"),
    ).where(F.col("token") != "")
    return (
        tokens.groupBy("token")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "df",
            F.round(
                F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("idf_r6"),
        )
    )


TERM_IDF_SQL = """
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT token, count(*) AS df,
       round(ln(((SELECT n_docs FROM n) + 1.0) / (count(*) + 1.0)), 6) AS idf_r6
FROM tok WHERE token <> ''
GROUP BY token HAVING count(*) >= 2
"""


# ---------------------------------------------------- full term weighting
# (rag/nlp/term_weight.py:162-244). The reference's freq dict comes from the
# huqie tokenizer (scope-ruled out, SURVEY §2.3) — here freq/df come from the
# corpus itself. The NER and POS boosts are vendored mini-dictionaries under
# the reference's exact boost tables (term_weight.py:166-186): ner precedence
# is numeric → 2, 1-2-letter latin → 0.01, dictionary tag, else 1; postag is
# r/c/d → 0.3, ns/nt → 3, n → 2, numeric → 2, else 1, multiplied in after
# ner. The dictionaries are tiny so they compile to a literal JVM-side CASE
# (the moral equivalent of a broadcast map — zero shuffle, zero Python).

_RE_NUMERIC_FREQ = "^[0-9. -]{2,}$"
_RE_NUMERIC_NER = "^[0-9,.]{2,}$"
_RE_SHORT_LATIN = "^[a-z]{1,2}$"
_RE_ENG = "^[a-z. -]+$"
_FREQ_N = 10_000_000
_DF_N = 1_000_000_000

# NER dictionary (reference: rag/res/ner.json consumed by
# term_weight.py:166-176). Tags and boost table are the reference's; the
# vendored entries cover the test corpus vocabulary, and a full-scale
# ner.json loads via $RAGFLOW_SPARK_NER_JSON. Lookup compiles to a
# BROADCAST DIM JOIN, not a per-token when-chain — a when-chain is fine at
# 4 entries and fatal at the reference's scale (expression-tree explosion),
# while a broadcast join costs one tiny exchange regardless of dict size.
NER_ENV = "RAGFLOW_SPARK_NER_JSON"
POS_ENV = "RAGFLOW_SPARK_POS_JSON"

NER_BOOSTS = {
    "toxic": 2.0, "func": 1.0, "corp": 3.0, "loca": 3.0, "sch": 3.0,
    "stock": 3.0, "firstnm": 1.0,
}
POS_BOOSTS = {"r": 0.3, "c": 0.3, "d": 0.3, "ns": 3.0, "nt": 3.0, "n": 2.0}

VENDORED_NER: dict[str, str] = {
    "spark": "corp",
    "data": "sch",
    "customer": "firstnm",
    "key": "func",
}

# vendored POS dictionary (reference: rag_tokenizer.tag via the huqie POS
# column, term_weight.py:177-186). At full scale feed the huqie dict's pos
# column here as a {token: tag} json.
VENDORED_POS: dict[str, str] = {
    "window": "n",
    "line": "n",
    "the": "d",
}


def load_tag_file(path: str, boosts: dict[str, float]) -> dict[str, str]:
    """{token: tag} json (rag/res/ner.json shape). Keys lowercased; entries
    whose tag has no boost row are dropped (the reference would KeyError on
    them, term_weight.py:173-176 — dropping degrades to boost 1.0)."""
    import json

    with open(path, encoding="utf-8") as fh:
        raw = json.load(fh)
    return {
        str(k).lower(): str(v)
        for k, v in raw.items()
        if str(v) in boosts
    }


def _pos_from_huqie() -> dict[str, str] | None:
    """Reference parity: POS tags come from the huqie dictionary's tag
    column (term_weight.py:177-186 calls rag_tokenizer.tag, which reads
    huqie.txt). When a full-scale tokenizer dict is plugged in but no
    explicit POS json is, derive the POS table from it."""
    from ragflow_spark.functions.trie_tokenizer import DICT_ENV, load_dict_file

    hq = os.environ.get(DICT_ENV, "")
    if not hq:
        return None
    return {
        w.lower(): p for w, _, p in load_dict_file(hq) if p in POS_BOOSTS
    }


# NER_DICT / POS_DICT / SYNONYMS and the dict-derived SQL fragments are
# (re-)resolved by _resolve_dictionaries() at the bottom of this module —
# lazy enough to get a reset hook (tests flip the env knobs in-process via
# reset_dictionaries() instead of shelling out to subprocesses).


def _idf_expr(s, n: int):
    return F.log10(F.lit(10.0) + (F.lit(float(n)) - s + 0.5) / (s + 0.5))


def _raw_weight(tokcol, freqcol, dfcol):
    """(0.3·idf(freq) + 0.7·idf(df)) · ner · postag —
    term_weight.py:225-244."""
    freq = (
        F.when(tokcol.rlike(_RE_NUMERIC_FREQ), F.lit(3.0))
        .when(freqcol.isNotNull(), F.greatest(freqcol.cast("double"), F.lit(10.0)))
        .when(tokcol.rlike(_RE_ENG), F.lit(300.0))
        .otherwise(F.lit(10.0))
    )
    df_ = (
        F.when(tokcol.rlike(_RE_NUMERIC_FREQ), F.lit(5.0))
        .when(dfcol.isNotNull(), dfcol.cast("double") + 3.0)
        .when(tokcol.rlike(_RE_ENG), F.lit(300.0))
        .otherwise(F.lit(3.0))
    )
    # ner/pos arrive as broadcast-joined dim columns (ner_b/pos_b) — see
    # the NER_ENV comment: per-token when-chains don't survive a full-scale
    # dictionary, a broadcast join does. Precedence mirrors the reference:
    # ner regex cases shadow the dict (term_weight.py:167-176); the pos
    # dict shadows the numeric-tag regex (term_weight.py:177-186).
    ner = (
        F.when(tokcol.rlike(_RE_NUMERIC_NER), F.lit(2.0))
        .when(tokcol.rlike(_RE_SHORT_LATIN), F.lit(0.01))
        .otherwise(F.coalesce(F.col("ner_b"), F.lit(1.0)))
    )
    pos = F.coalesce(
        F.col("pos_b"),
        F.when(tokcol.rlike(r"^[0-9-]+$"), F.lit(2.0)).otherwise(F.lit(1.0)),
    )
    return (
        (0.3 * _idf_expr(freq, _FREQ_N) + 0.7 * _idf_expr(df_, _DF_N))
        * ner
        * pos
    )


# Below this size a dictionary compiles to a literal-map projection
# (zero exchanges, stays in whole-stage codegen); above it, a broadcast
# dim join (one tiny exchange, immune to expression-tree / codegen-size
# blowup at the reference's 500k entries). Same-window A/B: at 4 entries
# the two broadcast joins cost term_weights 0.89→2.17 s, the map costs
# nothing; at 500k a map literal would not compile at all.
_SMALL_DICT_MAX = 1000


def _tag_map_expr(tokcol, d: dict[str, str], boosts: dict[str, float]):
    pairs = [x for t, g in d.items() for x in (F.lit(t), F.lit(boosts[g]))]
    if not pairs:
        return F.lit(None).cast("double")
    return F.element_at(F.create_map(*pairs), tokcol)


def _with_tag_dims(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Attach ner_b/pos_b boost columns ahead of ``_raw_weight``."""
    for col, d, boosts in (
        ("ner_b", NER_DICT, NER_BOOSTS),
        ("pos_b", POS_DICT, POS_BOOSTS),
    ):
        if len(d) <= _SMALL_DICT_MAX:
            df = df.withColumn(col, _tag_map_expr(F.col("token"), d, boosts))
        else:
            rows = [(t, boosts[g]) for t, g in d.items()]
            dim = spark.createDataFrame(rows, f"token string, {col} double")
            df = df.join(F.broadcast(dim), "token", "left")
    return df


def _values_dim(d: dict[str, str], boosts: dict[str, float], col: str) -> str:
    rows = ", ".join(
        "('{}', {})".format(t.replace("'", "''"), boosts[g])
        for t, g in d.items()
    ) or "('', 1.0)"
    return f"(SELECT * FROM (VALUES {rows}) v(token, {col}))"


_DUCK_RAW_WEIGHT = f"""
(0.3 * log10(10 + (({_FREQ_N} -
     (CASE WHEN regexp_matches(token, '{_RE_NUMERIC_FREQ}') THEN 3.0
           WHEN freq IS NOT NULL THEN greatest(CAST(freq AS DOUBLE), 10.0)
           WHEN regexp_matches(token, '{_RE_ENG}') THEN 300.0
           ELSE 10.0 END)) + 0.5) /
     ((CASE WHEN regexp_matches(token, '{_RE_NUMERIC_FREQ}') THEN 3.0
           WHEN freq IS NOT NULL THEN greatest(CAST(freq AS DOUBLE), 10.0)
           WHEN regexp_matches(token, '{_RE_ENG}') THEN 300.0
           ELSE 10.0 END) + 0.5))
 + 0.7 * log10(10 + (({_DF_N} -
     (CASE WHEN regexp_matches(token, '{_RE_NUMERIC_FREQ}') THEN 5.0
           WHEN df IS NOT NULL THEN CAST(df AS DOUBLE) + 3.0
           WHEN regexp_matches(token, '{_RE_ENG}') THEN 300.0
           ELSE 3.0 END)) + 0.5) /
     ((CASE WHEN regexp_matches(token, '{_RE_NUMERIC_FREQ}') THEN 5.0
           WHEN df IS NOT NULL THEN CAST(df AS DOUBLE) + 3.0
           WHEN regexp_matches(token, '{_RE_ENG}') THEN 300.0
           ELSE 3.0 END) + 0.5)))
* (CASE WHEN regexp_matches(token, '{_RE_NUMERIC_NER}') THEN 2.0
        WHEN regexp_matches(token, '{_RE_SHORT_LATIN}') THEN 0.01
        ELSE coalesce(ner_b, 1.0) END)
* coalesce(pos_b, CASE WHEN regexp_matches(token, '^[0-9-]+$') THEN 2.0
                       ELSE 1.0 END)
"""


def _corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, freq, df) over the whole corpus — the engine's analog of the
    reference's frequency dictionary. ONE scan, one shuffle: freq and df
    come out of the same aggregation."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    return toks.groupBy("token").agg(
        F.count("*").alias("freq"), F.countDistinct("doc_id").alias("df")
    )


_DUCK_CORPUS_STATS = """
ctoks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents),
stats_t AS (
  SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS df
  FROM ctoks WHERE token <> '' GROUP BY token)
"""

TW_QUERY_MOD = 20  # term-weight query docs: doc_id % 20 == 0


def term_weights(
    spark: SparkSession, sf_dir: str, query_mod: int = TW_QUERY_MOD
) -> DataFrame:
    """Per query-doc normalized term weights (term_weight.py weights()):
    weight = (0.3·idf(freq) + 0.7·idf(df)) · ner, normalized to sum 1 within
    the document. Normalization goes through integer micro-units
    (round(w·1e6)) so the sum is order-independent and bit-identical across
    engines."""
    docs = load(spark, sf_dir, "documents").where(
        F.col("doc_id") % query_mod == 0
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        ).alias("token"),
    ).where(F.col("token") != "")
    stats = _corpus_stats(spark, sf_dir)
    j = _with_tag_dims(toks.join(stats, "token", "left"), spark)
    wq = F.round(
        _raw_weight(F.col("token"), F.col("freq"), F.col("df")) * 1e6
    ).cast("bigint")
    withw = j.select("doc_id", "token", wq.alias("wq"))
    # window-sum normalization: one pass, no aggregate+self-join (which
    # would recompute the whole stats subtree per consumer)
    s = F.sum("wq").over(Window.partitionBy("doc_id"))
    return withw.select(
        F.col("doc_id").alias("query_id"),
        "token",
        F.round(F.col("wq") / s, 6).alias("weight_r6"),
    )


def _build_term_weights_sql() -> str:
    return f"""
WITH {_DUCK_CORPUS_STATS.strip()},
qtoks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents WHERE doc_id % {TW_QUERY_MOD} = 0),
w AS (
  SELECT q.doc_id, q.token,
         CAST(round(({_DUCK_RAW_WEIGHT}) * 1e6) AS BIGINT) AS wq
  FROM qtoks q
  LEFT JOIN stats_t USING (token){_DUCK_TAG_JOINS}
  WHERE q.token <> ''),
tot AS (SELECT doc_id, sum(wq) AS s FROM w GROUP BY doc_id)
SELECT w.doc_id AS query_id, w.token,
       round(w.wq / tot.s, 6) AS weight_r6
FROM w JOIN tot USING (doc_id)
"""


# --------------------------------------------------------------- query build
# (rag/nlp/query.py:85-217). Dictionary-free core: punctuation strip + the
# rmWWW stopword patterns (applied twice, as the english path does), term
# boosts from the normalized weight mix, adjacent-bigram phrase boosts
# (max(w1,w2)·2), and the constant field-boost list. Synonym (^0.2) and
# fine-grained (~2^0.5) expansions need the reference's dictionaries and
# emit nothing here (documented deviation).

QUERY_FIELDS = [
    ("title_tks", 10.0),
    ("title_sm_tks", 5.0),
    ("important_kwd", 30.0),
    ("important_tks", 20.0),
    ("question_tks", 20.0),
    ("content_ltks", 2.0),
    ("content_sm_ltks", 1.0),
]

_PUNCT = r"[ :|\r\n\t,，。？?/`!！&^%()\[\]{}<>]+"
_WWW1 = r"(^| )(what|who|how|which|where|why)('re|'s)? "
_WWW2 = (
    r"(^| )('s|'re|is|are|were|was|do|does|did|don't|doesn't|didn't|has|have"
    r"|be|there|you|me|your|my|mine|just|please|may|i|should|would|wouldn't"
    r"|will|won't|done|go|for|with|so|the|a|an|by|i'm|it's|he's|she's|they"
    r"|they're|you're|as|by|on|in|at|up|out|down|of|to|or|and|if) "
)


def _clean_query(col):
    c = F.regexp_replace(F.lower(col), _PUNCT, " ")
    for _ in range(2):  # english path applies rmWWW twice (query.py:163-166)
        c = F.regexp_replace(c, _WWW1, " ")
        c = F.regexp_replace(c, _WWW2, " ")
    return F.trim(c)


_DUCK_CLEAN = (
    "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(lower(text), '{p}', ' ', 'g'),"
    " '{w1}', ' ', 'g'), '{w2}', ' ', 'g'),"
    " '{w1}', ' ', 'g'), '{w2}', ' ', 'g'))"
).format(
    # DuckDB '…' literals pass backslashes through raw — only quotes double
    p=_PUNCT.replace("'", "''"),
    w1=_WWW1.replace("'", "''"),
    w2=_WWW2.replace("'", "''"),
)


# synonym dictionary (reference: rag/res/synonym.json consumed by
# rag/nlp/synonym.py lookup). The reference ships a large static json; this
# engine vendors a corpus-relevant subset under the same contract — lookup
# on the cleaned token, one synonym clause per hit — and accepts a full-
# scale file in the reference's json format via $RAGFLOW_SPARK_SYNONYM_JSON.
# Shared between the Spark path (broadcast literal table, driver-resolved —
# executors never read the file) and the DuckDB oracle (VALUES list); both
# derive from the SAME module-level table, so a loaded dictionary stays
# consistent across the query and its oracle.
SYNONYM_ENV = "RAGFLOW_SPARK_SYNONYM_JSON"
SYN_TOPN = 8  # lookup cap, rag/nlp/synonym.py:70-78


def load_synonym_file(path: str) -> dict[str, list[str]]:
    """rag/res/synonym.json format: token → synonym string or list. Keys
    lowercased + whitespace-normalized (synonym.py:76), string values wrap
    to one-element lists, lists cap at SYN_TOPN, self-mappings dropped."""
    import json
    import re as _re

    with open(path, encoding="utf-8") as fh:
        raw = json.load(fh)
    out: dict[str, list[str]] = {}
    for k, v in raw.items():
        key = _re.sub(r"[ \t]+", " ", str(k).lower()).strip()
        vals = [v] if isinstance(v, str) else list(v)
        clean = [s for s in (str(x).strip() for x in vals) if s and s != key]
        if key and clean:
            out[key] = clean[:SYN_TOPN]
    return out


VENDORED_SYNONYMS: dict[str, list[str]] = {
    "fast": ["quick", "rapid"],
    "slow": ["sluggish"],
    "big": ["large", "huge"],
    "small": ["little"],
    "merge": ["combine"],
    "sort": ["arrange"],
    "query": ["request"],
    "table": ["relation"],
}

# minimum_should_match retry ladder: question() compiles at 0.6
# (rag/nlp/query.py:85), retrieval first calls with 0.3 and retries an empty
# result at 0.1 (rag/nlp/search.py:102,122-128). The compiled-query surface
# exposes the contract as declarative rows.
MIN_MATCH_LADDER = [("primary", 0.6), ("fallback", 0.1)]


def query_build(
    spark: SparkSession, sf_dir: str, query_mod: int = QUERY_MOD
) -> DataFrame:
    """Compiled boolean query rows per query doc: 'field' rows carry the
    constant field boosts, 'term' rows the normalized weight boosts
    ("tk^w"), 'phrase' rows the adjacent-bigram boosts ("\"a b\"^w",
    query.py:130-141), 'synonym' rows vendored-dictionary expansions at w/4
    (query.py:104-110 english path; the chinese path's fixed ^0.2 belongs to
    the scope-ruled huqie branch), one 'proximity' row per multi-token query
    — the whole cleaned query as a slop-2 phrase boosted 1.5
    (query.py:188 analog), and 'min_match' rows encoding the 0.6→0.1
    minimum_should_match retry ladder (search.py:122-128)."""
    docs = load(spark, sf_dir, "documents").where(
        F.col("doc_id") % query_mod == 0
    )
    cleaned = docs.select(
        F.col("doc_id").alias("query_id"), _clean_query(F.col("text")).alias("q")
    )
    toks = cleaned.select(
        "query_id",
        F.posexplode(F.split(F.col("q"), r"\s+")).alias("pos", "token"),
    ).where(F.col("token") != "")
    stats = _corpus_stats(spark, sf_dir)
    j = _with_tag_dims(toks.join(stats, "token", "left"), spark)
    wq = F.round(
        _raw_weight(F.col("token"), F.col("freq"), F.col("df")) * 1e6
    ).cast("bigint")
    withw = j.select("query_id", "pos", "token", wq.alias("wq"))
    win = Window.partitionBy("query_id").orderBy("pos")
    # single pass: each token row emits its term row, its bigram phrase row
    # (when a successor exists), and — on the query's first row — the seven
    # constant field rows. A union of separate branches would rescan the
    # corpus once per branch; the explode keeps it one lineage, and the
    # window-sum normalization avoids an aggregate+self-join recompute.
    s = F.sum("wq").over(Window.partitionBy("query_id"))
    full_w = win.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    norm = (
        withw.select(
            "query_id", "pos", "token", (F.col("wq") / s).alias("w")
        )
        .select(
            "query_id",
            "pos",
            "token",
            "w",
            F.lead("token").over(win).alias("nxt"),
            F.lead("w").over(win).alias("nw"),
            F.lead("pos").over(win).alias("npos"),
            F.row_number().over(win).alias("rn"),
            F.concat_ws(" ", F.collect_list("token").over(full_w)).alias(
                "fullq"
            ),
            F.count("*").over(full_w).alias("ntok"),
        )
    )
    syn_df = spark.createDataFrame(
        [(k, v) for k, v in SYNONYMS.items()],
        "token string, syns array<string>",
    )
    norm = norm.join(F.broadcast(syn_df), "token", "left").withColumn(
        "syns", F.coalesce("syns", F.array().cast("array<string>"))
    )
    mk = lambda pos, term, typ, boost: F.struct(  # noqa: E731
        pos.cast("int").alias("pos"),
        term.alias("term"),
        typ.alias("term_type"),
        boost.alias("boost_r4"),
    )
    term_s = mk(
        F.col("pos"), F.col("token"), F.lit("term"), F.round(F.col("w"), 4)
    )
    phrase_s = F.when(
        F.col("nxt").isNotNull(),
        mk(
            F.col("npos"),
            F.concat_ws(" ", "token", "nxt"),
            F.lit("phrase"),
            F.round(F.greatest("w", "nw") * 2, 4),
        ),
    )
    field_structs = [
        F.when(
            F.col("rn") == 1,
            mk(F.lit(i), F.lit(f), F.lit("field"), F.lit(b)),
        )
        for i, (f, b) in enumerate(QUERY_FIELDS)
    ]
    # whole-query slop-2 proximity clause, only for multi-token queries
    # (reference emits it when the clause has >1 weighted token)
    prox_s = F.when(
        (F.col("rn") == 1) & (F.col("ntok") > 1),
        mk(F.lit(0), F.col("fullq"), F.lit("proximity"), F.lit(1.5)),
    )
    mm_structs = [
        F.when(
            F.col("rn") == 1,
            mk(F.lit(i), F.lit(name), F.lit("min_match"), F.lit(v)),
        )
        for i, (name, v) in enumerate(MIN_MATCH_LADDER)
    ]
    syn_structs = F.transform(
        "syns",
        lambda syn: mk(
            F.col("pos"), syn, F.lit("synonym"), F.round(F.col("w") / 4, 4)
        ),
    )
    rows = norm.select(
        "query_id",
        F.explode(
            F.concat(
                F.array_compact(
                    F.array(
                        term_s, phrase_s, prox_s, *mm_structs, *field_structs
                    )
                ),
                syn_structs,
            )
        ).alias("r"),
    )
    return rows.select(
        "query_id",
        F.col("r.pos").alias("pos"),
        F.col("r.term").alias("term"),
        F.col("r.term_type").alias("term_type"),
        F.col("r.boost_r4").alias("boost_r4"),
    )


_FIELDS_VALUES = ", ".join(
    f"({i}, '{f}', {b})" for i, (f, b) in enumerate(QUERY_FIELDS)
)

_MM_VALUES = ", ".join(
    f"({i}, '{name}', {v})" for i, (name, v) in enumerate(MIN_MATCH_LADDER)
)


def _build_query_build_sql() -> str:
    return f"""
WITH {_DUCK_CORPUS_STATS.strip()},
q AS (
  SELECT doc_id AS query_id, {_DUCK_CLEAN} AS q
  FROM documents WHERE doc_id % {QUERY_MOD} = 0),
qtoks0 AS (
  SELECT query_id,
         unnest(regexp_split_to_array(q, '\\s+')) AS token,
         unnest(generate_series(1, len(regexp_split_to_array(q, '\\s+')))) AS pos
  FROM q),
qtoks AS (
  SELECT query_id, CAST(pos - 1 AS INTEGER) AS pos, token
  FROM qtoks0 WHERE token <> ''),
w0 AS (
  SELECT query_id, pos, token,
         CAST(round(({_DUCK_RAW_WEIGHT}) * 1e6) AS BIGINT) AS wq
  FROM qtoks
  LEFT JOIN stats_t USING (token){_DUCK_TAG_JOINS}),
tot AS (SELECT query_id, sum(wq) AS s FROM w0 GROUP BY query_id),
norm AS (
  SELECT w0.query_id, w0.pos, w0.token, w0.wq / tot.s AS w
  FROM w0 JOIN tot USING (query_id)),
terms AS (
  SELECT query_id, pos, token AS term, 'term' AS term_type,
         round(w, 4) AS boost_r4
  FROM norm),
pairs AS (
  SELECT query_id, pos, token, w,
         lead(token) OVER (PARTITION BY query_id ORDER BY pos) AS nxt,
         lead(w) OVER (PARTITION BY query_id ORDER BY pos) AS nw,
         lead(pos) OVER (PARTITION BY query_id ORDER BY pos) AS npos
  FROM norm),
phrases AS (
  SELECT query_id, CAST(npos AS INTEGER) AS pos, token || ' ' || nxt AS term,
         'phrase' AS term_type, round(greatest(w, nw) * 2, 4) AS boost_r4
  FROM pairs WHERE nxt IS NOT NULL),
fields AS (
  SELECT q.query_id, f.pos, f.term, 'field' AS term_type, f.boost_r4
  FROM q, (SELECT * FROM (VALUES {_FIELDS_VALUES}) v(pos, term, boost_r4)) f),
synonyms AS (
  SELECT n.query_id, n.pos, sy.syn AS term, 'synonym' AS term_type,
         round(n.w / 4, 4) AS boost_r4
  FROM norm n
  JOIN (SELECT * FROM (VALUES {_SYN_VALUES}) v(token, syn)) sy
    USING (token)),
proximity AS (
  SELECT query_id, 0 AS pos,
         string_agg(token, ' ' ORDER BY pos) AS term,
         'proximity' AS term_type, 1.5 AS boost_r4
  FROM norm GROUP BY query_id HAVING count(*) > 1),
min_match AS (
  SELECT q.query_id, m.pos, m.term, 'min_match' AS term_type, m.boost_r4
  FROM q, (SELECT * FROM (VALUES {_MM_VALUES}) v(pos, term, boost_r4)) m)
SELECT query_id, CAST(pos AS INTEGER) AS pos, term, term_type,
       CAST(boost_r4 AS DOUBLE) AS boost_r4
FROM (SELECT * FROM terms UNION ALL SELECT * FROM phrases
      UNION ALL SELECT * FROM fields
      UNION ALL SELECT * FROM synonyms
      UNION ALL SELECT * FROM proximity
      UNION ALL SELECT * FROM min_match)
"""


from ragflow_spark.ops.similarity import (  # noqa: E402
    QUERY_BATCH_MAX as _QBMAX,
)


def _tokvec_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, toks, v): distinct lowercase tokens + L2-normalized vector
    per document (documents ⋈ embeddings on id)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "toks"
        ),
    )
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    vec = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double") / norm).alias("v")
    )
    return docs.join(vec, docs.doc_id == vec.vec_id).select("doc_id", "toks", "v")


def _fused_topk(
    corpus: DataFrame,
    q: DataFrame,
    text_weight: float,
    vec_weight: float,
    k: int,
    out_col: str,
) -> DataFrame:
    """Broadcast the bounded query side against the corpus, score
    ``text_weight·overlap + vec_weight·cosine``, window top-k."""
    cos = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    text_sim = F.size(F.array_intersect("qtoks", "toks")) / F.size("qtoks")
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.lit(text_weight) * text_sim + F.lit(vec_weight) * cos, 6
            ).alias(out_col),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(out_col), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "doc_id", out_col)
    )


def _query_side(
    corpus: DataFrame, query_mod: int, queries: DataFrame | None
) -> DataFrame:
    """The query side is an explicit BOUNDED batch by contract (the
    reference caps retrieval at topk≤1024, rag/nlp/search.py:355-381) —
    broadcasting it is safe because it is a query batch, never a corpus
    fraction. ``queries`` is (doc_id) keys joined against the corpus; the
    default batch is stride-query_mod ids capped below
    query_mod·QUERY_BATCH_MAX — fixed size at any corpus scale, so the
    executed default honors the same bounded contract."""
    from ragflow_spark.ops.similarity import QUERY_BATCH_MAX

    src = (
        corpus.join(F.broadcast(queries.select("doc_id")), "doc_id")
        if queries is not None
        else corpus.where(
            (F.col("doc_id") % query_mod == 0)
            & (F.col("doc_id") < query_mod * QUERY_BATCH_MAX)
        )
    )
    return src.select(
        F.col("doc_id").alias("query_id"),
        F.col("toks").alias("qtoks"),
        F.col("v").alias("qv"),
    )


def hybrid_search(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    query_mod: int = QUERY_MOD,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Per query doc: fused = 0.05·(token overlap / |query tokens|) +
    0.95·cosine(query vec, doc vec); top-k by (fused desc, id)
    (reference search.py:100-133, FusionExpr weighted_sum 0.05,0.95)."""
    corpus = _tokvec_corpus(spark, sf_dir)
    q = _query_side(corpus, query_mod, queries)
    return _fused_topk(corpus, q, 0.05, 0.95, k, "fused_r6")


def rerank_fusion(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    query_mod: int = QUERY_MOD,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Rerank (reference rag/nlp/search.py:279-339): blend token-overlap
    similarity 0.3 with dense cosine 0.7, re-rank per query (window
    re-order of an existing candidate list)."""
    corpus = _tokvec_corpus(spark, sf_dir)
    q = _query_side(corpus, query_mod, queries)
    return _fused_topk(corpus, q, 0.3, 0.7, k, "rerank_r6")


RERANK_FUSION_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
  FROM documents),
vecs AS (
  SELECT vec_id,
         list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                        x -> x / sqrt(list_dot_product(
                             list_transform(embedding, y -> CAST(y AS DOUBLE)),
                             list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS v
  FROM embeddings),
corpus AS (
  SELECT doc_id, toks, v FROM toks JOIN vecs ON doc_id = vec_id),
q AS (
  SELECT doc_id AS query_id, toks AS qtoks, v AS qv
  FROM corpus WHERE doc_id % {QUERY_MOD} = 0
    AND doc_id < {QUERY_MOD * _QBMAX}),
scored AS (
  SELECT q.query_id, c.doc_id,
         round(0.3 * (len(list_intersect(q.qtoks, c.toks)) * 1.0 / len(q.qtoks))
               + 0.7 * list_dot_product(q.qv, c.v), 6) AS rerank_r6
  FROM corpus c, q WHERE c.doc_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rerank_r6 DESC, doc_id ASC) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, rerank_r6
FROM ranked WHERE rank <= {TOP_K}
"""


def tag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag-feature scoring (reference rag/nlp/search.py:463-501,
    TF-ICF-like smoothing (c+1)/(cnt+S)): per (source, lang) "tag", the
    smoothed share of each tag within its source, scaled by the tag's
    corpus-wide rarity. Integer counts + single divisions."""
    docs = load(spark, sf_dir, "documents")
    s_tot = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    tag_tot = docs.groupBy("lang").agg(F.count("*").alias("all_tag"))
    n_langs = docs.agg(F.countDistinct("lang").alias("n_langs"))
    by = docs.groupBy("source", "lang").agg(F.count("*").alias("c"))
    return (
        by.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(tag_tot), "lang")
        .crossJoin(F.broadcast(n_langs))
        .select(
            "source",
            F.col("lang").alias("tag"),
            F.col("c").cast("int").alias("c"),
            F.round(
                (F.col("c") + 1) / (F.col("cnt") + F.col("n_langs")) / F.col("all_tag"),
                6,
            ).alias("feat_r6"),
        )
    )


TAG_FEATURES_SQL = """
WITH s_tot AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
tag_tot AS (SELECT lang, count(*) AS all_tag FROM documents GROUP BY lang),
n AS (SELECT count(DISTINCT lang) AS n_langs FROM documents),
by_t AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY source, lang)
SELECT by_t.source, by_t.lang AS tag, CAST(c AS INTEGER) AS c,
       round((c + 1) * 1.0 / (cnt + (SELECT n_langs FROM n)) / all_tag, 6) AS feat_r6
FROM by_t
JOIN s_tot ON by_t.source = s_tot.source
JOIN tag_tot ON by_t.lang = tag_tot.lang
"""


HYBRID_SEARCH_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
  FROM documents),
vecs AS (
  SELECT vec_id,
         list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                        x -> x / sqrt(list_dot_product(
                             list_transform(embedding, y -> CAST(y AS DOUBLE)),
                             list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS v
  FROM embeddings),
corpus AS (
  SELECT doc_id, toks, v FROM toks JOIN vecs ON doc_id = vec_id),
q AS (
  SELECT doc_id AS query_id, toks AS qtoks, v AS qv
  FROM corpus WHERE doc_id % {QUERY_MOD} = 0
    AND doc_id < {QUERY_MOD * _QBMAX}),
scored AS (
  SELECT q.query_id, c.doc_id,
         round(0.05 * (len(list_intersect(q.qtoks, c.toks)) * 1.0 / len(q.qtoks))
               + 0.95 * list_dot_product(q.qv, c.v), 6) AS fused_r6
  FROM corpus c, q WHERE c.doc_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY fused_r6 DESC, doc_id ASC) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, fused_r6
FROM ranked WHERE rank <= {TOP_K}
"""


# ------------------------------------------------------ dictionary resolution
NER_DICT: dict[str, str] = {}
POS_DICT: dict[str, str] = {}
SYNONYMS: dict[str, list[str]] = {}
_DUCK_TAG_JOINS = ""
_SYN_VALUES = ""
TERM_WEIGHTS_SQL = ""
QUERY_BUILD_SQL = ""


def _resolve_dictionaries() -> None:
    """Resolve the pluggable dictionaries from their env knobs and rebuild
    every dict-derived SQL fragment (the oracle side must see the same
    dictionary as the Spark side). Runs at import and from
    reset_dictionaries(); a set-but-missing path raises here (driver-side)
    rather than silently falling back to the vendored subset."""
    global NER_DICT, POS_DICT, SYNONYMS, _DUCK_TAG_JOINS, _SYN_VALUES
    global TERM_WEIGHTS_SQL, QUERY_BUILD_SQL
    ner_path = os.environ.get(NER_ENV, "")
    NER_DICT = load_tag_file(ner_path, NER_BOOSTS) if ner_path else VENDORED_NER
    pos_path = os.environ.get(POS_ENV, "")
    POS_DICT = (
        load_tag_file(pos_path, POS_BOOSTS)
        if pos_path
        else (_pos_from_huqie() or VENDORED_POS)
    )
    syn_path = os.environ.get(SYNONYM_ENV, "")
    SYNONYMS = load_synonym_file(syn_path) if syn_path else VENDORED_SYNONYMS
    _DUCK_TAG_JOINS = f"""
  LEFT JOIN {_values_dim(NER_DICT, NER_BOOSTS, 'ner_b')} nd USING (token)
  LEFT JOIN {_values_dim(POS_DICT, POS_BOOSTS, 'pos_b')} pd USING (token)"""
    # single quotes doubled so a loaded dictionary with apostrophes still
    # compiles as a SQL VALUES list
    _SYN_VALUES = ", ".join(
        "('{}', '{}')".format(k.replace("'", "''"), s.replace("'", "''"))
        for k, syns in SYNONYMS.items()
        for s in syns
    )
    TERM_WEIGHTS_SQL = _build_term_weights_sql()
    QUERY_BUILD_SQL = _build_query_build_sql()


def reset_dictionaries() -> None:
    """Re-resolve after flipping $RAGFLOW_SPARK_{SYNONYM,NER,POS}_JSON or
    $RAGFLOW_SPARK_HUQIE_DICT (mirrors trie_tokenizer's
    reset_default_tokenizer hook — ADVICE r4)."""
    _resolve_dictionaries()


_resolve_dictionaries()
