"""Spark operators for the extraction pipeline.

Physical layout (SURVEY.md §4.3, north-rule "partitioning / shuffle / skew
handled explicitly"):

- **strip** is span-local → ``posexplode`` the span arrays, then *salted
  repartition* on ``(doc_id, offset-block)`` so one giant document's spans
  spread across the cluster instead of pinning a single task. The stage runs
  as ``mapInPandas`` (Arrow batches; the kernel is pure Python over batch
  rows, no Spark-level per-row UDF).
- **finalize** (layout + assembly + emit) is doc-level and order-dependent →
  ``applyInPandas`` over ``groupBy(doc_id)``. Inside, the kernel is
  numpy-vectorized per document; across documents, vectorization comes from
  Arrow batching. AQE skew-split handles residual partition imbalance.
- **chunk** is doc-level again but consumes the already-reduced span stream
  (orders of magnitude smaller than the input), so its shuffle is cheap.

At 100 TB the dominant costs are the input scan (columnar, pruned to
doc_id+spans) and the one shuffle into finalize; strip's salting bounds the
largest task by ``salt_block`` spans rather than by the largest document.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ragflow_spark.kernels.extract import (
    chunk_doc,
    extract_doc,
    finalize_doc,
    strip_rows,
)
from ragflow_spark.schemas import CHUNKS_SCHEMA, OUT_SPANS_SCHEMA

STRIPPED_SCHEMA = (
    "doc_id string, kind string, text string, media_ref string, "
    "offset int, sub int"
)


def explode_spans(docs: DataFrame, salt_block: int = 256) -> DataFrame:
    """(doc_id, spans[]) → one row per span, salted.

    ``salt`` buckets ``offset`` into blocks of ``salt_block`` so a 10^6-span
    document becomes ~4k independent tasks' worth of rows instead of one hot
    key. The strip stage never needs whole-doc context, so this is safe."""
    return (
        docs.select("doc_id", F.posexplode("spans").alias("idx", "span"))
        .select(
            "doc_id",
            F.col("span.kind").alias("kind"),
            F.col("span.text").alias("text"),
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("offset"),
        )
        .withColumn("salt", (F.col("offset") / F.lit(salt_block)).cast("int"))
    )


def strip_stage(exploded: DataFrame, repartition: int | None = None) -> DataFrame:
    """Format parsing (html/md/txt/json) as an Arrow-batched map. Salted
    repartition spreads giant docs; the map itself is stateless."""
    df = exploded
    # explicit numPartitions: a bare repartition(cols) is AQE-coalescible,
    # and a giant doc's spans are SMALL by bytes (AQE's only yardstick)
    # while huge by kernel CPU — AQE folded the salted shuffle back into
    # one partition, silently re-serializing the exact straggler this
    # stage exists to spread (measured: skew bench straggler cut 1.0x
    # before, 5.8x after on 8 cores; the CLAUDE.md tiny-task-list
    # invariant, now on the giant-doc path). User-specified counts are
    # exempt from AQE.
    if not repartition:
        par = exploded.sparkSession.sparkContext.defaultParallelism
        repartition = par * 4
    df = df.repartition(repartition, "doc_id", "salt")

    def run(batches):
        for pdf in batches:
            out_rows: list[dict] = []
            spans = pdf[["doc_id", "kind", "text", "media_ref", "offset"]].to_dict("records")
            for s in spans:
                for r in strip_rows([s]):
                    r["doc_id"] = s["doc_id"]
                    out_rows.append(r)
            yield pd.DataFrame(
                out_rows,
                columns=["doc_id", "kind", "text", "media_ref", "offset", "sub"],
            )

    return df.mapInPandas(run, schema=STRIPPED_SCHEMA)


def _finalize_plain_vectorized(pdf: pd.DataFrame) -> pd.DataFrame:
    """finalize_doc's plain branch (no geometry rows anywhere in the doc)
    as vectorized pandas — bit-equal to the kernel (tests assert it; the
    CLAUDE invariant for new physical paths). This is the giant-doc salted
    path's serial floor: the per-doc finalize is one task by contract, so
    a 10^5-span doc paid a python dict-loop sort here (~7 s at 150k rows,
    scripts/skew_bench.py) where a column sort + masks cost ~0.1 s."""
    pdf = pdf.sort_values(["offset", "sub"], kind="stable")
    kind = pdf["kind"].fillna("")
    text = pdf["text"].fillna("")
    mr = pdf["media_ref"].fillna("")
    keep = ~kind.isin(("header", "footer", "reference"))
    keep &= (text.str.strip() != "") | (mr != "")
    kind = kind[keep]
    out_kind = kind.where(
        kind.isin(("title", "figure")),
        kind.map(lambda k: "table" if k in ("table", "table header") else "text"),
    )
    return pd.DataFrame(
        {
            "seq": range(int(keep.sum())),
            "kind": out_kind.to_numpy(),
            "text": text[keep].to_numpy(),
            "media_ref": mr[keep].to_numpy(),
        }
    )


def finalize_stage(
    stripped: DataFrame, html_tables: bool = False, capture_errors: bool = False
) -> DataFrame:
    """Doc-level layout/assembly/emit: one shuffle on doc_id, then the
    numpy kernel per document. Docs with NO geometry rows (the common
    shape on the giant-doc tail: huge plain-span documents) take a
    vectorized pandas fast path instead of the per-row python kernel —
    same output by construction and by test.

    capture_errors: a doc whose kernel raises emits a single
    ``kind='__error__'`` marker row (text = exception repr) instead of
    failing the task — the pipeline layer turns these into
    ``failure_count`` lineage metrics and drops them from the output."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf["doc_id"].iloc[0]
        try:
            mr = pdf["media_ref"].fillna("")
            has_geom = (
                mr.str.startswith("geom://")
                | mr.str.contains("#geom=", regex=False)
            ).any()
            if not has_geom:
                out_pdf = _finalize_plain_vectorized(pdf)
                out_pdf.insert(0, "doc_id", doc_id)
                return out_pdf
            rows = pdf[["kind", "text", "media_ref", "offset", "sub"]].to_dict(
                "records"
            )
            out = finalize_doc(rows, html_tables=html_tables)
        except Exception as e:  # noqa: BLE001 — per-doc isolation
            if not capture_errors:
                raise
            out = [{"seq": 0, "kind": "__error__", "text": repr(e), "media_ref": ""}]
        return pd.DataFrame(
            {
                "doc_id": [doc_id] * len(out),
                "seq": [o["seq"] for o in out],
                "kind": [o["kind"] for o in out],
                "text": [o["text"] for o in out],
                "media_ref": [o["media_ref"] for o in out],
            }
        )

    return stripped.groupBy("doc_id").applyInPandas(run, schema=OUT_SPANS_SCHEMA)


def whole_doc_stage(docs: DataFrame, html_tables: bool = False) -> DataFrame:
    """Zero-shuffle extraction for docs whose span array fits one task: the
    input row already holds the whole document, so strip+finalize run in a
    single ``mapInPandas`` pass — no explode, no regroup, one Arrow hop.
    This is the common path; the exploded/salted path below exists for the
    giant-doc tail."""

    def run(batches):
        for pdf in batches:
            ids: list[str] = []
            out_rows: list[dict] = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                recs = [
                    {
                        "kind": s["kind"],
                        "text": s["text"],
                        "media_ref": s["media_ref"],
                        "offset": s["offset"],
                    }
                    for s in spans
                ]
                for o in extract_doc(recs, html_tables=html_tables):
                    ids.append(doc_id)
                    out_rows.append(o)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "seq": [o["seq"] for o in out_rows],
                    "kind": [o["kind"] for o in out_rows],
                    "text": [o["text"] for o in out_rows],
                    "media_ref": [o["media_ref"] for o in out_rows],
                }
            )

    return docs.mapInPandas(run, schema=OUT_SPANS_SCHEMA)


GIANT_SPAN_THRESHOLD = 2048


def extract_spans(
    docs: DataFrame,
    salt_block: int = 256,
    html_tables: bool = False,
    repartition: int | None = None,
    giant_threshold: int = GIANT_SPAN_THRESHOLD,
) -> DataFrame:
    """Full extraction with explicit skew routing:

    - spans < giant_threshold (≈all docs): whole-doc single-pass map,
      ZERO shuffles — input scan → Arrow batch → output.
    - spans ≥ giant_threshold (heavy tail): explode → salted strip (spreads
      one document's spans across the cluster) → per-doc finalize regroup.

    Both paths run the identical kernels (tests assert equality), so the
    threshold is purely a physical-plan knob. ``giant_threshold=0`` forces
    the exploded path everywhere (used by tests and the skew bench)."""
    if giant_threshold <= 0:
        exploded = explode_spans(docs, salt_block=salt_block)
        stripped = strip_stage(exploded, repartition=repartition)
        return finalize_stage(stripped, html_tables=html_tables)
    small = docs.where(F.size("spans") < giant_threshold)
    giant = docs.where(F.size("spans") >= giant_threshold)
    small_out = whole_doc_stage(small, html_tables=html_tables)
    giant_out = finalize_stage(
        strip_stage(explode_spans(giant, salt_block=salt_block), repartition=repartition),
        html_tables=html_tables,
    )
    return small_out.unionByName(giant_out)


def extract_chunks_fused(
    docs: DataFrame,
    chunker: str = "naive",
    chunk_token_num: int = 512,
    delimiter: str = "\n!?。；！？",
    overlapped_percent: int = 0,
    html_tables: bool = False,
    giant_threshold: int = GIANT_SPAN_THRESHOLD,
) -> DataFrame:
    """End-to-end extract+chunk in ONE pass for non-giant docs (zero
    shuffles input→chunks); giant docs fall back to the staged path whose
    chunk step shuffles only the reduced span stream."""

    def run(batches):
        for pdf in batches:
            ids: list[str] = []
            rows: list[dict] = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                recs = [
                    {
                        "kind": s["kind"],
                        "text": s["text"],
                        "media_ref": s["media_ref"],
                        "offset": s["offset"],
                    }
                    for s in spans
                ]
                out = extract_doc(recs, html_tables=html_tables)
                for c in chunk_doc(
                    out,
                    chunker=chunker,
                    chunk_token_num=chunk_token_num,
                    delimiter=delimiter,
                    overlapped_percent=overlapped_percent,
                ):
                    ids.append(doc_id)
                    rows.append(c)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "chunker": [c["chunker"] for c in rows],
                    "chunk_seq": [c["chunk_seq"] for c in rows],
                    "text": [c["text"] for c in rows],
                    "token_count": [c["token_count"] for c in rows],
                    "media_refs": pd.Series(
                            [c["media_refs"] for c in rows], dtype=object
                        ),
                }
            )

    small = docs.where(F.size("spans") < giant_threshold)
    giant = docs.where(F.size("spans") >= giant_threshold)
    small_chunks = small.mapInPandas(run, schema=CHUNKS_SCHEMA)
    giant_spans = finalize_stage(
        strip_stage(explode_spans(giant)), html_tables=html_tables
    )
    giant_chunks = chunk_stage(
        giant_spans,
        chunker=chunker,
        chunk_token_num=chunk_token_num,
        delimiter=delimiter,
        overlapped_percent=overlapped_percent,
    )
    return small_chunks.unionByName(giant_chunks)


def with_chunk_ids(chunks: DataFrame) -> DataFrame:
    """Stable content-addressed chunk ids (reference:
    rag/svr/task_executor.py:287 — xxhash64(content + doc_id)); built-in
    ``F.xxhash64``, no UDF. Idempotent re-runs produce identical ids, which
    is what makes sink upserts and digest-based reuse possible."""
    return chunks.withColumn("chunk_id", F.xxhash64("text", "doc_id"))


def chunk_stage(
    out_spans: DataFrame,
    chunker: str = "naive",
    chunk_token_num: int = 512,
    delimiter: str = "\n!?。；！？",
    overlapped_percent: int = 0,
) -> DataFrame:
    """Template chunking per document over the extracted span stream."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf["doc_id"].iloc[0]
        spans = pdf[["seq", "kind", "text", "media_ref"]].to_dict("records")
        chunks = chunk_doc(
            spans,
            chunker=chunker,
            chunk_token_num=chunk_token_num,
            delimiter=delimiter,
            overlapped_percent=overlapped_percent,
        )
        return pd.DataFrame(
            {
                "doc_id": [doc_id] * len(chunks),
                "chunker": [c["chunker"] for c in chunks],
                "chunk_seq": [c["chunk_seq"] for c in chunks],
                "text": [c["text"] for c in chunks],
                "token_count": [c["token_count"] for c in chunks],
                # explicit object dtype: an empty batch would otherwise
                # infer float64, which Arrow can't cast to array<string>
                "media_refs": pd.Series(
                    [c["media_refs"] for c in chunks], dtype=object
                ),
            }
        )

    return out_spans.groupBy("doc_id").applyInPandas(run, schema=CHUNKS_SCHEMA)


# single shared tag-strip contract (rag/nlp/__init__.py:261)
from ragflow_spark.kernels.media_docs import TABLE_TAG_RE as _TABLE_TAG


def with_ltks(chunks: DataFrame) -> DataFrame:
    """Doc-field assembly (reference tokenize, rag/nlp/__init__.py:258-263):
    strip table HTML tags, then add ``content_ltks`` (trie-tokenized text)
    and ``content_sm_ltks`` (fine-grained re-split) columns. Arrow-batched
    mapInPandas; the trie builds once per worker (module-level lazy
    singleton), so the per-row cost is the tokenization itself."""
    schema = T.StructType(
        chunks.schema.fields
        + [
            T.StructField("content_ltks", T.StringType(), True),
            T.StructField("content_sm_ltks", T.StringType(), True),
        ]
    )

    def run(batches):
        import re as _re

        from ragflow_spark.functions.trie_tokenizer import (
            fine_grained_tokenize,
            tokenize,
        )

        for pdf in batches:
            stripped = (
                pdf["text"]
                .fillna("")
                .map(lambda t: _TABLE_TAG.sub(" ", t))
            )
            pdf = pdf.copy()
            pdf["content_ltks"] = stripped.map(tokenize)
            pdf["content_sm_ltks"] = pdf["content_ltks"].map(
                fine_grained_tokenize
            )
            yield pdf

    return chunks.mapInPandas(run, schema=schema)


def assemble_es_docs(chunks: DataFrame, docnm_col: str = "docnm") -> DataFrame:
    """Index-doc assembly — the reference ``tokenize_chunks`` non-PDF path
    (rag/nlp/__init__.py:267-286 + add_positions :332-344): every non-empty
    chunk becomes a search document carrying the file-level title fields
    (``docnm_kwd``, ``title_tks``, ``title_sm_tks`` from the name minus its
    extension), the pseudo position ``[[ii]*5]`` → page_num_int [ii+1] /
    position_int [[ii+1,ii,ii,ii,ii]] / top_int [ii], and the tokenized
    content fields. The PDF crop branch is the ONNX non-goal; real PDF
    geometry rides as structs upstream (schemas.Geom). One Arrow pass, no
    shuffle — the per-doc title tokenization is cached per batch because
    consecutive chunks share their document."""
    import re as _re

    schema = T.StructType(
        chunks.schema.fields
        + [
            T.StructField("docnm_kwd", T.StringType(), True),
            T.StructField("title_tks", T.StringType(), True),
            T.StructField("title_sm_tks", T.StringType(), True),
            T.StructField("page_num_int", T.ArrayType(T.IntegerType()), True),
            T.StructField(
                "position_int",
                T.ArrayType(T.ArrayType(T.IntegerType())),
                True,
            ),
            T.StructField("top_int", T.ArrayType(T.IntegerType()), True),
            T.StructField("content_ltks", T.StringType(), True),
            T.StructField("content_sm_ltks", T.StringType(), True),
        ]
    )
    ext_re = _re.compile(r"\.[a-zA-Z]+$")
    table_re = _TABLE_TAG

    def run(batches):
        from ragflow_spark.functions.trie_tokenizer import (
            fine_grained_tokenize,
            tokenize,
        )

        title_cache: dict[str, tuple[str, str]] = {}

        def titles(nm: str) -> tuple[str, str]:
            if nm not in title_cache:
                tks = tokenize(ext_re.sub("", nm))
                title_cache[nm] = (tks, fine_grained_tokenize(tks))
            return title_cache[nm]

        for pdf in batches:
            keep = pdf["text"].fillna("").str.strip().str.len() > 0
            pdf = pdf[keep].copy()
            tt = pdf[docnm_col].fillna("").map(titles)
            pdf["docnm_kwd"] = pdf[docnm_col]
            pdf["title_tks"] = tt.map(lambda t: t[0])
            pdf["title_sm_tks"] = tt.map(lambda t: t[1])
            # explicit object dtype: Arrow can't convert numpy-inferred
            # nested-list arrays (same pitfall as chunk_stage media_refs)
            seq = pdf["chunk_seq"].astype(int).tolist()
            pdf["page_num_int"] = pd.Series(
                [[i + 1] for i in seq], dtype=object, index=pdf.index
            )
            pdf["position_int"] = pd.Series(
                [[[i + 1, i, i, i, i]] for i in seq],
                dtype=object,
                index=pdf.index,
            )
            pdf["top_int"] = pd.Series(
                [[i] for i in seq], dtype=object, index=pdf.index
            )
            stripped = pdf["text"].fillna("").map(
                lambda t: table_re.sub(" ", t)
            )
            pdf["content_ltks"] = stripped.map(tokenize)
            pdf["content_sm_ltks"] = pdf["content_ltks"].map(
                fine_grained_tokenize
            )
            yield pdf

    return chunks.mapInPandas(run, schema=schema)
