"""Shared DuckDB-oracle SQL fragments with NO workload imports — a
LEAF module that breaks the ``workload_{sources,curation} →
workload_training`` circular-import edge.

Before r13, ``_QC_B`` / ``_QC_GRAMS`` / ``QC_SCORE_ORACLE`` lived in
``workload_training`` and were imported (inside register helpers that
still run at module-import time) by ``workload_sources`` and
``workload_curation`` — both of which ``workload.py`` imports BEFORE
``workload_training``. Any process that imported
``workload_training`` directly therefore died with a
partially-initialized-module ImportError; the full test suite only
passed because an earlier test usually loaded ``workload`` first.
Fragments here may depend only on ``functions.*`` leaf modules, never
on anything under ``workload*``.
"""

from __future__ import annotations

from air_quality_etl_pipeline_spark.functions.portable_math import (
    sql_ln_int,
    sql_quantize_micro9,
)

#: whitespace tokens, [] on blank — the SQL twin of
#: functions.core.token_array (shared by every documents-table oracle)
TOKS = (
    "CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)

#: lower-cased token list — twin of the classifier's gram normalizer
LTOKS = f"list_transform({TOKS}, x -> lower(x))"

QC_B = 1024  # feature buckets (hashing trick)


def qc_qln(expr: str) -> str:
    """micro9-quantized bit-portable ln of a positive int64 SQL expr."""
    return sql_quantize_micro9(sql_ln_int(expr))


#: unigram ∪ bigram gram stream over a relation `{rel}` that carries
#: (``{keep}``, toks) — the SQL twin of operators.text.hashed_gram_buckets
QC_GRAMS = """
      SELECT {keep}, u.tok AS gram FROM {rel}, unnest(toks) AS u(tok)
      UNION ALL
      SELECT {keep}, toks[u.i] || ' ' || toks[u.i + 1] AS gram
      FROM {rel}, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)"""

QC_BUCKET = "(('0x' || substr(md5('qc:' || gram), 1, 15))::BIGINT % 1024)"


#: Shared by workload_training's batch query and its streaming twin
#: (workload_sources.q_streaming_quality_score): the streaming twin
#: scores the same corpus micro-batch-by-micro-batch with the same
#: once-built weight table, so the SAME oracle applies — that equality
#: is its exactly-once check.
QC_SCORE_ORACLE = f"""
    WITH lab AS (SELECT doc_id, {LTOKS} AS toks,
                        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                 FROM documents WHERE doc_id % 5 <> 0),
    lg AS ({QC_GRAMS.format(rel="lab", keep="y")}),
    lb AS (SELECT {QC_BUCKET} AS bucket, y FROM lg),
    cnt AS (SELECT bucket,
                   CAST(count(*) FILTER (y = 1) AS BIGINT) AS c1,
                   CAST(count(*) FILTER (y = 0) AS BIGINT) AS c0
            FROM lb GROUP BY 1),
    allb AS (SELECT r.range AS bucket,
                    coalesce(c1, 0) AS c1, coalesce(c0, 0) AS c0
             FROM range(0, {QC_B}) r
             LEFT JOIN cnt ON r.range = cnt.bucket),
    tot AS (SELECT CAST(sum(c1) + {QC_B} AS BIGINT) AS t1b,
                   CAST(sum(c0) + {QC_B} AS BIGINT) AS t0b
            FROM allb),
    w AS (SELECT bucket,
                 {qc_qln("c1 + 1")} - {qc_qln("t1b")}
                 - {qc_qln("c0 + 1")} + {qc_qln("t0b")} AS wm
          FROM allb, tot),
    pr AS (SELECT {qc_qln("n1")} - {qc_qln("n0")} AS pm FROM (
             SELECT CAST(count(*) FILTER (y = 1) AS BIGINT) AS n1,
                    CAST(count(*) FILTER (y = 0) AS BIGINT) AS n0
             FROM lab)),
    d AS (SELECT doc_id, {LTOKS} AS toks FROM documents),
    dg AS ({QC_GRAMS.format(rel="d", keep="doc_id")}),
    db AS (SELECT doc_id, {QC_BUCKET} AS bucket,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM dg GROUP BY 1, 2),
    s AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
                 CAST(sum(cnt * wm) AS BIGINT) AS dot
          FROM db JOIN w USING (bucket) GROUP BY 1)
    SELECT doc_id, n_grams,
           CAST(dot + pm AS BIGINT) AS score_micro9,
           CAST((dot + pm) > 0 AS BIGINT) AS pred
    FROM s, pr
    """
