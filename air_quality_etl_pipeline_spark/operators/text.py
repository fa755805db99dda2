"""Text-analysis operators for training-data pipelines.

Beyond the reference's surface (per the north star in BASELINE.json):
language-ID, quality scoring, token counting and document
fingerprinting over a ``documents(doc_id, text, ...)`` table.

All pure Catalyst expressions (split/transform/filter/aggregate on
arrays + md5) — no Python UDFs, so they run JVM-side inside
whole-stage codegen and scale linearly with the scan; the only shuffle
any of these need is whatever aggregation the caller adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.functions.core import (
    round_portable,
    safe_div,
    token_array,
)

#: Tiny per-language stopword lists for the n-gram/stopword LID heuristic.
#: Deliberately small + deterministic so the oracle can mirror them.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
    "zh": ["的", "是", "了", "在", "和"],
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokens as an array column."""
    return token_array(text)


def token_count(text: Column) -> Column:
    """Token count (whitespace + regex segmentation)."""
    return F.size(token_array(text))


def unique_token_ratio(text: Column) -> Column:
    """|distinct tokens| / |tokens| — a repetition signal; NULL on empty."""
    toks = token_array(text)
    return safe_div(
        F.size(F.array_distinct(toks)).cast("double"),
        F.size(toks).cast("double"),
    )


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Share of tokens that are (lowercase) stopwords; NULL on empty."""
    sw = F.array(*[F.lit(s) for s in (stopwords or ENGLISH_STOPWORDS)])
    toks = F.transform(token_array(text), F.lower)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return safe_div(hits.cast("double"), F.size(toks).cast("double"))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the LID feature vector)."""
    return lang_scores_of_tokens(F.transform(token_array(text), F.lower))


def lang_scores_of_tokens(toks: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over a (lowercased) token-array
    column. PERF: pass a materialized column reference — Catalyst does
    no CSE inside lambdas, so an inlined split re-evaluates per score."""
    out: dict[str, Column] = {}
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def predicted_lang(text: Column) -> Column:
    """Heuristic language ID from raw text — see
    :func:`predicted_lang_of_tokens` (and prefer it with a materialized
    token column in hot paths)."""
    return predicted_lang_of_tokens(F.transform(token_array(text), F.lower))


def predicted_lang_of_tokens(toks: Column) -> Column:
    """Heuristic language ID: argmax of stopword hits, ties broken by
    language code order, 'und' when no list scores > 0.

    Implemented over a score ARRAY so the argmax is
    ``array_position(scores, array_max(scores))`` (first match ⇒
    deterministic tie order) — one evaluation per score, not a
    when-chain that re-evaluates every score expression per branch.
    """
    scores = lang_scores_of_tokens(toks)
    langs = sorted(scores)  # deterministic tie order
    score_arr = F.array(*[scores[lg].cast("int") for lg in langs])
    lang_arr = F.array(*[F.lit(lg) for lg in langs])
    best = F.array_max(score_arr)
    return F.when(best <= 0, F.lit("und")).otherwise(
        F.element_at(lang_arr, F.array_position(score_arr, best).cast("int"))
    )


def word_bigrams(toks: Column) -> Column:
    """Adjacent word 2-grams of a token array (``"t[i] t[i+1]"``);
    empty array below 2 tokens. Pure Catalyst — guard matters because
    ``sequence(1, 0)`` DESCENDS in Spark rather than yielding empty."""
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(grams)


def repetition_stats(
    df: DataFrame, text_col: str = "text", decimals: int = 4
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", app. A1.1: duplicate-n-gram filters), as
    three appended columns:

    * ``dup_word_frac``   — 1 − |distinct tokens| / |tokens|
    * ``top_word_share``  — occurrences of the most frequent token / |tokens|
    * ``dup_bigram_frac`` — 1 − |distinct 2-grams| / |2-grams|

    All row-local array expressions — ZERO shuffles, the filter runs
    inside the scan. ``top_word_share`` is O(|distinct|·|tokens|) per
    row via filter-count; for book-length documents switch to the
    explode → count → max aggregate (two shuffles) instead.
    """
    toks = token_array(F.col(text_col))
    df = df.withColumn("_toks", toks).withColumn(
        "_grams", word_bigrams(F.col("_toks"))
    )
    n = F.size("_toks").cast("double")
    ng = F.size("_grams").cast("double")
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("_toks"),
            lambda t: F.size(F.filter(F.col("_toks"), lambda x: x == t)),
        )
    ).cast("double")
    return (
        df.withColumn(
            "dup_word_frac",
            round_portable(
                F.lit(1.0) - safe_div(F.size(F.array_distinct("_toks")).cast("double"), n),
                decimals,
            ),
        )
        .withColumn("top_word_share", round_portable(safe_div(top_cnt, n), decimals))
        .withColumn(
            "dup_bigram_frac",
            round_portable(
                F.lit(1.0)
                - safe_div(F.size(F.array_distinct("_grams")).cast("double"), ng),
                decimals,
            ),
        )
        .drop("_toks", "_grams")
    )


def quality_score(text: Column, target_tokens: int = 100) -> Column:
    """Composite quality score in [0, 1]:
    0.4·min(tokens/target, 1) + 0.3·unique-token ratio + 0.3·stopword ratio.

    Length, repetition and naturalness signals — the standard cheap
    pre-filter trio for LLM corpus cleaning.
    """
    length_part = F.least(
        token_count(text).cast("double") / F.lit(float(target_tokens)), F.lit(1.0)
    )
    return (
        F.lit(0.4) * length_part
        + F.lit(0.3) * F.coalesce(unique_token_ratio(text), F.lit(0.0))
        + F.lit(0.3) * F.coalesce(stopword_ratio(text), F.lit(0.0))
    )


#: RE2-safe GPT-2-style pretokenizer (no lookahead, ASCII classes, so
#: Spark's Java regex and DuckDB's RE2 agree): contraction suffixes,
#: space-prefixed letter runs, digit runs, punctuation runs, whitespace.
BPE_PRETOKEN_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)

URL_PATTERN = r"https?://[^\s]+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def bpe_token_count(text: Column) -> Column:
    """Pretokenizer-level token count (the BPE-ish estimate of the
    brief): counts GPT-2-style pretoken matches. A real BPE merge pass
    only splits these further, so this bounds subword count from below
    at ~linear cost — the standard cheap budget signal for corpus
    sizing."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), 0))


def scrub_text(text: Column) -> Column:
    """URL/email scrubbing: replace matches with placeholder tags (the
    minimal PII/noise pass every corpus pipeline runs before training).
    Spark's regexp_replace replaces all matches (DuckDB needs the 'g'
    flag for the same)."""
    return F.regexp_replace(
        F.regexp_replace(text, URL_PATTERN, "<URL>"),
        EMAIL_PATTERN,
        "<EMAIL>",
    )


def normalize_for_fingerprint(text: Column) -> Column:
    """Canonicalize: lowercase, strip non-alphanumerics."""
    return F.regexp_replace(F.lower(text), r"[^a-z0-9]", "")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text. Exact-dup key."""
    return F.md5(normalize_for_fingerprint(text))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard text-stat columns to a documents frame."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_chars_text": F.length(t),
            "uniq_token_ratio": unique_token_ratio(t),
            "stopword_ratio": stopword_ratio(t),
            "lang_pred": predicted_lang(t),
            "quality": quality_score(t),
            "fingerprint": fingerprint(t),
        }
    )


def tfidf_terms(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-level TF-IDF vocabulary table:
    ``(term, tf_total, df_docs, idf, tfidf)`` with
    ``idf = ln(n_docs / df_docs)`` (Sparck Jones' inverse document
    frequency) and ``tfidf = tf_total * idf``.

    One explode + one groupBy: term counts and document frequencies come
    out of a single aggregation (map-side partial), then the scalar
    corpus size joins in by broadcast — at 100 TB this is one shuffle of
    the (term, doc) pairs, and the output is vocabulary-sized, not
    data-sized. Raw doubles; callers round for cross-engine comparison.
    """
    terms = df.select(
        F.col(id_col).alias("_id"),
        F.explode(token_array(F.col(text_col))).alias("_tok"),
    ).select("_id", F.lower(F.col("_tok")).alias("term"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("_n_docs")
    )
    stats = terms.groupBy("term").agg(
        F.count("*").alias("tf_total"),
        F.countDistinct("_id").alias("df_docs"),
    )
    idf = F.log(F.col("_n_docs").cast("double") / F.col("df_docs"))
    return stats.crossJoin(F.broadcast(n_docs)).select(
        "term",
        "tf_total",
        "df_docs",
        idf.alias("idf"),
        (F.col("tf_total") * idf).alias("tfidf"),
    )
