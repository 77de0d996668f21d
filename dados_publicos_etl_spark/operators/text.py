"""Text-analysis operators over the ``documents`` table (north-star
extension; SURVEY.md §2.B "text analysis").

Everything is Catalyst expression form — tokenization, stats, the
language-ID heuristic and fingerprinting run JVM-side with no Python
in the row path, so they scale to 100 TB document corpora as a
narrow map over the scan (no shuffle except where aggregation is the
point, e.g. term frequencies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dados_publicos_etl_spark.functions.text import (
    WORD,
    WS,
    distinct_tokens,
    fingerprint_md5,
    tokens,
    word_count,
)
from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans.registry import query

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic.  Deterministic and SQL-replicable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
    "zh": ("de", "le", "shi"),
}


@query(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_text,
           CAST(len(string_split_regex(lower(text), '{WS}')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split_regex(lower(text), '{WS}'))) AS INT)
             AS n_distinct_tokens,
           CAST(len(regexp_extract_all(text, '{WORD}')) AS INT) AS n_words,
           ROUND(CAST(LENGTH(text) AS DOUBLE)
                 / len(string_split_regex(lower(text), '{WS}')), 4) AS avg_token_span,
           ROUND(CAST(len(list_distinct(string_split_regex(lower(text), '{WS}'))) AS DOUBLE)
                 / len(string_split_regex(lower(text), '{WS}')), 4) AS type_token_ratio
    FROM documents
    """,
    description="Per-document quality stats: char/token/word counts, "
    "type-token ratio (all narrow-map expressions).",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tokens = F.size(toks)
    n_distinct = F.size(distinct_tokens("text"))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_text"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        word_count("text").alias("n_words"),
        F.round(F.length("text").cast("double") / n_tokens, 4).alias(
            "avg_token_span"
        ),
        F.round(n_distinct.cast("double") / n_tokens, 4).alias(
            "type_token_ratio"
        ),
    )


@query(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '{WS}', ' ', 'g'))) AS fp_md5,
           CAST(LENGTH(trim(regexp_replace(lower(text), '{WS}', ' ', 'g'))) AS BIGINT)
             AS n_chars_norm
    FROM documents
    """,
    description="Deterministic document fingerprint: md5 over "
    "normalized text (dedup key; rolling-hash fingerprints are the "
    "simhash query).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    from dados_publicos_etl_spark.functions.text import normalized

    return docs.select(
        "doc_id",
        fingerprint_md5("text").alias("fp_md5"),
        F.length(normalized("text")).cast("long").alias("n_chars_norm"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = LANG_MARKERS[lang]
    hits = " + ".join(
        f"CASE WHEN list_contains(toks, '{m}') THEN 1 ELSE 0 END"
        for m in markers
    )
    return f"({hits})"


@query(
    "lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_distinct(string_split_regex(lower(text), '{WS}')) AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             {_lang_score_sql('en')} AS s_en,
             {_lang_score_sql('es')} AS s_es,
             {_lang_score_sql('fr')} AS s_fr,
             {_lang_score_sql('de')} AS s_de
      FROM t
    )
    SELECT doc_id, lang,
           CASE
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
             WHEN s_fr >= s_de THEN 'fr'
             ELSE 'de'
           END AS predicted_lang
    FROM scored
    """,
    description="Stopword-marker language-ID heuristic (deterministic "
    "argmax with fixed tie-break order en>es>fr>de).",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = distinct_tokens("text")
    scores = {}
    for lang in ("en", "es", "fr", "de"):
        score = None
        for m in LANG_MARKERS[lang]:
            hit = F.when(F.array_contains(toks, m), 1).otherwise(0)
            score = hit if score is None else score + hit
        scores[lang] = score
    pred = (
        F.when(
            (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["de"]),
            "en",
        )
        .when(
            (scores["es"] >= scores["fr"]) & (scores["es"] >= scores["de"]),
            "es",
        )
        .when(scores["fr"] >= scores["de"], "fr")
        .otherwise("de")
    )
    return docs.select("doc_id", "lang", pred.alias("predicted_lang"))


@query(
    "term_frequency",
    oracle=f"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split_regex(lower(text), '{WS}')) AS token
          FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 20
    """,
    description="Corpus term frequencies: tokenize -> explode -> "
    "count -> top-k (partial agg before the shuffle keeps the "
    "explode local).",
)
def term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )
