"""Web-ingest preparation operators (round 7): URL canonicalization
dedup and the character-class (charset QA) report.

The reference pipeline ingests government zip/CSV drops
(reference scraping.py:23-91); a web-scale training-data pipeline
ingests URLs, where the FIRST dedup pass is not content hashing but
URL canonicalization — the same page arrives as
``HTTPS://Host:443/p?utm_source=a&id=1#frag`` and
``https://host/p?id=1``.  Like ``html_strip_roundtrip`` and
``mojibake_repair_roundtrip``, the messy inputs are PLANTED in-engine
(deterministic per doc_id), so the canonicalization chain is proven
by construction on every row and stays DuckDB-differential: every
step is a regex/array expression both engines implement identically
(no lookahead — RE2 has none; no replacement backrefs — Spark uses
$1, DuckDB uses \\1, so none are used).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans.registry import query

# ---------------------------------------------------------------------------
# URL canonicalization dedup
# ---------------------------------------------------------------------------

# planted URL family: per-doc host-case/port/tracking/fragment noise
# around a canonical identity of (source, doc_id % 40, doc_id % 7)
_URL_SQL = (
    "'HTTPS://Docs.Example.COM:443/' || source || '/Article-' "
    "|| CAST(doc_id % 40 AS VARCHAR) || '?utm_source=feed&id=' "
    "|| CAST(doc_id % 7 AS VARCHAR) || '&Ref=xyz#sec-' "
    "|| CAST(doc_id AS VARCHAR)"
)


@query(
    "url_canonicalize_dedup",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, {_URL_SQL} AS url FROM documents
    ), s1 AS (  -- strip fragment
      SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM raw
    ), s2 AS (  -- lowercase scheme://host[:port], keep path case
      SELECT doc_id,
             lower(regexp_extract(u, '^([a-zA-Z]+://[^/]+)', 1))
               || regexp_extract(u, '^[a-zA-Z]+://[^/]+(.*)$', 1) AS u
      FROM s1
    ), s3 AS (  -- strip the scheme-default port (plain replace)
      SELECT doc_id, replace(u, ':443/', '/') AS u FROM s2
    ), parts AS (
      SELECT doc_id,
             regexp_extract(u, '^([^?]*)', 1) AS path,
             list_sort(list_filter(
               string_split(regexp_extract(u, '\\?(.*)$', 1), '&'),
               p -> NOT (starts_with(lower(p), 'utm_')
                         OR starts_with(lower(p), 'ref=')))) AS params
      FROM s3
    ), canon AS (
      SELECT doc_id,
             path || CASE WHEN len(params) > 0
                          THEN '?' || array_to_string(params, '&')
                          ELSE '' END AS canonical_url
      FROM parts
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_doc_id
    FROM canon GROUP BY canonical_url
    """,
    description="URL canonicalization dedup — the FIRST dedup pass of "
    "a web-crawl pipeline, upstream of any content hashing: strip "
    "the fragment, lowercase scheme+host (path case is significant, "
    "host case is not — RFC 3986), drop the scheme-default port, "
    "drop tracking parameters (utm_*, ref), SORT the surviving query "
    "parameters, then group by the canonical form with min-doc_id "
    "survivorship.  Messy variants are planted in-engine per doc_id "
    "(the html_strip/mojibake round-trip pattern), so the chain is "
    "exercised on every row and the whole operator stays "
    "DuckDB-differential.  Scale shape: a pure narrow map (regex + "
    "array expressions at scan speed, no Python) into ONE hash "
    "aggregate — the canonical-URL groupBy is the only shuffle, "
    "exactly the shape content-defined dedup consumes downstream.",
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://Docs.Example.COM:443/"),
        F.col("source"),
        F.lit("/Article-"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit("?utm_source=feed&id="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&Ref=xyz#sec-"),
        F.col("doc_id").cast("string"),
    )
    u = F.regexp_replace(url, "#.*$", "")
    u = F.concat(
        F.lower(F.regexp_extract(u, "^([a-zA-Z]+://[^/]+)", 1)),
        F.regexp_extract(u, "^[a-zA-Z]+://[^/]+(.*)$", 1),
    )
    u = F.regexp_replace(u, ":443/", "/")  # literal (no regex chars)
    path = F.regexp_extract(u, "^([^?]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(u, r"\?(.*)$", 1), "&"),
            lambda p: ~(
                F.startswith(F.lower(p), F.lit("utm_"))
                | F.startswith(F.lower(p), F.lit("ref="))
            ),
        )
    )
    canonical = F.concat(
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )
    return (
        docs.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("survivor_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Character-class (charset QA) report
# ---------------------------------------------------------------------------


@query(
    "charset_class_report",
    oracle=r"""
    WITH cls AS (
      SELECT source,
             length(text) AS n_total,
             length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))
               AS n_alpha,
             length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
               AS n_upper,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS n_digit,
             length(text) - length(regexp_replace(text, '\s', '', 'g'))
               AS n_space
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_total) AS BIGINT) AS n_chars,
           CAST(SUM(n_alpha) AS BIGINT) AS n_alpha,
           CAST(SUM(n_upper) AS BIGINT) AS n_upper,
           CAST(SUM(n_digit) AS BIGINT) AS n_digit,
           CAST(SUM(n_space) AS BIGINT) AS n_space,
           CAST(SUM(n_total - n_alpha - n_digit - n_space) AS BIGINT)
             AS n_other,
           ROUND(CAST(SUM(n_alpha) AS DOUBLE) / SUM(n_total), 6)
             AS alpha_ratio,
           ROUND(CAST(SUM(n_total - n_alpha - n_digit - n_space)
                      AS DOUBLE) / SUM(n_total), 6) AS other_ratio
    FROM cls GROUP BY source
    """,
    description="Character-class composition per source — the charset "
    "QA report a crawl pipeline runs before language ID: letters, "
    "digits, whitespace, uppercase, and 'other' (punctuation, "
    "symbols, mojibake debris) shares of every source's bytes.  A "
    "source whose other_ratio spikes is shipping binary junk or "
    "markup; one whose upper share spikes is shouting boilerplate.  "
    "Each class count is length(x) - length(regexp_replace(x, "
    "class, '')) — a scan-speed Catalyst expression with the same "
    "RE2/Java-portable character classes on both engines, summed as "
    "exact integers in ONE partial-aggregated pass (map-side combine "
    "makes the shuffle |sources| rows); ratios are single divisions "
    "rounded identically.",
)
def charset_class_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")

    def n_class(pattern: str):
        return F.length("text") - F.length(
            F.regexp_replace(F.col("text"), pattern, "")
        )

    cls = docs.select(
        "source",
        F.length("text").alias("n_total"),
        n_class("[a-zA-Z]").alias("n_alpha"),
        n_class("[A-Z]").alias("n_upper"),
        n_class("[0-9]").alias("n_digit"),
        n_class(r"\s").alias("n_space"),
    )
    other = (
        F.sum("n_total") - F.sum("n_alpha") - F.sum("n_digit")
        - F.sum("n_space")
    )
    return cls.groupBy("source").agg(
        F.sum("n_total").cast("long").alias("n_chars"),
        F.sum("n_alpha").cast("long").alias("n_alpha"),
        F.sum("n_upper").cast("long").alias("n_upper"),
        F.sum("n_digit").cast("long").alias("n_digit"),
        F.sum("n_space").cast("long").alias("n_space"),
        other.cast("long").alias("n_other"),
        F.round(
            F.sum("n_alpha").cast("double") / F.sum("n_total"), 6
        ).alias("alpha_ratio"),
        F.round(other.cast("double") / F.sum("n_total"), 6).alias(
            "other_ratio"
        ),
    )
