"""Corpus-hygiene operators for training-data pipelines (north-star
extension; SURVEY.md §2.B "text analysis" / dedup family).

Three operators a 100 TB pretraining-data pipeline runs before a
corpus is usable, beyond per-pair dedup (operators/dedup.py):

- **repetition_stats** — Gopher-style within-document repetition
  signals (top-token fraction, duplicate-bigram fraction).  Pure
  Catalyst expressions: a narrow map over the scan, no shuffle, so it
  composes with any downstream filter at full scan bandwidth.
- **contamination_ngram** — benchmark contamination check: flag
  training documents that share a word n-gram with a held-out
  evaluation set.  The eval shingle set is small by construction, so
  the join is a broadcast; at 100 TB the same plan with the broadcast
  hint dropped becomes a shuffle semi-join and nothing else changes.
- **boilerplate_shingles** — corpus-level boilerplate mining: n-grams
  that recur across many distinct documents (headers, disclaimers).
  One explode + one hash aggregation; candidates for removal feed a
  C4-style line/passage scrubber.
- **dedup_cross_snapshot** — incremental ingestion: drop incoming
  documents whose content hash already exists in the accumulated
  corpus snapshot.  A hash-only anti-join: the full text never
  shuffles, just 64-hex-char digests.
- **passage_scrub** — C4-style passage-level dedup: fixed-width
  token chunks deduplicated globally (first occurrence by
  (doc_id, chunk_idx) survives), reported as a per-document scrub
  fraction.  The shuffle key is md5(chunk) — fixed 32 bytes per
  passage regardless of passage length.
- **corpus_token_histogram** — log2-bucketed document-length
  distribution with each bucket's share of total corpus tokens; the
  standard "what does this corpus look like" report before a
  training run.

The reference has no corpus layer (its documents are CNAE code rows);
these operators exist for the north-star LLM-pipeline surface
(BASELINE.json) and are graded as first-class components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from dados_publicos_etl_spark.functions.text import (
    WS,
    duck_md5_long_sql,
    duck_shingles_sql,
    md5_hashed_shingles,
    shingles_from_tokens,
    tokens,
)
from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans.registry import query

_DUCK_TOKS = f"string_split_regex(lower(text), '{WS}')"


@query(
    "repetition_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), b AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 2 THEN
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i + 1])
             ELSE [] END AS bigrams
      FROM t
    )
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           ROUND(CAST(list_max(list_transform(list_distinct(toks),
                        d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
                 / len(toks), 4) AS top_token_frac,
           CASE WHEN len(bigrams) >= 1 THEN
             ROUND(1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                   / len(bigrams), 4)
           ELSE 0.0 END AS dup_bigram_frac
    FROM b
    """,
    description="Gopher-style repetition signals per document: "
    "top-token fraction and duplicate-bigram fraction, all "
    "higher-order array expressions (no shuffle, no Python).",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics.

    Both metrics are per-row array expressions, so the operator is a
    narrow map (scan-speed at any scale).  The top-token count is
    O(tokens x distinct) per document — fine for web-scale documents
    (<~100k tokens); for pathological inputs switch to the
    explode + groupBy(doc_id, token) form, which trades a shuffle for
    linear work.
    """
    docs = read_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens("text").alias("toks"))
    toks = F.col("toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda x: x == d)),
        )
    )
    return base.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(top_cnt.cast("double") / F.size(toks), 4).alias(
            "top_token_frac"
        ),
        F.when(
            F.size(bigrams) >= 1,
            F.round(
                1.0
                - F.size(F.array_distinct(bigrams)).cast("double")
                / F.size(bigrams),
                4,
            ),
        )
        .otherwise(0.0)
        .alias("dup_bigram_frac"),
    )


_N_CONTAM = 4  # shingle width for the contamination check

_DUCK_SH4 = duck_shingles_sql("text", n=_N_CONTAM)


@query(
    "contamination_ngram",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source, {_DUCK_SH4} AS sh FROM documents
    ), bench AS (
      SELECT DISTINCT unnest(sh) AS s FROM sh WHERE source = 'src0'
    ), train AS (
      SELECT doc_id, unnest(sh) AS s FROM sh WHERE source <> 'src0'
    ), hits AS (
      SELECT t.doc_id, COUNT(*) AS n_shared
      FROM train t JOIN bench b ON t.s = b.s
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared_shingles,
           COALESCE(h.n_shared, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    description="Benchmark-contamination check: training docs sharing "
    "a 4-gram with the held-out set (source='src0').  Eval shingles "
    "broadcast; at 100 TB drop the hint for a shuffle semi-join.",
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training documents that overlap the benchmark set.

    The benchmark shingle table is DISTINCT n-grams of the eval split
    — bounded by eval-set size, not corpus size — so broadcasting it
    keeps the check a map-side join over the full corpus scan.
    """
    docs = read_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        "source",
        tokens("text").alias("toks"),
    ).select(
        "doc_id",
        "source",
        shingles_from_tokens(F.col("toks"), n=_N_CONTAM).alias("sh"),
    )
    bench = (
        sh.filter(F.col("source") == "src0")
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    train = sh.filter(F.col("source") != "src0")
    hits = (
        train.select("doc_id", F.explode("sh").alias("s"))
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias(
                "n_shared_shingles"
            ),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )


_MIN_DOC_FREQ = 5
_TOP_BOILER = 50


@query(
    "boilerplate_shingles",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {duck_shingles_sql("text")} AS sh FROM documents
    ), exploded AS (
      SELECT doc_id, unnest(sh) AS s FROM sh
    )
    SELECT s AS shingle, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM exploded
    GROUP BY s
    HAVING COUNT(*) >= {_MIN_DOC_FREQ}
    ORDER BY doc_freq DESC, shingle
    LIMIT {_TOP_BOILER}
    """,
    description="Boilerplate mining: 3-grams recurring in >= "
    f"{_MIN_DOC_FREQ} documents, top {_TOP_BOILER} by document "
    "frequency (shingles are distinct per doc, so COUNT(*) is doc "
    "frequency). One explode + one hash agg + TakeOrdered.",
)
def boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    exploded = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", F.explode(shingles_from_tokens(F.col("toks"))).alias("s")
    )
    return (
        exploded.groupBy(F.col("s").alias("shingle"))
        .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
        .filter(F.col("doc_freq") >= _MIN_DOC_FREQ)
        .orderBy(F.desc("doc_freq"), "shingle")
        .limit(_TOP_BOILER)
    )


_NORM_DUCK = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


@query(
    "dedup_cross_snapshot",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, sha256({_NORM_DUCK}) AS content_hash
      FROM documents
    )
    SELECT i.doc_id, i.content_hash
    FROM n i
    WHERE i.doc_id % 5 = 0
      AND NOT EXISTS (
        SELECT 1 FROM n e
        WHERE e.doc_id % 5 <> 0 AND e.content_hash = i.content_hash
      )
    """,
    description="Incremental-ingestion dedup: anti-join the incoming "
    "batch (doc_id%5=0) against the existing snapshot's content "
    "hashes; only 64-char digests shuffle, never document text.",
)
def dedup_cross_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop incoming docs whose content already exists in the corpus.

    The nightly-ingest pattern at 100 TB: the accumulated snapshot's
    hash set is orders of magnitude larger than the increment, so the
    anti-join must shuffle hashes, not text.  Both sides project to
    (hash) / (doc_id, hash) before the join; with the snapshot's hash
    table stored bucketed by content_hash the exchange on the snapshot
    side disappears entirely and only the increment shuffles.
    """
    from dados_publicos_etl_spark.functions.text import normalized

    docs = read_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", F.sha2(normalized("text"), 256).alias("content_hash")
    )
    existing = (
        hashed.filter(F.col("doc_id") % 5 != 0)
        .select("content_hash")
        .distinct()
    )
    incoming = hashed.filter(F.col("doc_id") % 5 == 0)
    return incoming.join(existing, "content_hash", "left_anti").select(
        "doc_id", "content_hash"
    )


_PASSAGE = 8  # tokens per non-overlapping passage chunk

_DUCK_TOKS_EXPR = f"string_split_regex(lower(text), '{WS}')"


@query(
    "passage_scrub",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS_EXPR} AS toks FROM documents
    ), l AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, CAST(ceil(len(toks) / {_PASSAGE}.0) AS BIGINT)),
               i -> md5(array_to_string(
                      list_slice(toks, (i - 1) * {_PASSAGE} + 1,
                                 i * {_PASSAGE}), ' '))) AS chunks
      FROM t
    ), c AS (
      SELECT doc_id,
             unnest(chunks) AS h,
             unnest(generate_series(1, len(chunks))) AS chunk_idx
      FROM l
    ), r AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY h
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM c
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           ROUND(1.0 - CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                            AS DOUBLE) / COUNT(*), 4) AS scrub_frac
    FROM r
    GROUP BY doc_id
    """,
    description=f"C4-style passage dedup: non-overlapping {_PASSAGE}-token "
    "chunks deduplicated corpus-wide (first (doc_id, chunk_idx) "
    "occurrence survives); per-doc scrub fraction.  Shuffle key is "
    "md5(chunk): 32 bytes per passage.",
)
def passage_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global passage-level dedup with per-document survival stats.

    One explode + one window shuffle on the chunk digest + one
    hash-agg back to doc granularity.  Partitioning by the digest
    (not the chunk text) keeps shuffle volume proportional to passage
    COUNT, not passage BYTES — at 100 TB that is the difference
    between shuffling 3 TB and shuffling 100 TB.  Skewed passages
    (empty/boilerplate chunks) concentrate on one digest; AQE's skew
    handling or a pre-filter on mined boilerplate (see
    ``boilerplate_shingles``) bounds the hot partition.
    """
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    toks = F.col("toks")
    chunks = docs.select(
        "doc_id", tokens("text").alias("toks")
    ).select(
        "doc_id",
        F.transform(
            F.sequence(
                F.lit(1),
                F.ceil(F.size(toks) / float(_PASSAGE)).cast("long"),
            ),
            lambda i: F.md5(
                F.concat_ws(
                    " ", F.slice(toks, (i - 1) * _PASSAGE + 1, _PASSAGE)
                )
            ),
        ).alias("chunks"),
    )
    exploded = chunks.select(
        "doc_id", F.posexplode("chunks").alias("chunk_idx", "h")
    )
    win = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    flagged = exploded.select(
        "doc_id",
        (F.row_number().over(win) == 1).cast("int").alias("kept"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("kept").cast("long").alias("n_kept"),
        F.round(
            1.0 - F.sum("kept").cast("double") / F.count(F.lit(1)), 4
        ).alias("scrub_frac"),
    )


@query(
    "corpus_token_histogram",
    oracle=f"""
    WITH n AS (
      SELECT len({_DUCK_TOKS_EXPR}) AS nt FROM documents
    ), b AS (
      SELECT CAST(floor(log2(greatest(nt, 1))) AS INT) AS bucket,
             COUNT(*) AS n_docs, SUM(nt) AS total_tokens
      FROM n GROUP BY 1
    )
    SELECT bucket,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           ROUND(CAST(total_tokens AS DOUBLE)
                 / SUM(CAST(total_tokens AS DOUBLE)) OVER (), 4)
             AS token_share
    FROM b
    """,
    description="Corpus-length report: log2 buckets of per-doc token "
    "counts with each bucket's share of total corpus tokens.  One "
    "narrow map + one low-cardinality hash agg; the share window "
    "runs on the already-tiny aggregate.",
)
def corpus_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution in power-of-two buckets.

    The per-doc token count is a narrow map fused into the scan; the
    groupBy key has ~log2(max_doc_len) distinct values so the partial
    aggregation collapses each partition to a handful of rows before
    the (trivial) exchange.  The global-share window runs over the
    aggregated frame — dozens of rows — so the unpartitioned window
    is not a scale hazard.
    """
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    nt = F.size(tokens("text")).alias("nt")
    b = (
        docs.select(nt)
        .groupBy(
            F.floor(F.log2(F.greatest(F.col("nt"), F.lit(1))))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("total_tokens"),
        )
    )
    share = F.sum(F.col("total_tokens").cast("double")).over(
        Window.partitionBy()
    )
    return b.select(
        "bucket",
        "n_docs",
        "total_tokens",
        F.round(F.col("total_tokens").cast("double") / share, 4).alias(
            "token_share"
        ),
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (composition showcase)
# ---------------------------------------------------------------------------

_PIPE_MIN_WORDS, _PIPE_MAX_WORDS = 5, 2000
_PIPE_DUCK_BUCKET = (
    "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 100)"
)


@query(
    "corpus_pipeline_e2e",
    oracle=f"""
    WITH canon AS (
      SELECT doc_id, source,
             trim(regexp_replace(lower(text), '{WS}', ' ', 'g')) AS norm
      FROM documents
    ), digests AS (
      SELECT doc_id, source, md5(norm) AS digest,
             CAST(len(regexp_extract_all(norm, '[A-Za-z0-9]+')) AS BIGINT)
               AS n_words
      FROM canon
    ), survivors AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id)
               AS rn
        FROM digests
      ) WHERE rn = 1
    ), kept AS (
      SELECT * FROM survivors
      WHERE n_words BETWEEN {_PIPE_MIN_WORDS} AND {_PIPE_MAX_WORDS}
    ), assigned AS (
      SELECT source, n_words,
             CASE WHEN {_PIPE_DUCK_BUCKET} < 80 THEN 'train'
                  WHEN {_PIPE_DUCK_BUCKET} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM kept
    )
    SELECT split, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM assigned GROUP BY split, source
    """,
    description="Whole-pipeline composition: normalize -> exact dedup "
    "(min-id survivor per md5 digest) -> length-gate quality filter -> "
    "frozen hash split -> per-(split, source) corpus report, as ONE "
    "lazy plan.  Every stage is a narrow map except the dedup window "
    "(one shuffle on digest) and the final aggregate — the engine's "
    "curation stages compose without materialization barriers.",
)
def corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline as one composed DataFrame plan.

    Mirrors what a production corpus build chains together
    (clean -> dedup -> filter -> split -> report), demonstrating that
    the engine's operators compose lazily: Catalyst fuses the
    normalize/fingerprint/word-count maps into the scan stage, the
    dedup window is the only data-wide shuffle, and the quality gate
    prunes before the aggregate.  All stages reuse the exact
    expression kernels their standalone queries use, so the DuckDB
    oracle is assembled from the same proven SQL equivalences.
    """
    from pyspark.sql import Window as W

    from dados_publicos_etl_spark.functions.text import WORD, normalized
    from dados_publicos_etl_spark.operators.sampling import hash_bucket

    docs = read_table(spark, sf_dir, "documents")
    digests = docs.select(
        "doc_id",
        "source",
        F.md5(normalized("text")).alias("digest"),
        F.regexp_count(normalized("text"), F.lit(WORD))
        .cast("long")
        .alias("n_words"),
    )
    w = W.partitionBy("digest").orderBy("doc_id")
    survivors = (
        digests.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(
            F.col("n_words").between(_PIPE_MIN_WORDS, _PIPE_MAX_WORDS)
        )
    )
    b = hash_bucket("doc_id", 100)
    assigned = survivors.select(
        "source",
        "n_words",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
        .alias("split"),
    )
    return assigned.groupBy("split", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
    )


# ---------------------------------------------------------------------------
# Cross-document duplicate span mining (Lee et al.-style span dedup signal)
# ---------------------------------------------------------------------------

_SPAN_N = 10  # tokens per span — the memorization-relevant unit


def _span_hashes(toks: F.Column) -> F.Column:
    """md5 of every POSITIONAL ``_SPAN_N``-token window (not distinct,
    not clamped): span occurrences are counted per position, the unit
    "Deduplicating Training Data Makes Language Models Better"
    (Lee et al., 2022) deduplicates on.  Only the 32-hex digest ever
    leaves the row — the shuffle key is fixed-width no matter how
    long the span text is."""

    def span_at(i):
        pieces = []
        for j in range(_SPAN_N):
            if j:
                pieces.append(F.lit(" "))
            pieces.append(F.element_at(toks, i + j))
        return F.md5(F.concat(*pieces))

    return F.when(
        F.size(toks) >= _SPAN_N,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (_SPAN_N - 1)), span_at
        ),
    ).otherwise(F.array().cast("array<string>"))


@query(
    "duplicate_ngram_spans",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), w AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(toks, i, i + {_SPAN_N - 1}), ' '))
               AS span_hash
      FROM t, UNNEST(generate_series(1, len(toks) - {_SPAN_N - 1})) AS u(i)
      WHERE len(toks) >= {_SPAN_N}
    )
    SELECT span_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS first_doc
    FROM w
    GROUP BY span_hash
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    description=f"Cross-document duplicate span mining: every "
    f"positional {_SPAN_N}-token window that occurs in >= 2 distinct "
    "documents, with document and occurrence counts — the span-level "
    "dedup signal of Lee et al. 2022 (whose removal measurably "
    "improves LMs).  Differs from boilerplate_shingles (3-gram "
    "doc-frequency, distinct per doc): spans are long, positional, "
    "and counted per occurrence.  One narrow map emits fixed-width "
    "digests, one explode, one hash aggregation.",
)
def duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span inventory a scrubber would cut from the training corpus.

    Scale: the exploded stream is ~n_tokens rows/doc but carries ONLY
    (doc_id, 32-hex digest); the aggregation is map-side-combinable
    (partial counts per digest).  Pathological boilerplate spans
    (one digest in millions of docs) are exactly what
    ``operators/skew.py``'s salted aggregation handles — compose it
    when a corpus profile shows such heads.  The span TEXT is never
    shuffled; recovering it for reporting is a broadcast join of the
    (tiny) flagged-digest set back onto one corpus scan.
    """
    docs = read_table(spark, sf_dir, "documents")
    spans = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", F.explode(_span_hashes(F.col("toks"))).alias("span_hash")
    )
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "exact_substring_scrub",
    oracle=rf"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), w AS MATERIALIZED (
      SELECT doc_id, i,
             md5(array_to_string(list_slice(toks, i, i + {_SPAN_N - 1}), ' '))
               AS span_hash
      FROM t, UNNEST(generate_series(1, len(toks) - {_SPAN_N - 1})) AS u(i)
      WHERE len(toks) >= {_SPAN_N}
    ), dup AS (
      SELECT span_hash FROM w
      GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
    ), flag AS (
      SELECT w.doc_id, list(w.i) AS ps
      FROM w JOIN dup USING (span_hash)
      GROUP BY w.doc_id
    ), scrub AS (
      SELECT t.doc_id, t.toks,
             list_filter(range(1, len(t.toks) + 1), j ->
               len(list_filter(COALESCE(f.ps, CAST([] AS BIGINT[])),
                               p -> j >= p AND j <= p + {_SPAN_N - 1})) = 0)
               AS kept
      FROM t LEFT JOIN flag f ON f.doc_id = t.doc_id
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - len(kept) AS BIGINT) AS n_removed_tokens,
           -- array_to_string([]) is NULL in DuckDB, '' in Spark's
           -- array_join: coalesce the fully-scrubbed-doc case
           COALESCE(array_to_string(list_transform(kept, j -> toks[j]), ' '),
                    '') AS scrubbed_text
    FROM scrub
    """,
    description=f"ExactSubstr REMOVAL — the missing half of Lee et "
    f"al. 2022 span dedup: every positional {_SPAN_N}-token window "
    "occurring in >= 2 distinct documents is excised from ALL its "
    "occurrences, overlapping spans merged per doc in-row, and the "
    "document text reconstructed from the surviving tokens — the "
    "scrub step training pipelines actually run after "
    "duplicate_ngram_spans mines the signal.  Scale shape: span "
    "mining shuffles only (doc_id, position, 32-hex digest) rows; "
    "the duplicated-digest decision is a window over the "
    "(span_hash, doc_id) aggregate (subtree planned once, no "
    "self-join); the per-doc cut-position list is the ONLY thing "
    "joined back onto a second corpus scan, and the span merge + "
    "token excision + text rebuild are in-row HOFs on that scan.",
)
def exact_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rewrite the corpus with duplicated >= ``_SPAN_N``-token runs
    excised (the ExactSubstr deduplication step of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" —
    sibling of ``passage_scrub``'s C4-style passage granularity).

    Plan shape (the house narrow-pass discipline):

    1. span mining emits fixed-width digests per position — text dies
       at the tokenize projection, only (doc_id, i, digest) shuffles;
    2. "span duplicated?" is ``count() over (partition by span_hash)``
       on the (span_hash, doc_id)-grouped table, so the mining subtree
       is planned ONCE (no digest self-join, cf. round-9 verdict on
       the chunks-vs-shared shape);
    3. the per-doc flagged-position array — skinny, only docs that
       contain duplicated spans — left-joins back onto a second
       corpus scan (AQE broadcasts it at bench scale; at 100 TB this
       is the one doc_id shuffle the rewrite inherently needs, and
       its text volume equals the rewrite's output, which must move
       anyway);
    4. overlap merge + excision + rebuild are in-row HOFs: a token
       index j survives iff no flagged span start p covers it
       (p <= j <= p + N - 1) — merging overlapping spans implicitly,
       no interval algebra materialized.
    """
    from pyspark.sql import Window as W

    docs = read_table(spark, sf_dir, "documents")
    spans = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id",
        F.posexplode(_span_hashes(F.col("toks"))).alias("pos0", "span_hash"),
    ).select("doc_id", (F.col("pos0") + 1).alias("i"), "span_hash")
    nd = F.count(F.lit(1)).over(W.partitionBy("span_hash"))
    flagged = (
        spans.groupBy("span_hash", "doc_id")
        .agg(F.collect_list("i").alias("pl"))
        .withColumn("nd", nd)
        .filter(F.col("nd") >= 2)
        .select("doc_id", F.explode("pl").alias("i"))
        .groupBy("doc_id")
        .agg(F.collect_list("i").alias("ps"))
    )
    joined = docs.select("doc_id", tokens("text").alias("toks")).join(
        flagged, "doc_id", "left"
    )
    ps = F.coalesce(F.col("ps"), F.array().cast("array<int>"))
    kept = F.filter(
        F.sequence(F.lit(1), F.size("toks")),
        lambda j: F.size(
            F.filter(ps, lambda p: (j >= p) & (j <= p + (_SPAN_N - 1)))
        )
        == 0,
    )
    return joined.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed_tokens"),
        F.array_join(
            F.transform(kept, lambda j: F.element_at("toks", j)), " "
        ).alias("scrubbed_text"),
    )


_LINE_N = 8  # tokens per pseudo-line (the corpus has no newline
# structure — synthetic word-soup docs — so the "line" unit is a
# fixed-width non-overlapping segment, same role as RefinedWeb's
# newline-delimited lines on web text)


def _line_hashes(toks: F.Column) -> F.Column:
    """md5 of every non-overlapping ``_LINE_N``-token segment (the
    last one clipped), 1-indexed by segment.  Only the 32-hex digest
    leaves the row."""
    n_lines = (F.size(toks) + (_LINE_N - 1)).cast("long") / F.lit(_LINE_N)
    n_lines = F.floor(n_lines).cast("int")
    # guard: for NULL-text docs size() yields null/-1, and Spark's
    # sequence(1, 0) is DESCENDING [1, 0] — not the oracle's empty
    # range(1, 1) (r11 ADVICE); empty-token docs must hash to [].
    seq = F.when(
        n_lines >= 1, F.sequence(F.lit(1), n_lines)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        seq,
        lambda i: F.md5(
            F.array_join(
                F.slice(toks, (i - 1) * _LINE_N + 1, _LINE_N), " "
            )
        ),
    )


@query(
    "repeated_line_scrub",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents
    ), l AS MATERIALIZED (
      SELECT doc_id, source, u.i AS idx,
             md5(array_to_string(
               list_slice(toks, (u.i - 1) * {_LINE_N} + 1,
                          u.i * {_LINE_N}), ' ')) AS lh
      FROM t, UNNEST(generate_series(
        1, (len(toks) + {_LINE_N - 1}) // {_LINE_N})) AS u(i)
    ), dup AS (
      SELECT source, lh FROM l
      GROUP BY source, lh HAVING COUNT(DISTINCT doc_id) >= 2
    ), rm AS (
      SELECT l.doc_id, list(l.idx) AS rms
      FROM l JOIN dup ON dup.source = l.source AND dup.lh = l.lh
      GROUP BY l.doc_id
    )
    SELECT t.doc_id,
           CAST((len(t.toks) + {_LINE_N - 1}) // {_LINE_N} AS BIGINT)
             AS n_lines,
           CAST(COALESCE(len(r.rms), 0) AS BIGINT) AS n_removed_lines,
           COALESCE(array_to_string(list_transform(
             list_filter(
               range(1, (len(t.toks) + {_LINE_N - 1}) // {_LINE_N} + 1),
               i -> NOT list_contains(
                 COALESCE(r.rms, CAST([] AS BIGINT[])), i)),
             i -> array_to_string(
               list_slice(t.toks, (i - 1) * {_LINE_N} + 1,
                          i * {_LINE_N}), ' ')), ' '), '')
             AS scrubbed_text
    FROM t LEFT JOIN rm r ON r.doc_id = t.doc_id
    """,
    description=f"RefinedWeb-style repeated-line removal, WITHIN "
    f"domain: every non-overlapping {_LINE_N}-token pseudo-line that "
    "occurs in >= 2 distinct documents of the SAME source is removed "
    "from ALL of them (navigation/footer boilerplate repeats inside "
    "a site, not across the web — the within-domain key is what "
    "distinguishes this from passage_scrub's global first-survives "
    "dedup), and the text is rebuilt from the surviving lines.  "
    "Scale shape: line mining shuffles only (doc_id, source, idx, "
    "32-hex digest); the repeated decision is a window over the "
    "(source, lh, doc_id) aggregate (mining subtree planned once); "
    "only the per-doc removed-index arrays join back onto a second "
    "corpus scan, where excision + rebuild are in-row HOFs.",
)
def repeated_line_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-domain repeated-line scrub (Penedo et al. 2023,
    RefinedWeb: line-level dedup removes repeated lines from every
    document, complementing document-level dedup).  Architecture
    mirrors ``exact_substring_scrub``: digests-only mining pass, a
    window (not a self-join) for the repeated decision, skinny cut
    lists joined back onto a second scan, in-row rebuild."""
    from pyspark.sql import Window as W

    docs = read_table(spark, sf_dir, "documents")
    segs = (
        docs.select("doc_id", "source", tokens("text").alias("toks"))
        .select(
            "doc_id",
            "source",
            F.posexplode(_line_hashes(F.col("toks"))).alias("i0", "lh"),
        )
        .select("doc_id", "source", (F.col("i0") + 1).alias("idx"), "lh")
    )
    nd = F.count(F.lit(1)).over(W.partitionBy("source", "lh"))
    rm = (
        segs.groupBy("source", "lh", "doc_id")
        .agg(F.collect_list("idx").alias("pl"))
        .withColumn("nd", nd)
        .filter(F.col("nd") >= 2)
        .select("doc_id", F.explode("pl").alias("idx"))
        .groupBy("doc_id")
        .agg(F.collect_list("idx").alias("rms"))
    )
    joined = docs.select("doc_id", tokens("text").alias("toks")).join(
        rm, "doc_id", "left"
    )
    n_lines = (F.size("toks") + (_LINE_N - 1)).cast("long") / F.lit(
        _LINE_N
    )
    n_lines = F.floor(n_lines).cast("int")
    rms = F.coalesce(F.col("rms"), F.array().cast("array<int>"))
    # same sequence(1, 0) == [1, 0] guard as _line_hashes: null/empty
    # token docs keep ZERO lines, matching the oracle's range(1, 1).
    kept = F.filter(
        F.when(
            n_lines >= 1, F.sequence(F.lit(1), n_lines)
        ).otherwise(F.array().cast("array<int>")),
        lambda i: ~F.array_contains(rms, i),
    )
    return joined.select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        F.size(rms).cast("long").alias("n_removed_lines"),
        F.array_join(
            F.transform(
                kept,
                lambda i: F.array_join(
                    F.slice("toks", (i - 1) * _LINE_N + 1, _LINE_N), " "
                ),
            ),
            " ",
        ).alias("scrubbed_text"),
    )


@query(
    "dup_span_length_report",
    oracle=rf"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), w AS MATERIALIZED (
      SELECT doc_id, i,
             md5(array_to_string(list_slice(toks, i, i + {_SPAN_N - 1}), ' '))
               AS span_hash
      FROM t, UNNEST(generate_series(1, len(toks) - {_SPAN_N - 1})) AS u(i)
      WHERE len(toks) >= {_SPAN_N}
    ), dup AS (
      SELECT span_hash FROM w
      GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
    ), flagged AS (
      SELECT w.doc_id, w.i FROM w JOIN dup USING (span_hash)
    ), isl AS (
      SELECT doc_id, i,
             CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                       > {_SPAN_N} OR
                  LAG(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM flagged
    ), grp AS (
      SELECT doc_id, i,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM isl
    ), spans AS (
      SELECT doc_id, island,
             MAX(i) + {_SPAN_N - 1} - MIN(i) + 1 AS span_len
      FROM grp GROUP BY doc_id, island
    ), per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(MAX(span_len) AS BIGINT) AS longest_span_tokens,
             CAST(SUM(span_len) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT p.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
           p.n_spans, p.longest_span_tokens,
           ROUND(CAST(p.dup_tokens AS DOUBLE) / len(t.toks), 4)
             AS dup_token_share
    FROM per_doc p JOIN t ON t.doc_id = p.doc_id
    ORDER BY p.longest_span_tokens DESC, p.doc_id
    LIMIT 25
    """,
    description=f"Longest-duplicated-substring report (suffix-"
    f"automaton-free): duplicated {_SPAN_N}-token windows (>= 2 "
    "distinct docs, the exact_substring_scrub mining pass) merge "
    "into MAXIMAL runs per document — consecutive flagged starts "
    f"within {_SPAN_N} positions cover one contiguous duplicated "
    "region — and each doc reports its longest merged run in "
    "tokens, run count, and duplicated-token share; top-25 by run "
    "length.  This is the length DISTRIBUTION view the fixed-width "
    "span miners can't give: a 200-token verbatim quote and twenty "
    "scattered 10-token matches look identical to "
    "duplicate_ngram_spans but not here.  Scale shape: mining "
    "shuffles digests only; the merge is gaps-and-islands window "
    "arithmetic over the skinny flagged-position stream; "
    "TakeOrdered top-25.",
)
def dup_span_length_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-run lengths (the report half of Lee et al.
    2022 span mining — merged overlapping/contiguous duplicated
    windows, NOT the true longest-common-substring, which needs a
    suffix automaton; documented as the window-merge view)."""
    from pyspark.sql import Window as W

    from dados_publicos_etl_spark.io import widen_scan

    # widen_scan (r13, guide §2): one md5 per token window — the
    # in-row sweep was a single scan task on the one-row-group file.
    docs = widen_scan(
        read_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks_df = docs.select("doc_id", tokens("text").alias("toks"))
    spans = toks_df.select(
        "doc_id",
        F.posexplode(_span_hashes(F.col("toks"))).alias("pos0", "span_hash"),
    ).select("doc_id", (F.col("pos0") + 1).alias("i"), "span_hash")
    nd = F.count(F.lit(1)).over(W.partitionBy("span_hash"))
    flagged = (
        spans.groupBy("span_hash", "doc_id")
        .agg(F.collect_list("i").alias("pl"))
        .withColumn("nd", nd)
        .filter(F.col("nd") >= 2)
        .select("doc_id", F.explode("pl").alias("i"))
    )
    byi = W.partitionBy("doc_id").orderBy("i")
    brk = F.when(
        F.lag("i").over(byi).isNull()
        | ((F.col("i") - F.lag("i").over(byi)) > _SPAN_N),
        1,
    ).otherwise(0)
    grp = flagged.withColumn("brk", brk).withColumn(
        "island",
        F.sum("brk").over(byi.rowsBetween(W.unboundedPreceding, 0)),
    )
    span_len = F.max("i") + (_SPAN_N - 1) - F.min("i") + 1
    per_doc = (
        grp.groupBy("doc_id", "island")
        .agg(span_len.alias("span_len"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.max("span_len").cast("long").alias("longest_span_tokens"),
            F.sum("span_len").cast("long").alias("dup_tokens"),
        )
    )
    sizes = toks_df.select("doc_id", F.size("toks").alias("nt"))
    return (
        per_doc.join(sizes, "doc_id")
        .select(
            "doc_id",
            F.col("nt").cast("long").alias("n_tokens"),
            "n_spans",
            "longest_span_tokens",
            F.round(
                F.col("dup_tokens").cast("double") / F.col("nt"), 4
            ).alias("dup_token_share"),
        )
        .orderBy(F.desc("longest_span_tokens"), "doc_id")
        .limit(25)
    )


_LRS_CAP = 128  # oracle-parity length cap: both engines consider
# gram lengths 1.._LRS_CAP only.  128 > the corpus's 99-token max
# document, so at the test SFs the answer is EXACT; on a corpus with
# longer verbatim repeats the report saturates at the cap (stated in
# the output semantics, like the top-K caps elsewhere).


def _lrs_gram_hashes(toks: F.Column, L: int) -> F.Column:
    """md5 of every length-``L`` token gram, 1-indexed by start —
    digests only, computed in-row (the map-side cost is O(n*L)
    hashing; nothing but 32-hex digests ever reaches a shuffle)."""
    n = F.size(toks)
    idx = F.when(
        n >= F.lit(L), F.sequence(F.lit(1), n - F.lit(L) + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.md5(F.array_join(F.slice(toks, i, L), " ")),
    )


@query(
    "longest_repeated_ngram_exact",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), g AS MATERIALIZED (
      SELECT t.doc_id, l.L, u.i,
             md5(array_to_string(
               list_slice(t.toks, u.i, u.i + l.L - 1), ' ')) AS h
      FROM t,
           UNNEST(generate_series(1, {_LRS_CAP})) AS l(L),
           UNNEST(generate_series(
             1, greatest(len(t.toks) - l.L + 1, 0))) AS u(i)
    ), dup AS (
      SELECT L, h,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM g GROUP BY L, h HAVING COUNT(*) >= 2
    ), best AS (SELECT MAX(L) AS lrs FROM dup),
    win AS (
      SELECT d.L, d.h, d.n_occurrences, d.n_docs
      FROM dup d JOIN best b ON d.L = b.lrs
    ), occ AS (
      SELECT g.h, g.doc_id, g.i,
             ROW_NUMBER() OVER (
               PARTITION BY g.h ORDER BY g.doc_id, g.i) AS rn
      FROM g JOIN win ON g.L = win.L AND g.h = win.h
    )
    SELECT CAST(w.L AS INT) AS lrs_len,
           array_to_string(
             list_slice(t.toks, o.i, o.i + w.L - 1), ' ') AS gram,
           w.n_occurrences, w.n_docs
    FROM win w
    JOIN occ o ON o.h = w.h AND o.rn = 1
    JOIN t ON t.doc_id = o.doc_id
    ORDER BY w.n_occurrences DESC, gram
    LIMIT 10
    """,
    description=f"TRUE longest repeated token n-gram (length cap "
    f"{_LRS_CAP}): binary search on gram length — a repeated L-gram "
    "implies repeated (L-1)-grams at the same starts, so duplicate-"
    "existence is monotone in L and ceil(log2 cap) = 7 digest-only "
    "probe passes find the exact maximum; the winners at that length "
    "are reported with occurrence/document counts and the gram text "
    "reconstructed from each hash's first occurrence.  This nails "
    "the answer dup_span_length_report's window-merge only "
    "approximates (its merged runs can splice NEAR-adjacent distinct "
    "repeats; this is the longest VERBATIM repeat).  Scale shape: "
    "each probe is one in-row gram-hash pass (O(n*cap) map-side "
    "CPU, no rolling-hash state to shuffle) + one partial-aggregated "
    "digest count; the driver sees 7 O(1)-result existence probes "
    "(the k_core convergence-count discipline), and only the skinny "
    "winner set joins back for text reconstruction.",
)
def longest_repeated_ngram_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact longest repeated n-gram via binary search over digest
    passes (Manber-Myers prefix-doubling reduced to existence
    probes: we only need the MAX repeated length plus its witnesses,
    so rank tables are overkill — each probe is stateless).  The
    per-probe hash pass re-reads the pinned token projection;
    repeated-occurrence means >= 2 occurrences anywhere, overlapping
    or within one document included (standard LRS semantics, mirrored
    in the oracle)."""
    from dados_publicos_etl_spark.io import widen_scan

    # widen_scan BEFORE the pinned token projection (r13, guide §2):
    # every binary-search probe re-hashes the whole corpus from this
    # checkpoint, so its partitioning decides the parallelism of ~7
    # probe jobs — single-task before on the one-row-group file.
    docs = widen_scan(
        read_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks_df = docs.select(
        "doc_id", tokens("text").alias("toks")
    ).localCheckpoint()

    def dup_exists(L: int) -> bool:
        grams = toks_df.select(
            F.explode(_lrs_gram_hashes(F.col("toks"), L)).alias("h")
        )
        return (
            grams.groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= 2)
            .limit(1)
            .count()
            > 0
        )

    lo, hi, best = 1, _LRS_CAP, 0
    while lo <= hi:
        mid = (lo + hi) // 2
        if dup_exists(mid):
            best, lo = mid, mid + 1
        else:
            hi = mid - 1

    empty_schema = (
        "lrs_len int, gram string, n_occurrences long, n_docs long"
    )
    if best == 0:  # no repeat anywhere (both engines return 0 rows)
        return spark.createDataFrame([], empty_schema)

    g2 = toks_df.select(
        "doc_id",
        F.posexplode(_lrs_gram_hashes(F.col("toks"), best)).alias(
            "i0", "h"
        ),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "h")
    winners = (
        g2.groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min(F.struct("doc_id", "i")).alias("fo"),
        )
        .filter(F.col("n_occurrences") >= 2)
    )
    return (
        winners.join(
            toks_df, winners["fo.doc_id"] == toks_df["doc_id"]
        )
        .select(
            F.lit(best).cast("int").alias("lrs_len"),
            F.array_join(
                F.slice("toks", F.col("fo.i"), best), " "
            ).alias("gram"),
            "n_occurrences",
            "n_docs",
        )
        .orderBy(F.desc("n_occurrences"), "gram")
        .limit(10)
    )


@query(
    "basket_association_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey % 50 AS item
      FROM lineitem
    ), n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE)
             AS n_baskets FROM baskets),
    item_counts AS (
      SELECT item, COUNT(*) AS cnt FROM baskets GROUP BY item
    ), pair_counts AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS both_cnt
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.item < b.item
      GROUP BY a.item, b.item
    )
    SELECT item_a, item_b,
           CAST(both_cnt AS BIGINT) AS both_cnt,
           ROUND(both_cnt / n.n_baskets, 6) AS support,
           ROUND(both_cnt / CAST(ia.cnt AS DOUBLE), 6) AS confidence,
           ROUND((both_cnt * n.n_baskets)
                 / (CAST(ia.cnt AS DOUBLE) * ib.cnt), 4) AS lift
    FROM pair_counts
    JOIN item_counts ia ON ia.item = item_a
    JOIN item_counts ib ON ib.item = item_b
    CROSS JOIN n
    WHERE both_cnt >= 20
    ORDER BY lift DESC, item_a, item_b
    LIMIT 25
    """,
    description="Market-basket association rules (frequent-itemset "
    "family): parts co-occurring within an order (hashed to 50 item "
    "classes so pair support is meaningful at test scale), "
    "support/confidence/lift with a min-support cut, top-25 by "
    "lift.  The pair self-join is WITHIN baskets — bounded by "
    "items-per-basket (~7), so pair volume is O(n x basket_size), "
    "never O(n^2); marginals broadcast back.  The co-occurrence "
    "shape behind 'related items' and feature cross-stats.",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the within-basket pair self-join is shared with the graph
    # family (triangle_count / n_hop / clustering_coefficient) via
    # the session-cached pair-count table
    from dados_publicos_etl_spark.plans.mining import co_pair_counts

    li = read_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        "l_orderkey", (F.col("l_partkey") % 50).alias("item")
    ).distinct()
    # n_baskets as a LAZY 1-row broadcast (benford_audit's scalar
    # shape) — no eager driver count(), one job runs everything
    n_tbl = baskets.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_baskets")
    )
    item_counts = baskets.groupBy("item").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    pair_counts = (
        co_pair_counts(spark, sf_dir)
        .select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.col("cnt").alias("both_cnt"),
        )
        .filter(F.col("both_cnt") >= 20)
    )
    ia = item_counts.select(
        F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a")
    )
    ib = item_counts.select(
        F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pair_counts.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "item_a",
            "item_b",
            "both_cnt",
            F.round(F.col("both_cnt") / F.col("n_baskets"), 6).alias(
                "support"
            ),
            F.round(
                F.col("both_cnt") / F.col("cnt_a").cast("double"), 6
            ).alias("confidence"),
            F.round(
                (F.col("both_cnt") * F.col("n_baskets"))
                / (F.col("cnt_a").cast("double") * F.col("cnt_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(25)
    )


@query(
    "corpus_global_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, md5(CAST(doc_id AS STRING) || ':shuffle42') AS k
      FROM documents
    ), positioned AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS pos
      FROM keyed
    )
    SELECT doc_id,
           CAST(floor(pos / 100.0) AS INT) AS shard,
           CAST(pos % 100 AS INT) AS pos_in_shard
    FROM positioned
    """,
    description="Deterministic global corpus shuffle — the shard-prep "
    "step every training run needs: position = rank in seeded-hash "
    "order (md5(id || salt) — reproducible across runs/engines, no "
    "RNG state), docs then map to fixed-size shards.  The global "
    "order is ONE range-partitioned sort of (hash, id) keys — 40ish "
    "bytes a row, not documents — and at 100 TB the sort stays on "
    "the key table with shard files written by partition; "
    "re-shuffling = changing the salt.",
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dados_publicos_etl_spark.operators.ranking import ranked_by_range

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle42"))).alias("k"),
    )
    # the global position rides the range-partitioned ranking — a
    # bare ROW_NUMBER() OVER (ORDER BY k) would funnel the whole
    # corpus key table through one Exchange SinglePartition task
    ranked, _n = ranked_by_range(keyed, ["k", "doc_id"])
    positioned = ranked.select("doc_id", (F.col("rn") - 1).alias("pos"))
    # floor, not a raw double->int cast (Spark truncates, DuckDB
    # rounds — same trap as benford_audit)
    return positioned.select(
        "doc_id",
        F.floor(F.col("pos") / 100.0).cast("int").alias("shard"),
        (F.col("pos") % 100).cast("int").alias("pos_in_shard"),
    )


# ---------------------------------------------------------------------------
# Domain/source-level curation: aggregate stats gate whole sources
# ---------------------------------------------------------------------------


@query(
    "source_quality_curation",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(SUM(CASE WHEN n_chars < 120 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_short
      FROM documents GROUP BY source
    ), verdict AS (
      SELECT source, n_docs, n_short,
             (sum_chars >= 280 * n_docs) AS len_ok,
             (100 * n_short <= 15 * n_docs) AS short_ok
      FROM src
    )
    SELECT d.doc_id, d.source,
           v.n_docs AS source_n_docs,
           v.len_ok, v.short_ok,
           (v.len_ok AND v.short_ok) AS source_kept,
           CASE WHEN v.len_ok AND v.short_ok THEN 'keep'
                WHEN NOT v.len_ok AND NOT v.short_ok
                  THEN 'drop:thin+short'
                WHEN NOT v.len_ok THEN 'drop:thin'
                ELSE 'drop:short' END AS reason
    FROM documents d JOIN verdict v USING (source)
    """,
    description="Domain/source-level corpus curation (the Common-"
    "Crawl-style gate that drops WHOLE sources, not single docs): "
    "pass 1 aggregates per-source evidence (doc count, total chars, "
    "short-doc count) in one hash aggregate whose output is bounded "
    "by |sources| << |docs|; pass 2 broadcast-joins the tiny verdict "
    "table back onto every document to stamp keep/drop + reason.  "
    "Keep rules are INTEGER-crossmultiplied (sum_chars >= 280*n, "
    "100*n_short <= 15*n) so no float ratio enters the decision.  "
    "At 100 TB the verdict table stays a broadcast (domains are "
    "~1e7 even web-scale) and the doc scan stays shuffle-free.",
)
def source_quality_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.when(F.col("n_chars") < 120, 1).otherwise(0)).alias(
            "n_short"
        ),
    )
    verdict = src.select(
        "source",
        "n_docs",
        "n_short",
        (F.col("sum_chars") >= 280 * F.col("n_docs")).alias("len_ok"),
        (100 * F.col("n_short") <= 15 * F.col("n_docs")).alias(
            "short_ok"
        ),
    )
    kept = F.col("len_ok") & F.col("short_ok")
    return docs.join(F.broadcast(verdict), "source").select(
        "doc_id",
        "source",
        F.col("n_docs").alias("source_n_docs"),
        "len_ok",
        "short_ok",
        kept.alias("source_kept"),
        F.when(kept, "keep")
        .when(~F.col("len_ok") & ~F.col("short_ok"), "drop:thin+short")
        .when(~F.col("len_ok"), "drop:thin")
        .otherwise("drop:short")
        .alias("reason"),
    )


# ---------------------------------------------------------------------------
# Cross-source duplicate overlap matrix
# ---------------------------------------------------------------------------


@query(
    "source_dup_overlap",
    oracle=f"""
    WITH fp AS (
      SELECT DISTINCT source,
             md5(trim(regexp_replace(lower(text), '{WS}', ' ', 'g'))) AS fp
      FROM documents
    ), per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fp GROUP BY 1
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared,
           pa.n_fp AS n_fp_a, pb.n_fp AS n_fp_b,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / LEAST(pa.n_fp, pb.n_fp), 6) AS containment
    FROM fp a
    JOIN fp b ON a.fp = b.fp AND a.source < b.source
    JOIN per pa ON pa.source = a.source
    JOIN per pb ON pb.source = b.source
    GROUP BY a.source, b.source, pa.n_fp, pb.n_fp
    """,
    description="Cross-source exact-duplicate overlap matrix: for "
    "every source pair, how many distinct content fingerprints both "
    "carry, plus per-source fingerprint counts and the containment "
    "ratio (shared / smaller side) — the curation report that "
    "decides which overlapping crawls to drop before near-dup "
    "passes run.  Spark-first: one distinct on (source, fp) — the "
    "same fingerprint hash dedup_exact shuffles on — then an "
    "equi-join BLOCKED ON the fingerprint (candidate volume bounded "
    "by per-fingerprint source counts, never |sources|^2 x |docs|), "
    "partial-aggregated pair counts, broadcast per-source totals.",
)
def source_dup_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dados_publicos_etl_spark.functions.text import fingerprint_md5

    docs = read_table(spark, sf_dir, "documents")
    fp = docs.select(
        "source", fingerprint_md5("text").alias("fp")
    ).distinct().localCheckpoint(eager=False)
    # ^ the "write signatures, then join" step: three consumers
    # (per-source totals + both pair sides) share one
    # materialization instead of three corpus fingerprint passes
    # (r10 subtree audit)
    per = fp.groupBy("source").agg(F.count(F.lit(1)).alias("n_fp"))
    a = fp.select(F.col("source").alias("source_a"), "fp")
    b = fp.select(F.col("source").alias("source_b"), F.col("fp").alias("fpb"))
    pa = per.select(
        F.col("source").alias("pa_s"), F.col("n_fp").alias("n_fp_a")
    )
    pb = per.select(
        F.col("source").alias("pb_s"), F.col("n_fp").alias("n_fp_b")
    )
    return (
        a.join(b, (F.col("fp") == F.col("fpb")) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .join(F.broadcast(pa), F.col("source_a") == F.col("pa_s"))
        .join(F.broadcast(pb), F.col("source_b") == F.col("pb_s"))
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            F.round(
                F.col("n_shared").cast("double")
                / F.least("n_fp_a", "n_fp_b"),
                6,
            ).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination (end-to-end composition)
# ---------------------------------------------------------------------------

_CB_WORDS = 8192          # filter words (sized ~10 bits/eval-shingle
_CB_BPW = 63              # at the bench SF; bit 63 clear — ANSI engines
_CB_M = _CB_WORDS * _CB_BPW  # raise on 1<<63 where Spark wraps)
_CB_K = 3


def _cb_pos_sql(key: str, j: int) -> str:
    return (
        f"(CAST(('0x' || substr(md5('cb{j}:' || {key}), 1, 8)) AS BIGINT)"
        f" % {_CB_M})"
    )


@query(
    "decontaminate_bloom_e2e",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source, {_DUCK_SH4} AS sh FROM documents
    ), bench AS (
      SELECT DISTINCT unnest(sh) AS s FROM sh WHERE source = 'src0'
    ), bench_pos AS (
      SELECT {_cb_pos_sql('s', 0)} AS p FROM bench UNION ALL
      SELECT {_cb_pos_sql('s', 1)} FROM bench UNION ALL
      SELECT {_cb_pos_sql('s', 2)} FROM bench
    ), bloom AS (
      SELECT p / {_CB_BPW} AS word,
             bit_or(1::BIGINT << CAST(p % {_CB_BPW} AS INT)) AS bits
      FROM bench_pos GROUP BY 1
    ), train AS (
      SELECT doc_id, unnest(sh) AS s FROM sh WHERE source <> 'src0'
    ), probed AS (
      SELECT t.doc_id, t.s
      FROM train t
      LEFT JOIN bloom b0 ON {_cb_pos_sql('t.s', 0)} / {_CB_BPW} = b0.word
      LEFT JOIN bloom b1 ON {_cb_pos_sql('t.s', 1)} / {_CB_BPW} = b1.word
      LEFT JOIN bloom b2 ON {_cb_pos_sql('t.s', 2)} / {_CB_BPW} = b2.word
      WHERE (COALESCE(b0.bits, 0)
             & (1::BIGINT << CAST({_cb_pos_sql('t.s', 0)} % {_CB_BPW} AS INT))) <> 0
        AND (COALESCE(b1.bits, 0)
             & (1::BIGINT << CAST({_cb_pos_sql('t.s', 1)} % {_CB_BPW} AS INT))) <> 0
        AND (COALESCE(b2.bits, 0)
             & (1::BIGINT << CAST({_cb_pos_sql('t.s', 2)} % {_CB_BPW} AS INT))) <> 0
    ), cand AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom_candidates
      FROM probed GROUP BY doc_id
    ), confirmed AS (
      SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_confirmed
      FROM probed p JOIN bench b ON b.s = p.s
      GROUP BY p.doc_id
    )
    SELECT c.doc_id, c.n_bloom_candidates,
           CAST(COALESCE(f.n_confirmed, 0) AS BIGINT) AS n_confirmed,
           COALESCE(f.n_confirmed, 0) > 0 AS contaminated
    FROM cand c LEFT JOIN confirmed f ON f.doc_id = c.doc_id
    """,
    description="Bloom-prefiltered decontamination END TO END — the "
    "100 TB shape of the benchmark-overlap check: the eval split's "
    f"distinct 4-gram shingles build a {_CB_M}-bit / k={_CB_K} "
    "md5-salted Bloom filter (a fixed ~64 KB word table, broadcast), "
    "the training-side shingle stream dies at the scan unless all "
    "k bits hit, and only the surviving candidates pay the exact "
    "semi-join against the eval shingle set.  Because a Bloom "
    "filter has ZERO false negatives by construction, the confirmed "
    "set provably equals the unfiltered exact check "
    "(contamination_ngram) — the pruning is a pure optimization, "
    "and the differential oracle verifies BOTH the filter's bit "
    "layout (candidate counts, false positives included) and the "
    "final exact verdicts.  Composes bloom_filter_semijoin's "
    "machinery with contamination_ngram's semantics; three "
    "broadcast joins, no new shuffle on the train side.",
)
def decontaminate_bloom_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    # two-step projection: materialize the token array FIRST, or the
    # tokens() subexpression inlines into every slice reference inside
    # shingles_from_tokens and the text re-tokenizes O(len) times per
    # row — the projection-collapse trap (measured 25 s -> <1 s at
    # sf0.1; same fix as winnowing's lead()-based k-grams)
    # the local corpus is ONE parquet file = one input partition; the
    # shingle explode + k salted hashes are the dominant per-row work,
    # so spread the docs across the cluster first (at 100 TB the scan
    # is naturally multi-partition and this repartition disappears)
    par = spark.sparkContext.defaultParallelism
    sh = (
        docs.repartition(par)
        .select("doc_id", "source", tokens("text").alias("toks"))
        .select(
            "doc_id",
            "source",
            shingles_from_tokens(F.col("toks"), n=_N_CONTAM).alias("sh"),
        )
    )
    bench = (
        sh.filter(F.col("source") == "src0")
        .select(F.explode("sh").alias("s"))
        .distinct()
    )

    def pos(col, j: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"cb{j}:"), col)), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _CB_M
        )

    bench_pos = bench.select(
        F.explode(
            F.array(*[pos(F.col("s"), j) for j in range(_CB_K)])
        ).alias("p")
    )
    # build the word table and the exact-verify set ONCE
    # (localCheckpoint: <= _CB_WORDS rows / |eval shing| rows) — three
    # broadcast joins plus the verify would otherwise re-derive the
    # eval-side explode per consumer (measured 22 s -> ~3 s at sf0.1)
    bloom = (
        bench_pos.groupBy(F.expr(f"p div {_CB_BPW}").alias("word"))
        .agg(
            F.expr(
                f"bit_or(shiftleft(1L, CAST(p % {_CB_BPW} AS INT)))"
            ).alias("bits")
        )
        .localCheckpoint()
    )
    bench = bench.localCheckpoint()
    train = sh.filter(F.col("source") != "src0").select(
        "doc_id", F.explode("sh").alias("s")
    )
    # Spark-SQL text of the salted position (mirrors _cb_pos_sql)
    def pos_sql(j: int) -> str:
        return (
            f"(CAST(conv(substring(md5(concat('cb{j}:', s)), 1, 8),"
            f" 16, 10) AS BIGINT) % {_CB_M})"
        )

    probed = train
    for j in range(_CB_K):
        wj = bloom.select(
            F.col("word").alias(f"w{j}"), F.col("bits").alias(f"bits{j}")
        )
        probed = probed.join(
            F.broadcast(wj),
            F.expr(f"{pos_sql(j)} div {_CB_BPW}") == F.col(f"w{j}"),
            "left",
        ).filter(
            F.expr(
                f"(coalesce(bits{j}, 0L) & shiftleft(1L,"
                f" CAST({pos_sql(j)} % {_CB_BPW} AS INT))) != 0"
            )
        ).drop(f"w{j}", f"bits{j}")
    # ONE pass: mark exact membership on the surviving candidates and
    # fold candidate + confirmed counts in the same aggregation
    marked = probed.join(
        F.broadcast(bench.withColumn("hit", F.lit(1))), "s", "left"
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bloom_candidates"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0)))
        .cast("long")
        .alias("n_confirmed"),
        (F.sum(F.coalesce(F.col("hit"), F.lit(0))) > 0).alias(
            "contaminated"
        ),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (hashed n-gram domain log-ratios)
# ---------------------------------------------------------------------------

_DS_B = 4096  # hashed-feature buckets (fixed model size at any corpus scale)


def _ds_bucket_sql(expr: str) -> str:
    """DuckDB fragment: salted md5 bucket of a bigram string."""
    return (
        f"(CAST(('0x' || substr(md5('ds:' || {expr}), 1, 7)) AS BIGINT)"
        f" % {_DS_B})"
    )


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ), feats AS (
      SELECT doc_id, source,
             unnest(list_transform(
               generate_series(1, len(t) - 1),
               i -> {_ds_bucket_sql("t[i] || ' ' || t[i+1]")})) AS b
      FROM toks
    ), tgt AS (
      SELECT b, COUNT(*) AS c FROM feats WHERE source = 'src0' GROUP BY b
    ), raw AS (
      SELECT b, COUNT(*) AS c FROM feats WHERE source <> 'src0' GROUP BY b
    ), tot AS (
      SELECT (SELECT COALESCE(SUM(c), 0) FROM tgt) AS tc,
             (SELECT COALESCE(SUM(c), 0) FROM raw) AS rc
    ), lr AS (
      SELECT COALESCE(t.b, r.b) AS b,
             ln((COALESCE(t.c, 0) + 1.0) / (tot.tc + {_DS_B}.0))
           - ln((COALESCE(r.c, 0) + 1.0) / (tot.rc + {_DS_B}.0)) AS lr
      FROM tgt t FULL JOIN raw r ON t.b = r.b CROSS JOIN tot
    ), docw AS (
      SELECT f.doc_id, COUNT(*) AS nf, SUM(lr.lr) AS w
      FROM feats f JOIN lr ON f.b = lr.b
      GROUP BY f.doc_id
    )
    SELECT doc_id,
           CAST(nf AS BIGINT) AS n_feats,
           ROUND(w, 6) AS weight,
           ROUND(w, 6) > ROUND((SELECT AVG(w) FROM docw), 6) AS above_mean
    FROM docw
    """,
    description="DSIR-style data selection (Xie et al. 2023, 'Data "
    "Selection for Language Models via Importance Resampling'): "
    "score every document by the log-likelihood ratio of a hashed "
    "bigram bag-of-ngrams model fit on a TARGET domain (source = "
    "'src0', the benchmark-like slice) vs the RAW pool (everything "
    f"else).  Features are salted-md5 word-bigram buckets (B = {_DS_B}"
    ", portable across engines), so the two 'models' are fixed "
    f"{_DS_B}-row count tables however large the corpus — the log-"
    "ratio table broadcasts, and scoring is one explode + one "
    "broadcast join + one per-doc sum.  DSIR weights are RELATIVE "
    "(smoothing shifts every absolute ratio), so the reported flag "
    "is weight > corpus mean — the resampling tilt a pretraining "
    "pipeline uses to favor target-like documents without training "
    "a classifier; the mean is one scalar aggregate cross-joined "
    "back (model-scale, never a data collect).  Add-one smoothing "
    "on both numerators keeps every bucket finite; docs with fewer "
    "than two tokens have no features and drop on both engines.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    # materialize the token array before the bigram transform (no CSE
    # inside lambda bodies — same two-step discipline as the shingle
    # operators above)
    toked = docs.select("doc_id", "source", tokens("text").alias("toks"))
    # same ANSI sequence-descent guard as the bigram operators: a
    # 1-token document must yield no features, like the oracle's
    # empty generate_series(1, 0)
    feats = toked.filter(F.size("toks") >= 2).select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("ds:"),
                                    F.element_at(F.col("toks"), i),
                                    F.lit(" "),
                                    F.element_at(F.col("toks"), i + 1),
                                )
                            ),
                            1,
                            7,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % _DS_B
                ),
            )
        ).alias("b"),
    )
    # ONE conditional aggregation builds both domain models (the
    # bucket table is <= _DS_B rows — model-scale, never data-scale);
    # a second corpus pass scores.  Two scans total.
    lr = (
        feats.groupBy("b")
        .agg(
            F.sum(
                F.when(F.col("source") == "src0", 1).otherwise(0)
            ).alias("tc"),
            F.sum(
                F.when(F.col("source") != "src0", 1).otherwise(0)
            ).alias("rc"),
        )
        .observe(
            lr_obs := Observation(),
            F.sum("tc").alias("t"),
            F.sum("rc").alias("r"),
        )
        .localCheckpoint()
    )
    tot = lr_obs.get
    t_tot, r_tot = int(tot["t"] or 0), int(tot["r"] or 0)
    lr = lr.select(
        "b",
        (
            F.log((F.col("tc") + 1.0) / F.lit(float(t_tot + _DS_B)))
            - F.log((F.col("rc") + 1.0) / F.lit(float(r_tot + _DS_B)))
        ).alias("lr"),
    )
    # LAZY checkpoint on the DOC-scale weight table: it feeds both the
    # final projection and the mean_w broadcast build, and without it
    # the corpus-scale bigram explode above re-executes for each —
    # three corpus passes instead of the documented two (r12; the
    # checkpoint is |docs| rows, never data-scale).
    doc_w = (
        feats.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lr").alias("w_raw"),
        )
        .localCheckpoint(eager=False)
    )
    mean_w = doc_w.agg(F.avg("w_raw").alias("mw"))
    return doc_w.crossJoin(F.broadcast(mean_w)).select(
        "doc_id",
        "n_feats",
        F.round("w_raw", 6).alias("weight"),
        # compare ROUNDED values: the raw float sum's accumulation
        # order is engine-dependent, so a doc sitting within an ulp of
        # the mean could flip the boolean between Spark and DuckDB —
        # at 6 dp both engines see the same numbers
        (F.round("w_raw", 6) > F.round("mw", 6)).alias("above_mean"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rule bundle (exact integer rule arithmetic)
# ---------------------------------------------------------------------------


@query(
    "gopher_quality_rules",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(lower(text), '\s+') AS toks,
             length(regexp_replace(text, '\s+', '', 'g')) AS nc
      FROM documents
    ), base AS (
      SELECT doc_id, nc, len(toks) AS nw,
             len(list_intersect(list_distinct(toks),
                                ['the', 'a', 'of', 'and'])) AS nsw
      FROM t
    ), top AS (
      SELECT doc_id, MAX(c) AS topc FROM (
        SELECT doc_id, tok, COUNT(*) AS c FROM (
          SELECT doc_id, unnest(toks) AS tok FROM t
        ) GROUP BY doc_id, tok
      ) GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(b.nw AS BIGINT) AS n_words,
           CAST(b.nc AS BIGINT) AS n_chars_nospace,
           CAST(b.nsw AS BIGINT) AS n_stopwords,
           CAST(top.topc AS BIGINT) AS top_token_count,
           (b.nw BETWEEN 20 AND 90) AS word_count_ok,
           (b.nc * 10 BETWEEN b.nw * 40 AND b.nw * 52) AS mean_word_len_ok,
           (b.nsw >= 2) AS stopword_ok,
           (top.topc * 10 <= b.nw) AS repetition_ok,
           ((b.nw BETWEEN 20 AND 90)
            AND (b.nc * 10 BETWEEN b.nw * 40 AND b.nw * 52)
            AND (b.nsw >= 2)
            AND (top.topc * 10 <= b.nw)) AS gopher_keep
    FROM base b JOIN top ON b.doc_id = top.doc_id
    """,
    description="Gopher-rule quality gate (Rae et al. 2021, public "
    "paper) as a single bundle with one keep flag — the composed "
    "filter a pretraining pipeline actually applies, vs the raw "
    "signals text_stats / repetition_stats report individually.  "
    "Four canonical rules with thresholds calibrated to this "
    "corpus: word count in [20, 90]; mean word length in [4.0, "
    "5.2]; at least 2 distinct stopwords present; top-token "
    "fraction <= 0.1.  EVERY rule evaluates in exact integer "
    "arithmetic (mean word length via nc*10 vs nw*40..52 cross-"
    "multiplication, repetition via topc*10 <= nw), so the "
    "booleans carry zero float-boundary risk in the differential "
    "check and the whole gate is a narrow projection + one "
    "explode-aggregate for the top-token count — no Python, no "
    "shuffle beyond the per-doc token count.",
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        tokens("text").alias("toks"),
        F.length(F.regexp_replace("text", WS, "")).alias("nc"),
    ).select(
        "doc_id",
        "toks",
        "nc",
        F.size("toks").alias("nw"),
        F.size(
            F.array_intersect(
                F.array_distinct("toks"),
                F.array(*[F.lit(w) for w in ("the", "a", "of", "and")]),
            )
        ).alias("nsw"),
    )
    top = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("topc"))
    )
    j = base.drop("toks").join(top, "doc_id")
    word_count_ok = F.col("nw").between(20, 90)
    mwl_ok = (F.col("nc") * 10 >= F.col("nw") * 40) & (
        F.col("nc") * 10 <= F.col("nw") * 52
    )
    stop_ok = F.col("nsw") >= 2
    rep_ok = F.col("topc") * 10 <= F.col("nw")
    return j.select(
        "doc_id",
        F.col("nw").cast("long").alias("n_words"),
        F.col("nc").cast("long").alias("n_chars_nospace"),
        F.col("nsw").cast("long").alias("n_stopwords"),
        F.col("topc").cast("long").alias("top_token_count"),
        word_count_ok.alias("word_count_ok"),
        mwl_ok.alias("mean_word_len_ok"),
        stop_ok.alias("stopword_ok"),
        rep_ok.alias("repetition_ok"),
        (word_count_ok & mwl_ok & stop_ok & rep_ok).alias("gopher_keep"),
    )


# ---------------------------------------------------------------------------
# HTML boilerplate strip + entity decode, proven by round-trip
# ---------------------------------------------------------------------------


@query(
    "html_strip_roundtrip",
    oracle=r"""
    WITH expect AS (
      SELECT doc_id,
             trim(regexp_replace(
               'doc nav-menu ' || text || ' & <b> @'
                 || CAST(doc_id AS VARCHAR),
               '\s+', ' ', 'g')) AS clean
      FROM documents
    )
    SELECT doc_id,
           md5(clean) AS clean_md5,
           CAST(LENGTH(clean) AS BIGINT) AS n_chars_clean
    FROM expect
    """,
    description="HTML text-extraction proven by round-trip (the "
    "mojibake_repair pattern applied to the web-ingest stage): wrap "
    "every document in deterministic HTML IN-ENGINE — head/title, a "
    "nav block, a paragraph carrying the text plus encoded entities "
    "(&amp; &lt;b&gt; &#64;) and the doc_id — then extract with the "
    "tag-strip + entity-decode + whitespace-collapse chain a web "
    "corpus pipeline runs before any quality filter, and md5 "
    "against the oracle's DIRECT construction of the expected clean "
    "string.  Equality proves the extraction chain is exact on "
    "every row: tags out, entity references decoded (including the "
    "numeric form), inter-tag whitespace normalized.  All "
    "regexp_replace/replace Catalyst expressions — a narrow "
    "projection that runs at scan speed, no shuffle, no Python.",
)
def html_strip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    # HTML-ESCAPE the document text before planting (& first, so the
    # escapes themselves never double-decode): the wrap is then
    # well-formed HTML for ARBITRARY text — a corpus string containing
    # '<', '&', or literal entity spellings round-trips to itself
    # instead of silently relying on the synthetic corpus being
    # markup-free
    esc = F.regexp_replace(F.col("text"), "&", "&amp;")
    esc = F.regexp_replace(esc, "<", "&lt;")
    esc = F.regexp_replace(esc, ">", "&gt;")
    planted = F.concat(
        F.lit(
            "<html><head><title>doc</title></head>"
            "<body><nav>nav-menu</nav><p>"
        ),
        esc,
        F.lit(" &amp; &lt;b&gt; &#64;"),
        F.col("doc_id").cast("string"),
        F.lit("</p></body></html>"),
    )
    # extraction chain: tags -> space; numeric entity decode first,
    # named entities after so '&amp;lt;' style double-encoding cannot
    # leak an extra decode; whitespace collapse + trim last
    stripped = F.regexp_replace(planted, "<[^>]*>", " ")
    stripped = F.regexp_replace(stripped, "&#64;", "@")
    stripped = F.regexp_replace(stripped, "&lt;", "<")
    stripped = F.regexp_replace(stripped, "&gt;", ">")
    stripped = F.regexp_replace(stripped, "&amp;", "&")
    clean = F.trim(F.regexp_replace(stripped, WS, " "))
    return docs.select(
        "doc_id",
        F.md5(clean).alias("clean_md5"),
        F.length(clean).cast("long").alias("n_chars_clean"),
    )


# ---------------------------------------------------------------------------
# DSIR resampling end-to-end (weights -> keep set -> budget report)
# ---------------------------------------------------------------------------


def _dsir_resample_oracle() -> str:
    from dados_publicos_etl_spark.plans.registry import QUERIES

    dsir = QUERIES["dsir_importance_weights"].oracle
    return f"""
    WITH w AS ({dsir}),
    toks AS (
      SELECT doc_id, source,
             len(string_split_regex(lower(text), '{WS}')) AS nt
      FROM documents
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN w.above_mean THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(t.nt) AS BIGINT) AS tokens_before,
           CAST(SUM(CASE WHEN w.above_mean THEN t.nt ELSE 0 END)
                AS BIGINT) AS tokens_after
    FROM toks t JOIN w ON t.doc_id = w.doc_id
    GROUP BY t.source
    """


@query(
    "dsir_resample_e2e",
    oracle=_dsir_resample_oracle(),
    description="DSIR resampling END-TO-END: the importance weights "
    "(dsir_importance_weights, already oracle-checked) become the "
    "actual keep decision (weight above corpus mean — the "
    "target-domain tilt) and the report prices the decision in the "
    "unit that matters, TOKENS per source before/after — the "
    "budget sheet a pretraining run signs off on before mixing.  "
    "Composition query in the corpus_pipeline_e2e pattern: proves "
    "the pieces compose (weights join back to the corpus, the gate "
    "filters, the accounting aggregates) with ONE extra broadcast-"
    "scale join over the already-verified weight table; token "
    "counts are exact integers, no new float surface.",
)
def dsir_resample_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    w = dsir_importance_weights(spark, sf_dir).select(
        "doc_id", "above_mean"
    )
    toks = docs.select(
        "doc_id", "source", F.size(tokens("text")).alias("nt")
    )
    return (
        toks.join(w, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("above_mean").cast("int")).cast("long").alias(
                "n_kept"
            ),
            F.sum("nt").cast("long").alias("tokens_before"),
            F.sum(
                F.when(F.col("above_mean"), F.col("nt")).otherwise(0)
            ).cast("long").alias("tokens_after"),
        )
    )


# ---------------------------------------------------------------------------
# Dataset card: the per-source curation scorecard
# ---------------------------------------------------------------------------


def _dataset_card_oracle() -> str:
    from dados_publicos_etl_spark.plans.registry import QUERIES

    gopher = QUERIES["gopher_quality_rules"].oracle
    return f"""
    WITH g AS ({gopher}),
    base AS (
      SELECT doc_id, source, lang, n_chars,
             len(string_split_regex(lower(text), '{WS}')) AS nt,
             md5(trim(regexp_replace(lower(text), '{WS}', ' ', 'g')))
               AS fp
      FROM documents
    ), dup AS (
      SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_fp FROM base GROUP BY fp
    )
    SELECT b.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b.nt) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(b.n_chars) AS DOUBLE) / COUNT(*), 4)
             AS mean_chars,
           ROUND(CAST(SUM(CASE WHEN b.lang = 'en' THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS pct_en,
           ROUND(CAST(SUM(CASE WHEN d.n_fp > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS exact_dup_rate,
           ROUND(CAST(SUM(CASE WHEN g.gopher_keep THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS gopher_pass_rate
    FROM base b
    JOIN dup d ON b.fp = d.fp
    JOIN g ON b.doc_id = g.doc_id
    GROUP BY b.source
    """


@query(
    "dataset_card_report",
    oracle=_dataset_card_oracle(),
    description="The DATASET CARD: one per-source scorecard row "
    "joining the curation battery's headline numbers — volume "
    "(docs, whitespace tokens, mean chars), language mix (en "
    "share), exact-duplicate rate (share of docs whose normalized "
    "md5 fingerprint is corpus-wide non-unique — the doc_fingerprint "
    "key), and Gopher quality pass rate (the already-oracle-checked "
    "composed gate) — the summary table a data release publishes "
    "and a training run reads before setting mixture weights.  "
    "Composition discipline: the quality flags come from the "
    "gopher_quality_rules pipeline verbatim (its oracle embeds as a "
    "CTE), duplication joins through the fingerprint GROUP BY, and "
    "every reported ratio is a single division of exact integer "
    "counts rounded identically — a one-scan-per-signal report "
    "whose output is |sources| rows at any corpus size.",
)
def dataset_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    g = gopher_quality_rules(spark, sf_dir).select(
        "doc_id", "gopher_keep"
    )
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.size(tokens("text")).alias("nt"),
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), WS, " "))
        ).alias("fp"),
    )
    dup = base.groupBy("fp").agg(F.count(F.lit(1)).alias("n_fp"))
    j = base.join(dup, "fp").join(g, "doc_id")
    cnt = F.count(F.lit(1))
    return j.groupBy("source").agg(
        cnt.cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.round(F.sum("n_chars").cast("double") / cnt, 4).alias(
            "mean_chars"
        ),
        F.round(
            F.sum((F.col("lang") == "en").cast("int")).cast("double")
            / cnt,
            6,
        ).alias("pct_en"),
        F.round(
            F.sum((F.col("n_fp") > 1).cast("int")).cast("double") / cnt,
            6,
        ).alias("exact_dup_rate"),
        F.round(
            F.sum(F.col("gopher_keep").cast("int")).cast("double") / cnt,
            6,
        ).alias("gopher_pass_rate"),
    )


# ---------------------------------------------------------------------------
# Corpus novelty curve — per-document first-occurrence shingle rate
# ---------------------------------------------------------------------------


@query(
    "corpus_novelty_curve",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform({duck_shingles_sql('text')},
               s -> {duck_md5_long_sql('s')})) AS sh
      FROM documents
    ), e AS MATERIALIZED (
      SELECT doc_id, unnest(sh) AS h FROM t
    ), fst AS (
      SELECT h, MIN(doc_id) AS first_doc FROM e GROUP BY h
    )
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0
                          END) AS DOUBLE) / COUNT(*), 4) AS novelty_rate
    FROM e JOIN fst f ON e.h = f.h
    GROUP BY e.doc_id
    """,
    description="Corpus novelty curve: for each document (in "
    "ingestion order = doc_id), the fraction of its distinct 3-gram "
    "shingles seen for the FIRST time at that document — the "
    "marginal-new-content measurement behind 'is more of this "
    "source still worth crawling?' decisions and dedup-threshold "
    "tuning (a saturating corpus shows novelty_rate collapsing "
    "toward 0).  Spark shape: one explode of md5-hashed shingles "
    "(portable 28-bit buckets, the dedup family's construction), "
    "one partial-aggregated MIN per shingle, one shingle-keyed "
    "equi-join back, one per-doc aggregate — never a doc x doc "
    "comparison; at 100 TB every stage is a hash shuffle on "
    "fixed-width keys.",
)
def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dados_publicos_etl_spark.io import widen_scan

    # widen_scan (r13, guide §2): shingle md5 hashing was a single
    # scan task on the one-row-group file.
    docs = widen_scan(
        read_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    # staged selects: each expensive expression tree single-evaluated
    sh = (
        docs.select("doc_id", tokens("text").alias("_tk"))
        .select("doc_id", shingles_from_tokens(F.col("_tk")).alias("_shs"))
        .select("doc_id", md5_hashed_shingles(F.col("_shs")).alias("sh"))
    )
    e = sh.select("doc_id", F.explode("sh").alias("h"))
    fst = e.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        e.join(fst, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            novel.cast("long").alias("n_novel"),
            F.round(
                novel.cast("double") / F.count(F.lit(1)), 4
            ).alias("novelty_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source quality-threshold calibration (keep top share per source)
# ---------------------------------------------------------------------------

_QT_PCT = 0.25  # keep roughly the top 75%: cutoff at the 25th pctile

from dados_publicos_etl_spark.operators.text import _BPE_ISH  # noqa: E402  (shared pretokenizer)


@query(
    "quality_threshold_by_source",
    oracle=f"""
    WITH sc AS (
      SELECT source,
             CAST(len(regexp_extract_all(lower(text), '{_BPE_ISH}'))
                  AS BIGINT) AS score
      FROM documents
    ), cut AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             quantile_cont(score, {_QT_PCT}) AS cutoff
      FROM sc GROUP BY source
    )
    SELECT c.source, c.n_docs,
           ROUND(c.cutoff, 4) AS cutoff,
           CAST(SUM(CASE WHEN sc.score >= c.cutoff THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep,
           ROUND(CAST(SUM(CASE WHEN sc.score >= c.cutoff THEN 1 ELSE 0
                          END) AS DOUBLE) / c.n_docs, 4) AS keep_rate
    FROM sc JOIN cut c USING (source)
    GROUP BY c.source, c.n_docs, c.cutoff
    """,
    description="Per-source quality-threshold calibration: each "
    "source gets its own cutoff (the exact 25th percentile of a "
    "token-count quality score, linear interpolation) and the keep "
    "count/rate above it — the per-domain relative filter web "
    "pipelines prefer over one global threshold (a global cutoff "
    "empties low-resource sources and keeps every doc of verbose "
    "ones; per-source percentiles preserve the mixture).  One "
    "score scan + a |sources|-group exact-percentile aggregate + "
    "one broadcast-back membership pass; the interpolation parity "
    "between Spark percentile and DuckDB quantile_cont is the "
    "rolling_median discipline.",
)
def quality_threshold_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dados_publicos_etl_spark.operators.text import _BPE_ISH

    docs = read_table(spark, sf_dir, "documents")
    sc = docs.select(
        "source",
        F.regexp_count(F.lower("text"), F.lit(_BPE_ISH))
        .cast("long")
        .alias("score"),
    ).localCheckpoint()  # feeds the cutoff agg AND the membership pass
    cut = sc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr(f"percentile(score, {_QT_PCT})").alias("cutoff"),
    )
    keep = F.sum(
        F.when(F.col("score") >= F.col("cutoff"), 1).otherwise(0)
    )
    return (
        sc.join(F.broadcast(cut), "source")
        .groupBy("source", "n_docs", "cutoff")
        .agg(
            keep.cast("long").alias("n_keep"),
            F.round(
                keep.cast("double") / F.col("n_docs").cast("double"), 4
            ).alias("keep_rate"),
        )
        .select(
            "source",
            "n_docs",
            F.round("cutoff", 4).alias("cutoff"),
            "n_keep",
            "keep_rate",
        )
    )
