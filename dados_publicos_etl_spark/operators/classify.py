"""Distributed Naive Bayes text classification as pure aggregations
(north-star extension; SURVEY.md §2.B "text analysis" — the quality/
language-classifier stage of a training-data pipeline).

Multinomial NB is the canonical "ML that is really SQL": training IS
a GROUP BY (token-class counts, class totals, priors) and scoring IS
a join + SUM of log-likelihoods — no gradient loop, no collect, no
Python in the row path.  That makes it the one classifier family
whose 100 TB behavior is exactly a pair of hash aggregates plus a
broadcast join of a small model table, and whose results an ANSI-SQL
oracle can reproduce bit-for-bit (after the repo's standard
round-both-sides discipline).

The driver's synthetic corpus draws every language's tokens from the
same vocabulary (no organic signal), so — like the PII query plants
emails (operators/privacy.py) — a deterministic class marker token is
planted in 70% of docs on BOTH sides; the classifier then has real
signal on marked docs and falls back to priors+noise on the rest,
giving a non-degenerate confusion structure that the oracle checks
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans.registry import query

_PLANT_SQL = """
      SELECT doc_id, lang,
             text || (CASE WHEN doc_id % 10 < 7
                           THEN ' tok' || lang ELSE '' END) AS synth
      FROM documents
"""


def nb_train(
    train_tokens: DataFrame, train_docs: DataFrame | None = None
) -> tuple[DataFrame, DataFrame, int]:
    """Train multinomial NB from a (doc_id, lang, token) table.

    CONTRACT (r12 advice): ``train_docs``, when given, must be ONE
    ROW PER (doc_id, lang) — its raw row count stands in for
    COUNT(DISTINCT doc_id), so a non-deduplicated table would
    silently skew the log priors.  Both in-repo callers pass the
    pre-explode doc table, which satisfies this by construction.

    Returns (token_class_counts, class_stats, vocab_size):
    ``token_class_counts`` is the model's only big-ish table (still
    |vocab| x |classes| rows — megabytes when the corpus is
    terabytes); ``class_stats`` is one row per class (token total +
    log prior); ``vocab_size`` is the add-one smoothing denominator
    term.

    r12 shape: the corpus-scale token explode runs ONCE — straight
    into the token-class-count hash aggregate, whose model-sized
    output is frozen (localCheckpoint; persist to storage on a real
    cluster).  Every other training statistic derives from cheap
    inputs: vocabulary size is a distinct-count over the frozen
    model table; per-class token totals are SUM(cnt) over it; and
    doc counts come from ``train_docs`` (the UN-exploded doc table —
    one row per (doc_id, lang), so COUNT == the tokens table's
    COUNT(DISTINCT doc_id)) when the caller has it.  The previous
    shape executed the explode four times (doc-count pass, vocab
    pass, and the cc/cs broadcast builds).
    """
    cc = (
        train_tokens.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    vocab = cc.select("token").distinct().count()
    if train_docs is not None:
        docs_by_class = train_docs.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs")
        )
        n_train_docs = train_docs.count()
    else:
        docs_by_class = train_tokens.groupBy("lang").agg(
            F.countDistinct("doc_id").alias("n_docs")
        )
        n_train_docs = (
            train_tokens.select("doc_id").distinct().count()
        )
    class_stats = (
        cc.groupBy("lang")
        .agg(F.sum("cnt").alias("n_tok"))
        .join(docs_by_class, "lang")
        .withColumn(
            "log_prior", F.log(F.col("n_docs") / F.lit(float(n_train_docs)))
        )
    )
    return cc, class_stats, vocab


@query(
    "nb_classifier_train_score",
    oracle=f"""
    WITH planted AS ({_PLANT_SQL}),
    train AS (SELECT * FROM planted WHERE doc_id % 2 = 0),
    test  AS (SELECT * FROM planted WHERE doc_id % 2 = 1),
    train_tok AS (
      SELECT doc_id, lang, unnest(string_split(synth, ' ')) AS token
      FROM train
    ),
    cc AS (SELECT lang, token, COUNT(*) AS cnt
           FROM train_tok GROUP BY lang, token),
    cs AS (
      SELECT lang, COUNT(*) AS n_tok,
             COUNT(DISTINCT doc_id) AS n_docs,
             ln(COUNT(DISTINCT doc_id)
                / (SELECT CAST(COUNT(*) AS DOUBLE) FROM train)) AS log_prior
      FROM train_tok GROUP BY lang
    ),
    v AS (SELECT COUNT(DISTINCT token) AS vocab FROM train_tok),
    test_tok AS (
      SELECT doc_id, lang AS true_lang,
             unnest(string_split(synth, ' ')) AS token
      FROM test
    ),
    scored AS (
      SELECT t.doc_id, t.true_lang, cs.lang AS cand_lang,
             cs.log_prior
             + SUM(ln((COALESCE(cc.cnt, 0) + 1.0)
                      / (cs.n_tok + v.vocab))) AS score
      FROM test_tok t
      CROSS JOIN cs
      CROSS JOIN v
      LEFT JOIN cc ON cc.lang = cs.lang AND cc.token = t.token
      GROUP BY t.doc_id, t.true_lang, cs.lang, cs.log_prior
    ),
    ranked AS (
      SELECT doc_id, true_lang, cand_lang,
             ROUND(score, 4) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY ROUND(score, 4) DESC, cand_lang) AS rk
      FROM scored
    )
    SELECT doc_id, true_lang,
           cand_lang AS pred_lang, score,
           (cand_lang = true_lang) AS correct
    FROM ranked WHERE rk = 1
    """,
    description="Multinomial Naive Bayes language classifier, trained "
    "AND scored as pure SQL aggregations: token-class counts + class "
    "priors from the even-doc_id half (one GROUP BY), add-one-"
    "smoothed log-likelihood scoring of the odd half (explode x "
    "classes, broadcast model join, per-doc SUM), argmax on the "
    "ROUNDED score with deterministic tie-break.  A 70%-planted "
    "class marker gives the synthetic corpus real signal; the model "
    "table is |vocab| x |classes| rows — megabytes at 100 TB — so "
    "scoring is a broadcast join at any scale.",
)
def nb_classifier_train_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 10 < 7, F.concat(F.lit(" tok"), F.col("lang"))
            ).otherwise(F.lit("")),
        ).alias("synth"),
    )
    train = planted.filter(F.col("doc_id") % 2 == 0)
    test = planted.filter(F.col("doc_id") % 2 == 1)

    def tokens(df: DataFrame, lang_alias: str) -> DataFrame:
        return df.select(
            "doc_id",
            F.col("lang").alias(lang_alias),
            F.explode(F.split("synth", " ")).alias("token"),
        )

    cc, cs, vocab = nb_train(
        tokens(train, "lang"), train.select("doc_id", "lang")
    )

    test_tok = tokens(test, "true_lang")
    # model tables are small by construction: classes broadcast with
    # the cross join, token-class counts broadcast with the left join
    scored = (
        test_tok.crossJoin(
            F.broadcast(cs.select("lang", "n_tok", "log_prior"))
        )
        .join(
            F.broadcast(cc.withColumnRenamed("lang", "cc_lang")),
            (F.col("cc_lang") == F.col("lang"))
            & (cc["token"] == test_tok["token"]),
            "left",
        )
        .groupBy("doc_id", "true_lang", F.col("lang").alias("cand_lang"))
        .agg(
            (
                F.first("log_prior")
                + F.sum(
                    F.log(
                        (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                        / (F.col("n_tok") + F.lit(vocab))
                    )
                )
            ).alias("raw_score")
        )
        .withColumn("score", F.round("raw_score", 4))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("cand_lang")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "true_lang",
            F.col("cand_lang").alias("pred_lang"),
            "score",
            (F.col("cand_lang") == F.col("true_lang")).alias("correct"),
        )
    )


@query(
    "perplexity_filter",
    oracle="""
    WITH train AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    test  AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
    tt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM train),
    train_bg AS (
      SELECT unnest(list_transform(range(1, len(toks)),
               i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
      FROM tt
    ),
    bgc AS (SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS cnt
            FROM train_bg GROUP BY bg.w1, bg.w2),
    ugc AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS w1_cnt
            FROM bgc GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT w2) AS vocab FROM bgc),
    st AS (SELECT doc_id, string_split(text, ' ') AS toks FROM test),
    test_bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
               i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
      FROM st
    ),
    scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_bigrams,
             exp(-AVG(ln((COALESCE(bgc.cnt, 0) + 1.0)
                 / (COALESCE(ugc.w1_cnt, 0) + v.vocab)))) AS ppl
      FROM test_bg t
      CROSS JOIN v
      LEFT JOIN bgc ON bgc.w1 = t.bg.w1 AND bgc.w2 = t.bg.w2
      LEFT JOIN ugc ON ugc.w1 = t.bg.w1
      GROUP BY t.doc_id
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           ROUND(ppl, 2) AS ppl,
           ppl <= 300 AS keep
    FROM scored
    """,
    description="Perplexity-based quality filtering (the CCNet-style "
    "pretraining-data gate): an add-one-smoothed bigram LM trained "
    "on the even-doc_id half as ONE GROUP BY, held-out docs scored "
    "by exp(-avg log P(w2|w1)) through a broadcast join of the "
    "bigram table, kept iff perplexity <= threshold.  Bigrams are "
    "built inside the row via transform(sequence(...)) — no "
    "self-join, no window shuffle; at 100 TB scoring is a narrow "
    "explode + broadcast-joined aggregation.",
)
def perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    # size guard: sequence(1, 0) DESCENDS in Spark ([1, 0]) and the
    # out-of-bounds element_at throws under ANSI — a 1-token document
    # must yield NO bigrams, exactly like DuckDB's empty
    # generate_series(1, 0)
    bigrams = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks) - 1), "
        "i -> named_struct('w1', element_at(toks, i), "
        "'w2', element_at(toks, i + 1))) "
        "ELSE array() END"
    )
    train_bg = (
        toks.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode(bigrams).alias("bg"))
        .select("bg.w1", "bg.w2")
    )
    bgc = train_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    ugc = bgc.groupBy("w1").agg(F.sum("cnt").alias("w1_cnt"))
    vocab = bgc.select("w2").distinct().count()
    test_bg = (
        toks.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .select("doc_id", "bg.w1", "bg.w2")
    )
    scored = (
        test_bg.join(F.broadcast(bgc), ["w1", "w2"], "left")
        .join(F.broadcast(ugc), ["w1"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.exp(
                -F.avg(
                    F.log(
                        (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                        / (
                            F.coalesce(F.col("w1_cnt"), F.lit(0))
                            + F.lit(vocab)
                        )
                    )
                )
            ).alias("raw_ppl"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        F.round("raw_ppl", 2).alias("ppl"),
        (F.col("raw_ppl") <= 300).alias("keep"),
    )


@query(
    "mojibake_repair_roundtrip",
    oracle="""
    SELECT doc_id,
           md5(text || ' coração São Paulo é ótima à noite #'
                    || CAST(doc_id AS STRING)) AS clean_md5,
           CAST(LENGTH(text || ' coração São Paulo é ótima à noite #'
                    || CAST(doc_id AS STRING)) AS BIGINT) AS n_chars_clean
    FROM documents
    """,
    description="Mojibake repair proven by round-trip: plant accented "
    "Portuguese per doc (the reference's ISO-8859-1 domain), DAMAGE "
    "it in-engine (UTF-8 bytes re-decoded as Latin-1 — the "
    "double-encoding wound), repair with the latin1->utf8 inversion "
    "pass, and md5 against the oracle's UNDAMAGED text — equality "
    "proves exact lossless inversion on every row.  Damage and "
    "repair are one Arrow mapInPandas pass each; the ASCII corpus "
    "body passes through both unchanged.",
)
def mojibake_repair_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from dados_publicos_etl_spark.operators.clean import repair_mojibake
    from dados_publicos_etl_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" coração São Paulo é ótima à noite #"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )

    def damage(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["text"] = pdf["text"].map(
                lambda s: s.encode("utf-8").decode("latin-1")
            )
            yield pdf

    damaged = docs.mapInPandas(damage, schema="doc_id long, text string")
    repaired = repair_mojibake(damaged, "text")
    return repaired.select(
        "doc_id",
        F.md5("text").alias("clean_md5"),
        F.length("text").cast("long").alias("n_chars_clean"),
    )


# ---------------------------------------------------------------------------
# Exact AUC via the Mann-Whitney rank statistic
# ---------------------------------------------------------------------------


@query(
    "classifier_auc_exact",
    oracle="""
    WITH labeled AS (
      SELECT source,
             CAST(n_chars AS BIGINT) AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ), tied AS (
      SELECT source, score,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS pos_cnt
      FROM labeled GROUP BY source, score
    ), ranked AS (
      SELECT source, score, cnt, pos_cnt,
             COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY score
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS cum_before
      FROM tied
    ), agg AS (
      SELECT source,
             CAST(SUM(pos_cnt * (2 * cum_before + cnt + 1)) AS BIGINT)
               AS twice_rank_sum,
             CAST(SUM(pos_cnt) AS BIGINT) AS n_pos,
             CAST(SUM(cnt - pos_cnt) AS BIGINT) AS n_neg
      FROM ranked GROUP BY source
    )
    SELECT source, n_pos, n_neg,
           CAST(twice_rank_sum - n_pos * (n_pos + 1) AS BIGINT) AS auc_num,
           CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den,
           ROUND(CAST(twice_rank_sum - n_pos * (n_pos + 1) AS DOUBLE)
                 / (2.0 * n_pos * n_neg), 6) AS auc
    FROM agg
    WHERE n_pos > 0 AND n_neg > 0
    """,
    description="Exact ROC-AUC per source via the Mann-Whitney U rank "
    "statistic (label: lang='en', score: n_chars) — the classifier "
    "evaluation that is usually approximated by threshold sweeping "
    "computed EXACTLY from rank sums with midrank tie handling.  "
    "Scale shape: rows first collapse to (group, score) tie groups "
    "(one hash aggregate — cardinality bounded by distinct scores, "
    "not rows), one cumulative window per group orders those tie "
    "groups, and AUC = (2*sum(ranks_pos) - n_pos(n_pos+1)) / "
    "(2 n_pos n_neg) stays in int64 until the final division; "
    "numerator/denominator are emitted as exact integers so the "
    "check is float-free.  No per-threshold pass, no crossjoin of "
    "pos x neg pairs (the naive O(n^2) AUC).",
)
def classifier_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    labeled = docs.select(
        "source",
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    tied = labeled.groupBy("source", "score").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("pos").alias("pos_cnt"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = tied.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    agg = ranked.groupBy("source").agg(
        F.sum(
            F.col("pos_cnt")
            * (2 * F.col("cum_before") + F.col("cnt") + 1)
        ).alias("twice_rank_sum"),
        F.sum("pos_cnt").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos_cnt")).alias("n_neg"),
    )
    num = (
        F.col("twice_rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1)
    ).cast("long")
    den = (2 * F.col("n_pos") * F.col("n_neg")).cast("long")
    return (
        agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            "source",
            "n_pos",
            "n_neg",
            num.alias("auc_num"),
            den.alias("auc_den"),
            F.round(num.cast("double") / den.cast("double"), 6).alias(
                "auc"
            ),
        )
    )


_TE_PRIOR_M = 100  # pseudo-observations of the global rate


@query(
    "target_encode_loo",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS target
      FROM orders
    ), cat AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             SUM(target) AS s,
             SUM(COUNT(*)) OVER () AS big_n,
             SUM(SUM(target)) OVER () AS big_s
      FROM base GROUP BY o_orderpriority
    )
    SELECT b.o_orderkey, b.o_orderpriority, b.target,
           CAST(c.s - b.target AS BIGINT) AS loo_num,
           CAST(c.n - 1 AS BIGINT) AS loo_den,
           ROUND(CAST(c.s - b.target AS DOUBLE) / (c.n - 1), 9)
             AS loo_rate,
           ROUND(CAST((c.s - b.target) * c.big_n
                      + {_TE_PRIOR_M} * c.big_s AS DOUBLE)
                 / (c.big_n * (c.n - 1 + {_TE_PRIOR_M})), 9)
             AS loo_smoothed
    FROM base b JOIN cat c USING (o_orderpriority)
    """,
    description="Leave-one-out target encoding of o_orderpriority against "
    "the fulfilled-status flag: per-category (n, sum) from ONE 7-row hash "
    "aggregate (5 priorities), broadcast back onto every row; own-row exclusion and "
    f"m={_TE_PRIOR_M} prior smoothing as exact integer cross-"
    "multiplication until the final division.  The leakage-free "
    "categorical feature of gradient-boosting pipelines.",
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOO target encoding (Micci-Barreca 2001 semantics, exact).

    Spark-first shape: encoding needs only per-category totals, so
    the plan is one partial-aggregated groupBy bounded by
    |categories| (5 priorities), a window total over that 5-row
    table for the global prior (no 1-row crossJoin, so no BNLJ in
    the audit), and a broadcast join stamping (n, s, N, S) onto
    every fact row — the fact table never shuffles.  Own-row
    exclusion (s - t)/(n - 1) happens row-local AFTER the join,
    which is what makes the encoding leakage-free without per-row
    state.  Integer cross-multiplication keeps both engines exact
    until one final rounded division.
    """
    from pyspark.sql import Window

    base = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("target"),
    )
    w = Window.partitionBy()
    cat = (
        base.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("target").alias("s"),
        )
        .select(
            "o_orderpriority",
            "n",
            "s",
            F.sum("n").over(w).alias("big_n"),
            F.sum("s").over(w).alias("big_s"),
        )
    )
    m = F.lit(_TE_PRIOR_M)
    num = F.col("s") - F.col("target")
    return base.join(F.broadcast(cat), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        "target",
        num.cast("long").alias("loo_num"),
        (F.col("n") - 1).cast("long").alias("loo_den"),
        F.round(num.cast("double") / (F.col("n") - 1), 9).alias("loo_rate"),
        F.round(
            (num * F.col("big_n") + m * F.col("big_s")).cast("double")
            / (F.col("big_n") * (F.col("n") - 1 + m)),
            9,
        ).alias("loo_smoothed"),
    )


@query(
    "isotonic_calibration",
    oracle="""
    WITH bins AS MATERIALIZED (
      SELECT CAST(ROUND(l_quantity, 0) AS INT) AS q,
             COUNT(*) AS w,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS s
      FROM lineitem GROUP BY 1
    ), cum AS MATERIALIZED (
      SELECT q, w, s,
             SUM(w) OVER (ORDER BY q) AS cw,
             SUM(s) OVER (ORDER BY q) AS cs
      FROM bins
    ), pairs AS MATERIALIZED (
      SELECT a.q AS i, b.q AS j,
             CAST(b.cs - a.cs + a.s AS DOUBLE) / (b.cw - a.cw + a.w) AS av
      FROM cum a JOIN cum b ON a.q <= b.q
    ), m AS (
      SELECT k.q AS k, p.i, MIN(p.av) AS mn
      FROM pairs p JOIN bins k ON p.i <= k.q AND p.j >= k.q
      GROUP BY 1, 2
    ), fit AS (
      SELECT k AS q, MAX(mn) AS iso FROM m GROUP BY k
    )
    SELECT b.q AS quantity, CAST(b.w AS BIGINT) AS n,
           CAST(b.s AS BIGINT) AS s,
           ROUND(CAST(b.s AS DOUBLE) / b.w, 9) AS rate_raw,
           ROUND(f.iso, 9) AS rate_iso
    FROM bins b JOIN fit f ON b.q = f.q
    """,
    description="Isotonic calibration (PAVA) of the return rate as a "
    "nondecreasing function of order quantity: the fact table "
    "collapses to 50 (quantity, n, s) bins in one aggregate; PAVA "
    "pools violations with exact integer cross-multiplied "
    "comparisons inside a single 50-row Arrow batch.  Oracle = the "
    "minimax characterization fit(k) = max_{i<=k} min_{j>=k} "
    "avg(i..j) — a THEOREM-level equivalence the differential check "
    "proves numerically (equal rationals divide to bitwise-equal "
    "doubles under IEEE correctly-rounded division).",
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pool-adjacent-violators on pre-aggregated bins.

    Scale shape: 100 TB of lineitem touches Python as exactly 50
    rows — the groupBy(quantity) partial-aggregates map-side and the
    sequential PAVA stack runs in one Arrow batch (the algorithm is
    inherently left-to-right; 50 iterations of integer arithmetic).
    Pool merging compares pooled rates by cross-multiplication
    (s_prev * w_cur >= s_cur * w_prev), so the pooling DECISIONS are
    exact integer math; only the final pooled s/w division produces
    a double, and equal rationals produce equal doubles, which is
    why the minimax oracle matches to the bit.
    """
    import pandas as pd

    bins = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(F.round("l_quantity", 0).cast("int").alias("quantity"))
        .agg(
            F.count(F.lit(1)).alias("w"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("s"),
        )
    )

    def pava(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("quantity").reset_index(drop=True)
        pools = []  # [w, s, n_bins]
        for w, s in zip(pdf["w"], pdf["s"]):
            pools.append([int(w), int(s), 1])
            # violation iff prev_rate >= cur_rate, compared exactly
            while (
                len(pools) > 1
                and pools[-2][1] * pools[-1][0]
                >= pools[-1][1] * pools[-2][0]
            ):
                w2, s2, b2 = pools.pop()
                pools[-1][0] += w2
                pools[-1][1] += s2
                pools[-1][2] += b2
        iso = []
        for w, s, b in pools:
            iso.extend([s / w] * b)
        return pd.DataFrame(
            {
                "quantity": pdf["quantity"],
                "n": pdf["w"].astype("int64"),
                "s": pdf["s"].astype("int64"),
                "rate_raw": pdf["s"] / pdf["w"],
                "rate_iso": iso,
            }
        )

    fitted = (
        bins.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            pava,
            schema="quantity int, n long, s long, rate_raw double, "
            "rate_iso double",
        )
    )
    return fitted.select(
        "quantity",
        "n",
        "s",
        F.round("rate_raw", 9).alias("rate_raw"),
        F.round("rate_iso", 9).alias("rate_iso"),
    )


# ---------------------------------------------------------------------------
# Inter-rater agreement (Cohen's kappa)
# ---------------------------------------------------------------------------


@query(
    "cohens_kappa_raters",
    oracle="""
    WITH rated AS (
      SELECT CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS r1,
             CASE WHEN event_type IN ('purchase', 'click') THEN 1 ELSE 0 END
               AS r2
      FROM events
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r1 * r2) AS BIGINT) AS a,
             CAST(SUM(r1 * (1 - r2)) AS BIGINT) AS b,
             CAST(SUM((1 - r1) * r2) AS BIGINT) AS c,
             CAST(SUM((1 - r1) * (1 - r2)) AS BIGINT) AS d
      FROM rated
    )
    SELECT n, a AS both_pos, b AS only_r1, c AS only_r2, d AS both_neg,
           CAST(a + d AS DOUBLE) / n AS p_observed,
           (CAST(a + b AS DOUBLE) / n) * (CAST(a + c AS DOUBLE) / n)
           + (CAST(c + d AS DOUBLE) / n) * (CAST(b + d AS DOUBLE) / n)
             AS p_expected,
           ROUND((CAST(a + d AS DOUBLE) / n
                  - ((CAST(a + b AS DOUBLE) / n) * (CAST(a + c AS DOUBLE) / n)
                     + (CAST(c + d AS DOUBLE) / n)
                       * (CAST(b + d AS DOUBLE) / n)))
                 / (1.0
                    - ((CAST(a + b AS DOUBLE) / n)
                       * (CAST(a + c AS DOUBLE) / n)
                       + (CAST(c + d AS DOUBLE) / n)
                         * (CAST(b + d AS DOUBLE) / n))), 9) AS kappa
    FROM m
    """,
    description="Cohen's kappa between two deterministic labelers "
    "(a value rule and an event-type rule): chance-corrected "
    "agreement from the exact 2x2 confusion counts — the metric that "
    "qualifies auto-labelers and LLM judges before their labels "
    "train anything (raw accuracy overstates agreement under class "
    "imbalance).  ONE partial-aggregated pass produces n/a/b/c/d; "
    "kappa is row-local double arithmetic on those exact integers, "
    "identical IEEE tree on both engines.  Completes the agreement/"
    "evaluation family beside classifier_auc_exact and "
    "isotonic_calibration.",
)
def cohens_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    r1 = F.when(F.col("value") > 50.0, 1).otherwise(0)
    r2 = F.when(
        F.col("event_type").isin("purchase", "click"), 1
    ).otherwise(0)
    m = ev.select(r1.alias("r1"), r2.alias("r2")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r1") * F.col("r2")).alias("a"),
        F.sum(F.col("r1") * (1 - F.col("r2"))).alias("b"),
        F.sum((1 - F.col("r1")) * F.col("r2")).alias("c"),
        F.sum((1 - F.col("r1")) * (1 - F.col("r2"))).alias("d"),
    )
    n = F.col("n").cast("double")
    a, b, c, d = (F.col(x).cast("double") for x in "abcd")
    po = (a + d) / n
    pe = ((a + b) / n) * ((a + c) / n) + ((c + d) / n) * ((b + d) / n)
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.col("a").cast("long").alias("both_pos"),
        F.col("b").cast("long").alias("only_r1"),
        F.col("c").cast("long").alias("only_r2"),
        F.col("d").cast("long").alias("both_neg"),
        po.alias("p_observed"),
        pe.alias("p_expected"),
        F.round((po - pe) / (1.0 - pe), 9).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM scoring (quality-filter upgrade)
# ---------------------------------------------------------------------------

_KN_D = 0.75       # absolute discount (the standard KN constant)
_KN_PPL_KEEP = 31.0  # splits the synthetic corpus ~60/40 at sf0.01-0.1


@query(
    "kn_bigram_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ), b2 AS (
      SELECT doc_id, s['w1'] AS w1, s['w2'] AS w2 FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(t) - 1),
                 i -> {{'w1': t[i], 'w2': t[i+1]}})) AS s
        FROM toks)
    ), tr AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM b2
      WHERE doc_id % 2 = 0 GROUP BY w1, w2
    ), w1s AS (
      SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1f FROM tr GROUP BY w1
    ), w2s AS (
      SELECT w2, COUNT(*) AS n1p FROM tr GROUP BY w2
    ), consts AS (
      SELECT (SELECT COUNT(*) FROM tr) AS tt,
             (SELECT COUNT(*) FROM w2s) AS vv
    ), sc AS (
      SELECT b.doc_id,
        CASE WHEN w1s.c1 IS NOT NULL THEN
          GREATEST(COALESCE(tr.c12, 0) - {_KN_D}, 0)
            / CAST(w1s.c1 AS DOUBLE)
          + ({_KN_D} * w1s.n1f / CAST(w1s.c1 AS DOUBLE))
            * ((COALESCE(w2s.n1p, 0) + 1.0) / (consts.tt + consts.vv))
        ELSE (COALESCE(w2s.n1p, 0) + 1.0) / (consts.tt + consts.vv)
        END AS p
      FROM b2 b
      LEFT JOIN tr  ON b.w1 = tr.w1 AND b.w2 = tr.w2
      LEFT JOIN w1s ON b.w1 = w1s.w1
      LEFT JOIN w2s ON b.w2 = w2s.w2
      CROSS JOIN consts
      WHERE b.doc_id % 2 = 1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(EXP(-AVG(LN(p))), 2) AS kn_ppl,
           ROUND(EXP(-AVG(LN(p))), 2) <= {_KN_PPL_KEEP} AS keep
    FROM sc GROUP BY doc_id
    """,
    description="Interpolated Kneser-Ney bigram LM quality scoring — "
    "the smoothing the KenLM-style filters real pretraining "
    "pipelines run (CCNet et al.), upgrading the add-one bigram "
    "model of perplexity_filter: p(w2|w1) = max(c12 - D, 0)/c1 + "
    f"(D * N1+(w1,.)/c1) * p_cont(w2) with D = {_KN_D} and the "
    "continuation probability p_cont(w2) = (N1+(., w2) + 1) / "
    "(bigram_types + vocab) (add-one-smoothed so unseen "
    "continuations stay finite); contexts never seen in training "
    "back off to p_cont alone.  Training IS three GROUP BYs over "
    "the even-doc_id half (pair counts, per-context totals + "
    "distinct-continuation counts, per-word distinct-context "
    "counts); scoring joins the odd half's bigrams against those "
    "model tables — vocab-bounded, broadcast when small, plain "
    "shuffle joins at 100 TB — and folds one exp(-avg(ln p)) per "
    "document.  No gradient loop, no Python in the row path, and "
    "the whole model is ANSI-SQL-reproducible, so the oracle checks "
    "the exact probabilities, not a proxy.",
)
def kn_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dados_publicos_etl_spark.functions.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens("text").alias("toks"))
    # same ANSI sequence-descent guard as perplexity_filter above
    bg_arr = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.struct(
            F.element_at(F.col("toks"), i).alias("w1"),
            F.element_at(F.col("toks"), i + 1).alias("w2"),
        ),
    )
    bigrams = toked.select(
        "doc_id",
        F.explode(
            F.when(F.size("toks") >= 2, bg_arr).otherwise(
                F.array().cast("array<struct<w1:string,w2:string>>")
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    tr = (
        bigrams.filter(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint()
    )
    w1s = tr.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    w2s = tr.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p"))
    tt = tr.count()
    vv = w2s.count()
    denom = float(tt + vv)
    p_cont = (F.coalesce(F.col("n1p"), F.lit(0)) + 1.0) / F.lit(denom)
    p = F.when(
        F.col("c1").isNotNull(),
        F.greatest(F.coalesce(F.col("c12"), F.lit(0)) - _KN_D, F.lit(0.0))
        / F.col("c1").cast("double")
        + (_KN_D * F.col("n1f") / F.col("c1").cast("double")) * p_cont,
    ).otherwise(p_cont)
    scored = (
        bigrams.filter(F.col("doc_id") % 2 == 1)
        .join(F.broadcast(tr), ["w1", "w2"], "left")
        .join(F.broadcast(w1s), ["w1"], "left")
        .join(F.broadcast(w2s), ["w2"], "left")
        .select("doc_id", p.alias("p"))
    )
    raw_ppl = F.exp(-F.avg(F.log("p")))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(raw_ppl, 2).alias("kn_ppl"),
        # gate on the ROUNDED perplexity: the raw float differs by
        # accumulation order across engines, so a doc within an ulp of
        # the threshold could flip keep between Spark and DuckDB
        (F.round(raw_ppl, 2) <= _KN_PPL_KEEP).alias("keep"),
    )
