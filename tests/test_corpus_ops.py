"""Library-level tests for the corpus-hygiene / privacy / sampling /
graph operators (the oracle-differential check covers their
registered queries; these cover the reusable functions on synthetic
frames where ground truth is known by construction)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_connected_components_known_graph(spark):
    """Two chains and an isolated edge: labels must reach the min id
    across multi-hop chains (the thing pairwise dedup alone misses)."""
    from dados_publicos_etl_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "src long, dst long",
    )
    got = {
        r.node: r.label for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_redact_pii_removes_patterns(spark):
    from dados_publicos_etl_spark.operators.privacy import (
        EMAIL_RE,
        redact_pii,
    )

    df = spark.createDataFrame(
        [("mail a.b@x.co and +55-123-4567 end",), ("clean text",)],
        "t string",
    )
    out = df.select(
        redact_pii("t").alias("r"),
        F.regexp_count(redact_pii("t"), F.lit(EMAIL_RE)).alias("resid"),
    ).collect()
    assert out[0].r == "mail <EMAIL> and <PHONE> end"
    assert out[1].r == "clean text"
    assert all(r.resid == 0 for r in out)


def test_pseudonymize_stable_and_salted(spark):
    from dados_publicos_etl_spark.operators.privacy import pseudonymize

    df = spark.createDataFrame([(7,), (7,), (8,)], "id long")
    a = [r[0] for r in df.select(pseudonymize("id", "s1")).collect()]
    b = [r[0] for r in df.select(pseudonymize("id", "s2")).collect()]
    assert a[0] == a[1] != a[2]          # stable within salt
    assert a[0] != b[0]                  # different salt, different space
    assert len(a[0]) == 64               # sha-256 hex


def test_sample_bernoulli_rate_and_determinism(spark):
    from dados_publicos_etl_spark.operators.sampling import sample_bernoulli

    df = spark.range(0, 20_000).withColumnRenamed("id", "k")
    s1 = sample_bernoulli(df, "k", 0.3)
    n1 = s1.count()
    assert abs(n1 / 20_000 - 0.3) < 0.02          # within 2pp of rate
    # determinism across repartitioning (rand() would fail this)
    n2 = sample_bernoulli(df.repartition(13), "k", 0.3).count()
    assert n1 == n2
    ids1 = {r.k for r in s1.collect()}
    ids2 = {
        r.k
        for r in sample_bernoulli(df.repartition(3), "k", 0.3).collect()
    }
    assert ids1 == ids2


def test_repetition_stats_extremes(spark, sf_dir):
    """A fully-repeated doc scores 1.0 top-token / 1.0 dup-bigram;
    an all-distinct doc scores 1/n / 0.0."""
    from dados_publicos_etl_spark.plans import QUERIES
    from dados_publicos_etl_spark.plans import catalog  # noqa: F401

    rows = QUERIES["repetition_stats"].fn(spark, sf_dir)
    r = {x.doc_id: x for x in rows.collect()}
    assert r, "documents table must not be empty"
    for x in r.values():
        assert 0 < x.top_token_frac <= 1.0
        assert 0 <= x.dup_bigram_frac <= 1.0


def test_prefix_join_is_superset_of_blocked_exact_tier(spark, sf_dir):
    """dedup_prefix_join is the FULL-recall exact similarity join;
    dedup_ngram_jaccard is the same predicate (shingle Jaccard >=
    0.8) under min-shingle blocking, whose recall is ~j < 1 by
    construction.  Every blocked pair must therefore appear in the
    prefix join's result with the identical jaccard value — and any
    extra prefix-join pairs are exactly the blocking's misses."""
    from dados_publicos_etl_spark.plans import QUERIES
    from dados_publicos_etl_spark.plans import catalog  # noqa: F401

    exact = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in QUERIES["dedup_prefix_join"].fn(spark, sf_dir).collect()
    }
    blocked = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    assert set(blocked) <= set(exact)
    for pair, j in blocked.items():
        assert exact[pair] == j


def test_proration_conserves_order_totals(spark, sf_dir):
    """Largest-remainder property: per order, allocated cents sum
    EXACTLY to the order total's cents — the invariant naive
    per-line rounding violates."""
    from pyspark.sql import functions as F

    from dados_publicos_etl_spark.io import read_table
    from dados_publicos_etl_spark.plans import QUERIES
    from dados_publicos_etl_spark.plans import catalog  # noqa: F401

    alloc = QUERIES["proration_largest_remainder"].fn(spark, sf_dir)
    sums = alloc.groupBy("l_orderkey").agg(
        F.sum("alloc_cents").alias("got")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("want"),
    )
    bad = sums.join(orders, "l_orderkey").filter("got <> want").count()
    assert bad == 0


def test_bloom_decontamination_equals_exact_check(spark, sf_dir):
    """Zero false negatives are STRUCTURAL for a Bloom filter, so the
    bloom-prefiltered pipeline's confirmed verdicts must equal the
    unfiltered exact check (contamination_ngram) doc for doc — the
    prefilter is provably a pure optimization.  Candidates must also
    be a superset of confirmations (false positives only prune)."""
    from dados_publicos_etl_spark.plans import QUERIES
    from dados_publicos_etl_spark.plans import catalog  # noqa: F401

    exact = {
        r.doc_id: r.n_shared_shingles
        for r in QUERIES["contamination_ngram"].fn(spark, sf_dir).collect()
        if r.n_shared_shingles > 0
    }
    rows = QUERIES["decontaminate_bloom_e2e"].fn(spark, sf_dir).collect()
    confirmed = {r.doc_id: r.n_confirmed for r in rows if r.n_confirmed > 0}
    assert confirmed == exact
    for r in rows:
        assert r.n_bloom_candidates >= r.n_confirmed


def test_bigram_queries_survive_degenerate_docs(spark, tmp_path):
    """A 1-token document makes sequence(1, size-1) DESCEND in Spark
    ([1, 0]) and the out-of-bounds element_at throws under ANSI,
    while DuckDB's generate_series(1, 0) is empty — every bigram
    operator must guard the degenerate case so both engines drop
    such documents identically.  (Latent until now: the synthetic
    corpus has no short documents; this fixture plants 0-, 1- and
    2-token docs and runs the full differential check.)"""
    from oracle_harness import compare

    import dados_publicos_etl_spark.plans.catalog  # noqa: F401
    from dados_publicos_etl_spark.plans import QUERIES

    rows = []
    texts = ["one", "two words", "a b c d e f", "x", "the a of and then",
             "solo", "pair up", "w1 w2 w3 w4 w5 w6 w7 w8"]
    for i, t in enumerate(texts):
        rows.append((i, t, "en" if i % 2 else "es",
                     "src0" if i < 2 else f"src{i % 3}", len(t)))
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.conftest import SF_SMOKE

    d = str(tmp_path / "degenerate")
    os.makedirs(d)
    # single parquet FILE per table, the testdata layout the oracle
    # harness expects (a Spark directory-write would not register)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "source": [r[3] for r in rows],
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    # the harness registers a view per table; point the rest at the
    # real smoke fixtures (these queries never read them)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", f"{d}/{t}.parquet")
    for name in ("perplexity_filter", "pmi_collocations",
                 "kn_bigram_score", "dsir_importance_weights"):
        res = QUERIES[name].fn(spark, d)
        compare(res, QUERIES[name].oracle, d)
