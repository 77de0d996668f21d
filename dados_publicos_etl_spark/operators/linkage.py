"""Fuzzy record linkage / entity resolution (north-star extension;
SURVEY.md §2.B dedup family — ENTITY-level dedup, where the text
dedup operators are DOCUMENT-level).

A training-data pipeline meets this the moment two sources describe
the same real-world entity with slightly different strings (vendor
names, author fields, site hostnames).  The classic scalable design
is **blocked sorted-neighborhood matching** (Hernández & Stolfo,
1995): never all-pairs — sort records by a discriminating key inside
bounded blocks and compare each record only with its w nearest
neighbors in sort order, then score survivors with an edit-distance
predicate.

Spark-first shape: block key = cheap prefix expression, neighbor
generation = ``lead()`` window inside the block (ONE shuffle on the
block key, ONE window pass computing all w leads, no global sort, no
cross join), scoring = ``F.levenshtein`` (JVM codegen).  Both the
window and the edit distance exist verbatim in DuckDB, so the whole
operator is oracle-checkable — rare for fuzzy matching.

At 100 TB: block sizes are bounded by construction (the prefix is
chosen so blocks fit a partition), the per-row work is w comparisons
(w = _SNM_WINDOW), and recall is tuned the standard way — multiple
passes with different block keys / sort keys, unioned; one pass is
registered here, the union is a trivial composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans.registry import query

_SNM_WINDOW = 3  # compare each record with its next w neighbors
_LEV_MAX = 2  # accept pairs within this edit distance
_BLOCK_LEN = 16  # block = first 16 chars of the name


def _snm_oracle() -> str:
    """Unrolled SNM oracle: one window computing all w leads, then a
    UNION ALL unpivot — LEAD offsets must be constants in portable
    SQL, so the w neighbor hops are unrolled like the PageRank
    oracle's iterations."""
    leads = ",\n             ".join(
        f"LEAD(c_custkey, {j}) OVER w AS ck{j}, "
        f"LEAD(c_name, {j}) OVER w AS nm{j}"
        for j in range(1, _SNM_WINDOW + 1)
    )
    arms = "\n      UNION ALL ".join(
        f"SELECT c_custkey AS custkey_a, c_name AS name_a, "
        f"ck{j} AS custkey_b, nm{j} AS name_b FROM base"
        for j in range(1, _SNM_WINDOW + 1)
    )
    return f"""
    WITH base AS (
      SELECT c_custkey, c_name,
             {leads}
      FROM customer
      WINDOW w AS (PARTITION BY substring(c_name, 1, {_BLOCK_LEN})
                   ORDER BY c_name, c_custkey)
    ), neigh AS (
      {arms}
    )
    SELECT custkey_a, custkey_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS lev_dist
    FROM neigh
    WHERE custkey_b IS NOT NULL
      AND levenshtein(name_a, name_b) <= {_LEV_MAX}
    """


@query(
    "fuzzy_match_customers",
    oracle=_snm_oracle(),
    description="Entity-level fuzzy dedup via blocked "
    "sorted-neighborhood matching: customers sorted by name inside "
    f"{_BLOCK_LEN}-char-prefix blocks, each compared to its next "
    f"{_SNM_WINDOW} neighbors (one window pass computes all leads — "
    "one shuffle, no cross join), pairs within levenshtein "
    f"{_LEV_MAX} kept.  The rare fully-oracle-checkable fuzzy "
    "matcher.",
)
def fuzzy_match_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One sorted-neighborhood pass over the customer table.

    All w lead() columns ride the SAME window spec, so Catalyst
    plans a single Window node over one block-key shuffle; the
    neighbor list is then unpivoted with explode (narrow).  The
    candidate count is exactly w * n rows before the edit-distance
    filter — linear in the table, the property that makes SNM the
    scalable alternative to a blocked self-join when blocks are
    still too big to pair within.
    """
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    win = W.partitionBy(
        F.substring("c_name", 1, _BLOCK_LEN)
    ).orderBy("c_name", "c_custkey")
    # window exprs first (one Window node), explode in a second
    # projection (generators can't host window functions)
    base = cust.select(
        "c_custkey",
        "c_name",
        *[
            c
            for j in range(1, _SNM_WINDOW + 1)
            for c in (
                F.lead("c_custkey", j).over(win).alias(f"ck{j}"),
                F.lead("c_name", j).over(win).alias(f"nm{j}"),
            )
        ],
    )
    with_leads = base.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"ck{j}").alias("custkey_b"),
                        F.col(f"nm{j}").alias("name_b"),
                    )
                    for j in range(1, _SNM_WINDOW + 1)
                ]
            )
        ).alias("nb"),
    )
    lev = F.levenshtein("name_a", F.col("nb.name_b"))
    return (
        with_leads.filter(F.col("nb.custkey_b").isNotNull())
        .select(
            "custkey_a",
            F.col("nb.custkey_b").alias("custkey_b"),
            "name_a",
            F.col("nb.name_b").alias("name_b"),
            lev.cast("int").alias("lev_dist"),
        )
        .filter(F.col("lev_dist") <= _LEV_MAX)
    )
