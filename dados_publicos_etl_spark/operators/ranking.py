"""Range-partitioned global ranking — the ROW_NUMBER that scales.

A global ``ROW_NUMBER() OVER (ORDER BY ...)`` (no PARTITION BY) plans
as one ``Exchange SinglePartition`` + one task sorting the whole
relation — the classic 100 TB killer: at cluster scale one executor
sorts the corpus while the rest idle.  The scalable shape (used by
the ``global_row_number`` catalog query, and reused here by
``decile_lift_table`` and ``vocab_coverage``):

1. ``repartitionByRange`` on the sort key — range partitions are
   GLOBALLY ordered, so partition p's rows all rank before
   partition p+1's;
2. materialize that layout (two jobs must see the SAME sampled range
   bounds);
3. count rows per range partition — a P-row driver-side scalar;
4. convert counts to cumulative offsets and add each partition's
   offset to its LOCAL ``row_number`` — every partition ranks
   independently; the only global step is the P-row offset scan.

The reference has no distributed ranking operator (its pandas
``rank()`` equivalents are single-node); this module exists for the
§2.B analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEFAULT_PARTS = 16


def ranked_by_range(
    df: DataFrame,
    order: list[Column | str],
    num_partitions: int = _DEFAULT_PARTS,
    rn_col: str = "rn",
) -> tuple[DataFrame, int]:
    """Append a global 1-based ``rn_col`` to ``df`` under the total
    order ``order``, with NO SinglePartition exchange.

    Returns ``(ranked_df, total_row_count)`` — the count comes free
    from the offset scan.  ``order`` must be a deterministic total
    order (include a tie-break key), or ranks are not reproducible.

    The ranged layout is localCheckpoint-materialized so the
    offset-count job and the ranking job read the SAME physical
    partitioning (``repartitionByRange`` samples range boundaries;
    two independent executions could draw different bounds).  On a
    real cluster, persist the ranged layout to storage instead —
    identical two-job shape, and the layout is reusable by any
    downstream rank consumer.
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        .withColumn("__rbr_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = sorted(
        ranged.groupBy("__rbr_pid").count().collect(),
        key=lambda r: r["__rbr_pid"],
    )
    offsets: list[tuple[int, int]] = []
    acc = 0
    for r in counts:
        offsets.append((r["__rbr_pid"], acc))
        acc += r["count"]
    off = df.sparkSession.createDataFrame(
        offsets, "__rbr_pid int, __rbr_off long"
    )
    w = Window.partitionBy("__rbr_pid").orderBy(*order)
    ranked = (
        ranged.withColumn("__rbr_local", F.row_number().over(w))
        .join(F.broadcast(off), "__rbr_pid")
        .withColumn(
            rn_col,
            (F.col("__rbr_local") + F.col("__rbr_off")).cast("long"),
        )
        .drop("__rbr_pid", "__rbr_local", "__rbr_off")
    )
    return ranked, acc


def ntile_expr(rn_col: str, n_rows: int, n_tiles: int) -> Column:
    """Exact ``NTILE(n_tiles)`` as a pure expression over a global
    rank — the piecewise formula both Spark and DuckDB implement:
    the first ``n_rows % n_tiles`` tiles get ``n_rows // n_tiles + 1``
    rows, the rest get ``n_rows // n_tiles``.

    Lets NTILE ride the range-partitioned rank instead of a
    SinglePartition window: tile membership is row-local arithmetic
    once the rank exists.
    """
    q, r = divmod(int(n_rows), int(n_tiles))
    cut = r * (q + 1)
    if q == 0:
        # fewer rows than tiles: every row is its own tile
        return F.col(rn_col).cast("int")
    return (
        F.expr(
            f"CASE WHEN {rn_col} <= {cut}"
            f" THEN ({rn_col} - 1) div {q + 1} + 1"
            f" ELSE {r} + ({rn_col} - {cut} - 1) div {q} + 1 END"
        )
    ).cast("int")


def prefix_sums_by_range(
    df: DataFrame,
    order: list[Column | str],
    value_col: str,
    num_partitions: int = _DEFAULT_PARTS,
) -> tuple[DataFrame, int, int]:
    """Global rank AND global running sum of ``value_col`` under the
    total order ``order`` — with NO SinglePartition exchange.

    The same two-job shape as :func:`ranked_by_range`, carrying one
    more per-partition statistic: each range partition's value sum
    becomes a cumulative offset added to the partition-local running
    sum, exactly as row counts become rank offsets.  This is the
    scalable form of ``SUM(x) OVER (ORDER BY ...)`` — the naive plan
    sorts the whole relation in one task.  ``value_col`` must be
    integral (exact merge; float offsets would reorder additions).

    Returns ``(df + rn + cum, total_rows, total_value)``.
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        .withColumn("__rbr_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    stats = sorted(
        ranged.groupBy("__rbr_pid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("s"))
        .collect(),
        key=lambda r: r["__rbr_pid"],
    )
    offsets: list[tuple[int, int, int]] = []
    acc_n, acc_s = 0, 0
    for r in stats:
        offsets.append((r["__rbr_pid"], acc_n, acc_s))
        acc_n += r["n"]
        acc_s += r["s"] or 0
    off = df.sparkSession.createDataFrame(
        offsets, "__rbr_pid int, __rbr_off long, __rbr_voff long"
    )
    w = Window.partitionBy("__rbr_pid").orderBy(*order)
    out = (
        ranged.withColumn("__rbr_local", F.row_number().over(w))
        .withColumn(
            "__rbr_vlocal",
            F.sum(value_col).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .join(F.broadcast(off), "__rbr_pid")
        .withColumn(
            "rn", (F.col("__rbr_local") + F.col("__rbr_off")).cast("long")
        )
        .withColumn(
            "cum", (F.col("__rbr_vlocal") + F.col("__rbr_voff")).cast("long")
        )
        .drop("__rbr_pid", "__rbr_local", "__rbr_vlocal", "__rbr_off", "__rbr_voff")
    )
    return out, acc_n, acc_s


def prefix_sums_multi_by_range(
    df: DataFrame,
    order: list[Column | str],
    value_cols: list[str],
    num_partitions: int = _DEFAULT_PARTS,
) -> tuple[DataFrame, int, tuple[int, ...]]:
    """:func:`prefix_sums_by_range` generalized to SEVERAL integral
    value columns in ONE ranged pass (r12): the output carries ``rn``
    plus one running sum ``cum_<col>`` per value column, and the
    per-partition stats collect returns every column's grand total
    alongside the row count — a consumer that previously paid a
    separate ``agg().first()`` job for totals (ks_test_twosample's
    sample sizes: one full extra execution of its tie-table subtree)
    gets them from the offset scan it already does.

    Returns ``(df + rn + cum_<c>..., total_rows, (total_<c>, ...))``.
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        .withColumn("__rbr_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(c).alias(f"__s_{i}") for i, c in enumerate(value_cols)
    ]
    stats = sorted(
        ranged.groupBy("__rbr_pid").agg(*aggs).collect(),
        key=lambda r: r["__rbr_pid"],
    )
    offsets: list[tuple] = []
    acc_n = 0
    acc_v = [0] * len(value_cols)
    for r in stats:
        offsets.append((r["__rbr_pid"], acc_n, *acc_v))
        acc_n += r["__n"]
        for i in range(len(value_cols)):
            acc_v[i] += r[f"__s_{i}"] or 0
    schema = "__rbr_pid int, __rbr_off long" + "".join(
        f", __rbr_voff_{i} long" for i in range(len(value_cols))
    )
    off = df.sparkSession.createDataFrame(offsets, schema)
    w = Window.partitionBy("__rbr_pid").orderBy(*order)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    out = ranged.withColumn("__rbr_local", F.row_number().over(w))
    for i, c in enumerate(value_cols):
        out = out.withColumn(f"__rbr_vlocal_{i}", F.sum(c).over(wcum))
    out = (
        out.join(F.broadcast(off), "__rbr_pid")
        .withColumn(
            "rn", (F.col("__rbr_local") + F.col("__rbr_off")).cast("long")
        )
        .drop("__rbr_pid", "__rbr_local", "__rbr_off")
    )
    for i, c in enumerate(value_cols):
        out = out.withColumn(
            f"cum_{c}",
            (
                F.col(f"__rbr_vlocal_{i}") + F.col(f"__rbr_voff_{i}")
            ).cast("long"),
        ).drop(f"__rbr_vlocal_{i}", f"__rbr_voff_{i}")
    return out, acc_n, tuple(acc_v)


def prefix_max_by_range(
    df: DataFrame,
    order: list[Column | str],
    value_col: str,
    pre_col: str = "pre_max",
    num_partitions: int = _DEFAULT_PARTS,
) -> DataFrame:
    """Strictly-preceding running max of ``value_col`` under the
    total order ``order`` — ``MAX(v) OVER (ORDER BY ... ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` — with NO SinglePartition
    exchange.  NULL for the globally-first row (empty frame), the
    exact window semantics.

    Same two-job shape as :func:`ranked_by_range`: each range
    partition computes its LOCAL strictly-preceding running max; a
    P-row driver scan turns per-partition maxes into "max of every
    EARLIER partition" offsets; ``greatest`` merges the two (Spark's
    ``greatest`` skips NULLs, returning NULL only when both frames
    are empty — precisely the empty-window contract).  Max is
    merge-order-independent, so unlike prefix sums this is exact for
    any orderable type.
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        .withColumn("__rbr_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    stats = sorted(
        ranged.groupBy("__rbr_pid").agg(F.max(value_col).alias("m")).collect(),
        key=lambda r: r["__rbr_pid"],
    )
    offsets: list[tuple[int, object]] = []
    run = None
    for r in stats:
        offsets.append((r["__rbr_pid"], run))
        if r["m"] is not None and (run is None or r["m"] > run):
            run = r["m"]
    val_type = ranged.schema[value_col].dataType.simpleString()
    off = df.sparkSession.createDataFrame(
        offsets, f"__rbr_pid int, __rbr_pmax {val_type}"
    )
    w = Window.partitionBy("__rbr_pid").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        ranged.withColumn("__rbr_lmax", F.max(value_col).over(w))
        .join(F.broadcast(off), "__rbr_pid")
        .withColumn(pre_col, F.greatest("__rbr_lmax", "__rbr_pmax"))
        .drop("__rbr_pid", "__rbr_lmax", "__rbr_pmax")
    )
