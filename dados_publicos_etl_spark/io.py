"""Sources and sinks (SURVEY.md §2.A S4-S7, K1-K6).

Everything is Spark's native multi-file datasource — "table = folder
of files" exactly as the reference treats GCS prefixes
(/root/reference/src/utils/transform.py:34-35). The reference's
driver-side pandas loops (CSV->Parquet conversion, per-file counting)
become single distributed Spark jobs here; that is its main
scalability cliff and the first thing this engine fixes.
"""

from __future__ import annotations

import abc
import codecs
import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def parquet_ts_unit(path: str, col: str = "ts") -> str | None:
    """Sniff the physical timestamp unit ('ns'|'us'|'ms'|'s') of ``col``
    from a parquet footer (file or directory-of-files).

    The streaming readers declare ``col`` as ``long`` (so NANOS files
    are readable at all under ``nanosAsLong``) and must then rescale
    the raw int64 to microseconds — but the right divisor depends on
    the unit the WRITER used, which only the footer knows.  Hardcoding
    one unit is how you land every window in 1970.  Footer read is a
    driver-side metadata peek, not a data scan.

    Returns None when the column isn't a timestamp (already numeric).
    """
    return parquet_ts_meta(path, col)[0]


def parquet_ts_meta(path: str, col: str = "ts") -> tuple[str | None, str | None]:
    """Like :func:`parquet_ts_unit` but returns ``(unit, tz)`` — the
    tz annotation distinguishes parquet TIMESTAMP adjusted-to-UTC
    (tz set, Spark reads TIMESTAMP) from wall-time NTZ (tz None,
    Spark reads TIMESTAMP_NTZ); readers that branch their declared
    schema on the unit need both."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet files under {path}")
        path = parts[0]
    typ = pq.read_schema(path).field(col).type
    return getattr(typ, "unit", None), getattr(typ, "tz", None)


def epoch_micros_sql(col: str, unit: str | None) -> str:
    """SQL expression rescaling a raw int64 ``col`` of ``unit`` to
    epoch microseconds.  Integer arithmetic only — nanos ~1e18 exceed
    double precision, so float division would drift by up to 1 us.

    ``unit=None`` means the column is a plain numeric (not a parquet
    timestamp at all — :func:`parquet_ts_unit` returns None then); it
    is treated as ALREADY epoch micros, the engine's wire convention.
    """
    scale = {
        None: f"`{col}`",
        "ns": f"`{col}` div 1000",
        "us": f"`{col}`",
        "ms": f"`{col}` * 1000",
        "s": f"`{col}` * 1000000",
    }
    if unit not in scale:
        raise ValueError(f"column {col!r}: unsupported timestamp unit {unit!r}")
    return scale[unit]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (parquet folder-or-file) by name.

    Some driver tables (``events``) carry parquet TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects.  We read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
    microsecond timestamps — the same truncation DuckDB applies, so
    oracle comparisons stay exact.
    """
    from dados_publicos_etl_spark import schemas

    # Required session-wide for NANOS parquet; get_session sets it at
    # build time.  For foreign sessions (the driver's own) set it once
    # here rather than on every call — schema resolution happens at
    # read time AND scan execution consults the conf later, so a
    # save/restore around this read would break lazy execution.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    expected = schemas.TESTDATA.get(name)
    if expected is not None:
        for field in expected.fields:
            actual = df.schema[field.name].dataType if field.name in df.columns else None
            if isinstance(field.dataType, T.TimestampType) and isinstance(
                actual, T.LongType
            ):
                from pyspark.sql import functions as F

                # integer division: nanos ~1e18 exceed double precision,
                # so (x / 1000).cast("long") would drift by up to 1 us.
                # TIMESTAMP_NTZ (UTC wall time), matching how Spark 4
                # reads the other tables' parquet timestamps: windows,
                # session_window bounds and date_format on NTZ are
                # session-timezone-independent, so results can't shift
                # against the UTC-naive DuckDB oracle on a non-UTC
                # driver JVM (probed with TZ=America/Sao_Paulo).
                df = df.withColumn(
                    field.name,
                    F.expr(
                        f"timestampadd(MICROSECOND, `{field.name}` div 1000, "
                        "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                    ),
                )
    return df


def widen_scan(df: DataFrame) -> DataFrame:
    """Widen a NARROW scan to machine parallelism for CPU-heavy
    map-side work — and only ever WIDEN (r13, guide §2 partition
    right-sizing).

    The bench corpus ships each table as ONE parquet file with ONE
    row group, so every scan is a single task and any in-row compute
    stacked on the scan projection (content-defined chunking's md5
    sweep, shingle hashing) runs on one core while the rest of the
    machine idles — the reason several map-heavy queries bench no
    faster at local[32] than local[8].  Repartitioning costs one
    shuffle of the projected input (project FIRST, then widen), which
    pays whenever per-byte map cost >> per-byte shuffle cost.

    At cluster scale real inputs arrive in many splits, so the
    no-op-when-already-wide guard makes this safe to leave in: it
    never SHRINKS a wide scan into fewer tasks, and never adds a
    shuffle to a plan that is already parallel.
    """
    k = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= k:
        return df
    return df.repartition(k)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sep: str = ";",
    header: bool = False,
    encoding: str = "UTF-8",
    infer: bool = False,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """CSV scan with the reference's option set.

    Parity: /root/reference/src/script/script.py:38-47 (explicit
    schema, header=false, sep=';', quote='"', escape='"').  The
    latin-1 transcode the reference does by hand
    (/root/reference/src/utils/scraping.py:63-89) is a native
    ``encoding`` option here.  Explicit schema avoids Spark's extra
    inference pass over the data — keep ``infer`` an opt-in.

    Public data is messy; ``mode`` picks the malformed-row policy:
    PERMISSIVE (default) nulls bad fields, DROPMALFORMED drops the
    row, FAILFAST aborts the job.  Pass ``corrupt_col`` (with a
    matching string field in ``schema``) to capture each malformed
    raw line for quarantine instead of losing it — the audit-friendly
    path at scale, where silently nulled rows are undebuggable.
    """
    reader = (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        .option("encoding", encoding)
        .option("mode", mode)
    )
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def write_csv(
    df: DataFrame,
    path: str,
    sep: str = "|",
    header: bool = True,
    mode: str = "overwrite",
    single_file: bool = False,
    bom: bool = False,
) -> None:
    """CSV sink (reference K2/K4 semantics).

    Parity: /root/reference/src/script/script.py:61-70 writes
    ``coalesce(1)`` + header + '|' + overwrite; the BOM fixup lives in
    /root/reference/src/utils/scraping.py:104-176.  Here the
    single-file collapse and the BOM are OPT-IN: at scale the default
    is a parallel multi-file write, and ``coalesce(1)`` is only for
    small exports that a spreadsheet must open.
    """
    out = df.coalesce(1) if single_file else df
    out.write.format("csv").option("header", str(header).lower()).option(
        "sep", sep
    ).mode(mode).save(path)
    if bom:
        add_utf8_bom(path)


def add_utf8_bom(path: str) -> int:
    """Prepend a UTF-8 BOM to each part-*.csv under ``path``.

    No Spark CSV write option emits a BOM (SURVEY.md §4.3.1), so this
    is a post-write fixup, idempotent like the reference's
    (/root/reference/src/utils/scraping.py:146-151).  Returns the
    number of files rewritten.  Driver-side by design: it pairs with
    ``single_file=True`` exports, never with large parallel output.
    """
    fixed = 0
    for f in glob.glob(os.path.join(path, "part-*.csv")):
        with open(f, "rb") as fh:
            head = fh.read(3)
        if head == codecs.BOM_UTF8:
            continue
        tmp = f + ".bom.tmp"
        with open(f, "rb") as src, open(tmp, "wb") as dst:
            dst.write(codecs.BOM_UTF8)
            shutil.copyfileobj(src, dst)
        os.replace(tmp, f)
        # drop Hadoop's checksum sidecar — the rewrite invalidates it
        # and a later spark.read would fail on ChecksumException.
        crc = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
        if os.path.exists(crc):
            os.remove(crc)
        fixed += 1
    return fixed


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    """Parquet sink — the refined layer.

    The reference README promises partitioning + snappy
    (/root/reference/README.md:28-33) but its code (pandas
    ``to_parquet`` per file, /root/reference/src/utils/transform.py:
    49-58) implements neither; here both are first-class.
    """
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within_by: list[str] | None = None,
    max_records_per_file: int = 0,
    compression: str = "snappy",
) -> None:
    """Dynamic partition overwrite — the incremental-ETL write path.

    ``mode=overwrite`` with static overwrite mode would TRUNCATE the
    whole dataset; with ``partitionOverwriteMode=dynamic`` only the
    partitions present in ``df`` are replaced, so a daily job
    rewrites day=D and leaves the other 3 years of partitions
    untouched.  That is the difference between an O(increment) and an
    O(dataset) nightly write at 100 TB.

    ``sort_within_by`` sorts rows inside each output task
    (``sortWithinPartitions`` — NO extra shuffle) so parquet
    row-group min/max stats become selective for those columns and
    later scans can skip row groups; ``max_records_per_file`` bounds
    file size so a skewed partition can't emit one giant file.
    The sort key is (partition cols, sort cols): FileFormatWriter
    requires task rows ordered by the partition expression (one open
    file at a time) and inserts its own NON-STABLE sort when the
    ordering isn't already satisfied — which would scramble the
    secondary columns.  Pre-sorting on the full key makes the
    writer's sort a no-op and preserves the layout.

    The overwrite-mode conf is set per-write via the DataFrameWriter
    option (not on the shared session), so concurrent writers keep
    their own semantics.
    """
    if sort_within_by:
        df = df.sortWithinPartitions(*partition_by, *sort_within_by)
    writer = (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", compression)
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_by).parquet(path)


# Hive's sentinel directory name for a NULL partition value (Spark
# writes it too — ExternalCatalogUtils.DEFAULT_PARTITION_NAME).
HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


# The characters Spark escapes in partition directory names
# (ExternalCatalogUtils.charToEscape): ASCII control chars plus the
# filesystem/Hive-meaningful set below.
_PATH_ESCAPE_CHARS = set('"#%\'*/:=?\\{[]^')


def escape_path_name(s: str) -> str:
    """Spark/Hive %XX escaping of a partition value for use in a
    directory name (ExternalCatalogUtils.escapePathName): ``a:b`` ->
    ``a%3Ab``.  Paired inverse of :func:`unescape_path_name`."""
    out = []
    for c in s:
        if c in _PATH_ESCAPE_CHARS or ord(c) < 0x20:
            out.append(f"%{ord(c):02X}")
        else:
            out.append(c)
    return "".join(out)


def unescape_path_name(s: str) -> str:
    """Inverse of the %XX escaping Spark/Hive apply to partition
    values in directory names (ExternalCatalogUtils.unescapePathName):
    ``a%3Ab`` -> ``a:b``.  Invalid escapes pass through literally,
    matching Spark's behavior."""
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "%" and i + 2 < len(s):
            try:
                out.append(chr(int(s[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict[str, int]:
    """Small-file compaction for a partitioned parquet dataset — the
    maintenance job every incremental 100 TB pipeline needs: each
    micro-batch / daily append drops a few more files per partition,
    and a year later the NameNode listing and per-file open overhead
    dominate scan time (the classic small-files problem).

    Strategy: list files per partition from the directory layout
    (driver-side metadata, no data read), pick partitions whose file
    count exceeds ``min_files_to_compact``, and rewrite ONLY those via
    dynamic partition overwrite, coalescing to
    ``ceil(bytes / target_file_bytes)`` files.  Untouched partitions
    keep their files byte-identical — compaction cost is
    O(oversplit partitions), not O(dataset).

    Returns {partition_path_suffix: n_files_before} for the rewritten
    partitions (empty dict = nothing to do).
    """
    import math

    from pyspark.sql import functions as F

    # partition dir -> (n_files, total_bytes), from a driver-side walk
    stats: dict[str, tuple[int, int]] = {}
    for root, _dirs, files in os.walk(path):
        pq_files = [f for f in files if f.endswith(".parquet")]
        if not pq_files:
            continue
        rel = os.path.relpath(root, path)
        stats[rel] = (
            len(pq_files),
            sum(os.path.getsize(os.path.join(root, f)) for f in pq_files),
        )
    todo = {
        rel: n for rel, (n, _b) in stats.items() if n >= min_files_to_compact
    }
    if not todo:
        return todo
    full_schema = {
        f.name: f.dataType for f in spark.read.parquet(path).schema.fields
    }
    for rel in todo:
        n_out = max(1, math.ceil(stats[rel][1] / target_file_bytes))
        part_df = spark.read.parquet(os.path.join(path, rel))
        # re-attach the partition columns encoded in the dir names,
        # cast back to the dataset's schema types so the overwrite
        # doesn't silently widen them to string.  Dir names carry
        # Hive %XX-escaped values (space, ':', '%', ...) and the
        # __HIVE_DEFAULT_PARTITION__ null sentinel — unescape before
        # re-attaching, or the dynamic overwrite targets a NEW
        # doubly-escaped directory and duplicates the partition.
        for seg in rel.split(os.sep):
            k, _, v = seg.partition("=")
            k = unescape_path_name(k)
            if v == HIVE_DEFAULT_PARTITION:
                val = F.lit(None)
            else:
                val = F.lit(unescape_path_name(v))
            part_df = part_df.withColumn(k, val.cast(full_schema[k]))
        # materialize BEFORE the write: the plan reads the very files
        # the dynamic overwrite is about to replace — localCheckpoint
        # pins the partition's (bounded) data so the rewrite can't
        # race its own input
        part_df = part_df.coalesce(n_out).localCheckpoint()
        (
            part_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(path)
        )
    return todo


def csv_to_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    sep: str = "|",
    header: bool = True,
    schema: T.StructType | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Trusted-CSV -> refined-Parquet conversion (reference K5).

    The reference loops files through pandas on one worker
    (/root/reference/src/utils/transform.py:14-70, whole file in
    memory each) — here it is one distributed job over the folder.
    Returns the DataFrame that was written (for audit counts).
    """
    df = read_csv(spark, src, schema=schema, sep=sep, header=header,
                  infer=schema is None)
    write_parquet(df, dst, partition_by=partition_by)
    return df


class WarehouseSink(abc.ABC):
    """Seam for warehouse bulk loads (reference K6): everything above
    this call plans and executes identically regardless of the
    warehouse; only the final write routes through the sink.

    Parity: /root/reference/src/utils/load_bq.py:13-64 couples the
    load to one cloud warehouse client (WRITE_TRUNCATE + blocking
    result + row-count verify); the seam keeps that a deployment
    choice instead of an engine property.
    """

    @abc.abstractmethod
    def save(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        """Write ``df`` as ``table``; ``overwrite`` == WRITE_TRUNCATE."""


class CatalogWarehouseSink(WarehouseSink):
    """Default sink: a Spark-catalog managed table (``saveAsTable``)
    — local warehouse dir in this sandbox, Hive metastore / Unity /
    Glue on a real deployment.  ``overwrite`` is the WRITE_TRUNCATE
    equivalent; the write blocks until committed, matching the
    reference's blocking ``result()``."""

    def save(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).saveAsTable(table)


class BigQueryWarehouseSink(WarehouseSink):
    """Connector-backed BigQuery sink SHAPE (reference
    load_bq.py:43-56).  Requires the public ``spark-bigquery``
    connector jar on the cluster classpath — intentionally NOT a
    dependency of this repo; constructing the sink is free, saving
    without the connector fails with Spark's own
    DATA_SOURCE_NOT_FOUND error.  ``mode='overwrite'`` maps to the
    reference's WRITE_TRUNCATE."""

    def __init__(self, dataset: str, temp_bucket: str | None = None) -> None:
        self.dataset = dataset
        self.temp_bucket = temp_bucket

    def save(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        w = df.write.format("bigquery").mode(mode).option(
            "table", f"{self.dataset}.{table}"
        )
        if self.temp_bucket:
            w = w.option("temporaryGcsBucket", self.temp_bucket)
        w.save()


_DEFAULT_WAREHOUSE_SINK: WarehouseSink = CatalogWarehouseSink()


def save_warehouse_table(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    sink: WarehouseSink | None = None,
) -> None:
    """Warehouse bulk load (reference K6) through the sink seam;
    defaults to the Spark catalog."""
    (sink or _DEFAULT_WAREHOUSE_SINK).save(df, table, mode)


def analyze_table(
    spark: SparkSession,
    table: str,
    columns: list[str] | None = None,
) -> dict[str, str]:
    """Collect CBO statistics for a saved table (SURVEY.md §4.2:
    join reordering and broadcast selection need row counts /
    column NDVs — ``ANALYZE TABLE`` is how Catalyst gets them).

    Returns the catalog's statistics line (sizeInBytes, rowCount)
    so callers/tests can assert stats exist before relying on CBO.
    """
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}"
        )
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    return {
        r.col_name: r.data_type
        for r in rows
        if r.col_name in ("Statistics", "Table Properties")
    }


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    target_mb: int = 64,
    sample_rows: int = 200,
) -> int:
    """Export a corpus as sharded JSONL with a per-shard size budget
    (the standard LLM-training-data interchange layout: fixed-size
    .jsonl shards a loader can stream and shuffle by file).

    Shard count = ceil(estimated bytes / target).  Bytes are
    estimated from the JSON-serialized length of a bounded row
    sample (one tiny job) times the exact row count taken from the
    SAME cached scan — no full serialization pre-pass.  The write
    itself is ``repartition(n)`` + text sink of ``to_json`` rows:
    one shuffle, every shard within ~2x of the budget regardless of
    input partitioning.  Returns the shard count.
    """
    import math

    from pyspark.sql import functions as F

    df = df.localCheckpoint()  # one scan feeds sample, count, write
    n_rows = df.count()
    if n_rows == 0:
        n_shards = 1
    else:
        sample = df.limit(sample_rows).select(
            F.length(F.to_json(F.struct(*df.columns))).alias("n")
        )
        avg = sample.agg(F.avg("n")).collect()[0][0] + 1  # +newline
        n_shards = max(1, math.ceil(avg * n_rows / (target_mb * 1024 * 1024)))
    (
        df.repartition(n_shards)
        .select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.mode("overwrite")
        .text(path)
    )
    return n_shards


def enforce_retention(
    path: str,
    partition_col: str,
    keep_from: str,
) -> dict[str, int]:
    """TTL / retention enforcement on a partitioned dataset: drop
    every ``col=value`` partition whose (unescaped) value sorts
    BEFORE ``keep_from``, leaving younger partitions byte-untouched.

    Retention at 100 TB must be a METADATA operation — a directory
    listing plus O(expired) directory deletes — never a read-rewrite
    of surviving data (the difference between seconds and a full
    rescan).  Values compare as strings, which for the canonical
    zero-padded ``yyyy-MM-dd`` / ``yyyy-MM`` partition formats is
    exactly date order; the comparison happens on the UNESCAPED
    value (Hive %XX escaping — see escape_path_name — must not leak
    into ordering).  The Hive NULL sentinel partition is never
    dropped by a date cutoff (NULL provenance is a data-quality
    question, not an age question).

    Returns ``{"dropped": n, "kept": m}`` partition counts.
    """
    prefix = f"{partition_col}="
    dropped = kept = 0
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(prefix):
            continue
        raw = entry[len(prefix):]
        value = unescape_path_name(raw)
        if raw == HIVE_DEFAULT_PARTITION:
            kept += 1
            continue
        if value < keep_from:
            shutil.rmtree(os.path.join(path, entry))
            dropped += 1
        else:
            kept += 1
    return {"dropped": dropped, "kept": kept}


def publish_version(
    df: DataFrame,
    table_root: str,
    keep_versions: int = 3,
) -> str:
    """Atomic publish of a new table version: write into
    ``v<N+1>/``, then swap the ``_CURRENT`` pointer file — readers
    following the pointer never observe a half-written table.

    The write-then-swap protocol is the minimal snapshot-isolation
    story object stores support: the version directory is immutable
    once the pointer moves (writers never modify published files),
    concurrent readers keep reading the OLD version until they
    re-resolve the pointer, and rollback is rewriting one tiny
    pointer file.  Old versions beyond ``keep_versions`` are
    garbage-collected (oldest first) — time travel within the
    retained window is reading ``v<K>`` directly.

    Returns the published version directory path.
    """
    os.makedirs(table_root, exist_ok=True)
    versions = sorted(
        int(d[1:])
        for d in os.listdir(table_root)
        if d.startswith("v") and d[1:].isdigit()
    )
    new_v = (versions[-1] + 1) if versions else 1
    new_dir = os.path.join(table_root, f"v{new_v}")
    df.write.mode("overwrite").parquet(new_dir)
    pointer_tmp = os.path.join(table_root, "_CURRENT.tmp")
    with open(pointer_tmp, "w", encoding="utf-8") as fh:
        fh.write(f"v{new_v}\n")
    os.replace(pointer_tmp, os.path.join(table_root, "_CURRENT"))
    # GC beyond the retained window (never the one just published)
    for v in versions[: max(0, len(versions) + 1 - keep_versions)]:
        shutil.rmtree(os.path.join(table_root, f"v{v}"), ignore_errors=True)
    return new_dir


def read_current_version(spark: SparkSession, table_root: str) -> DataFrame:
    """Resolve the ``_CURRENT`` pointer and read that version."""
    with open(
        os.path.join(table_root, "_CURRENT"), encoding="utf-8"
    ) as fh:
        v = fh.read().strip()
    return spark.read.parquet(os.path.join(table_root, v))
