"""Sources and sinks (SURVEY.md §2.1, S1-S6).

The reference reads raw CSV with schema inference
(etl1_clean_and_stage.py:59), reads/writes partitioned parquet
(etl1_clean_and_stage.py:145, etl2_advclean_and_dimcreatin.py:94,285-315),
and sizes its output files with a driver-side boto3 two-pass
(etl2_advclean_and_dimcreatin.py:67-88,301-315).  Here:

- CSV scans take an explicit schema (inference is a full extra pass over
  100 TB of input — never at scale); a permissive all-string bronze schema
  helper is provided for dirty feeds.
- Partitioned writes target a file size via ``maxRecordsPerFile`` computed
  single-pass from the optimizer's size statistics — no second write, no
  object-store listing.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TARGET_FILE_SIZE_MB = 128.0  # reference: etl2_advclean_and_dimcreatin.py:62
MAX_OUTPUT_FILES = 100  # reference clamp: etl2_advclean_and_dimcreatin.py:308


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Parquet scan (S2). ``columns`` prunes eagerly; Catalyst would prune
    anyway once a select appears downstream, but being explicit keeps ad-hoc
    usage from scanning all columns."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def bronze_string_schema(columns: list[str]) -> T.StructType:
    """Permissive all-string schema for dirty CSV feeds (SURVEY.md §1.3):
    every raw column arrives as a nullable string and is hardened by the
    cleaning operators, never by the scanner."""
    return T.StructType([T.StructField(c, T.StringType(), True) for c in columns])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan (S1, etl1_clean_and_stage.py:59). Explicit schema replaces
    inferSchema: on a 100 TB feed, inference is a wasted full pass and can
    flip types between monthly drops."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)  # small/ad-hoc only
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """JSON-Lines scan — the de-facto interchange format for LLM text
    corpora (one JSON document per line). Same schema discipline as
    read_csv: pass the schema; inference is a wasted full pass at corpus
    scale and silently widens/flips types between drops. Corrupt lines
    land in Spark's ``_corrupt_record`` convention under PERMISSIVE mode
    rather than killing the job — add the column to the schema to audit
    them, or read FAILFAST in validation runs."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    return df.select(*columns) if columns else df


def write_jsonl(df: DataFrame, path: str, target_mb: float = TARGET_FILE_SIZE_MB) -> None:
    """JSON-Lines sink through the same size-adaptive single-pass writer
    policy as parquet (one estimate, one write — JSONL inflates bytes
    ~2-4× over parquet, which estimate_plan_bytes' plan-stats basis
    already reflects less precisely; file-count math still beats the
    1-file-per-task default by orders of magnitude)."""
    df.coalesce(
        target_file_count(estimate_plan_bytes(df), target_mb)
    ).write.mode("overwrite").json(path)
    # Same staleness guard as write_parquet: a reader created after an
    # overwrite must see the new files, not the session's cached listing.
    df.sparkSession.catalog.refreshByPath(path)


def read_orc(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """ORC scan — same contract as read_parquet (S2 applied to the other
    columnar interchange format a warehouse migration actually hands
    you). ORC carries the same scan-side machinery Spark's parquet path
    uses: column pruning, predicate pushdown into stripe/row-group
    min-max stats, and bloom filters — all driven by the identical
    declarative plan, so every operator in this repo runs unchanged on
    an ORC lakehouse."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_mb: float = TARGET_FILE_SIZE_MB,
    mode: str = "overwrite",
    bloom_filter_cols: list[str] | None = None,
) -> None:
    """ORC sink through the same single-pass size-adaptive writer policy
    as write_parquet (one plan-stats estimate, one write). Bloom filters
    use ORC's native writer option (``orc.bloom.filter.columns`` — a
    comma-separated column list, the ORC spec's equivalent of the
    per-column parquet-mr flags write_parquet sets)."""
    total_bytes = estimate_plan_bytes(df)
    n_files = target_file_count(total_bytes, target_mb) if total_bytes > 0 else 1
    df = df.coalesce(n_files)
    writer = df.write.mode(mode)
    if bloom_filter_cols:
        writer = writer.option(
            "orc.bloom.filter.columns", ",".join(bloom_filter_cols)
        )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
    df.sparkSession.catalog.refreshByPath(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — the row-oriented interchange format of Kafka/schema-
    registry pipelines. Spark ships Avro as an EXTERNAL module
    (spark-avro must be on the classpath: ``--packages
    org.apache.spark:spark-avro_2.13:<spark version>``); this container
    does not bundle it, so the capability is probed and the failure made
    actionable instead of Spark's generic ClassNotFound chain. The
    documented plug-in boundary, same discipline as the codec
    boundaries."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # AnalysisException: failed to find data source
        # Match the data-source-lookup failure specifically (message or
        # Spark 4 error class), NOT any message containing "avro" — with
        # spark-avro actually installed, a plain path-not-found on
        # "*.avro" would otherwise be rewrapped into the misleading
        # add-the-package error (ADVICE r10).
        msg = str(e).lower()
        if (
            "failed to find data source" in msg
            or "failed to find the data source" in msg
            or "data_source_not_found" in msg
        ):
            raise RuntimeError(
                "Avro support needs the external spark-avro package on the "
                "classpath (org.apache.spark:spark-avro_2.13). Add it via "
                "spark.jars.packages; parquet/ORC/CSV/JSONL sources are "
                "built in."
            ) from e
        raise


def reconcile_union(dfs: list[DataFrame]) -> DataFrame:
    """Schema-drift-tolerant union (SURVEY.md §1.3): monthly drops gain or
    lose columns over time; unionByName(allowMissingColumns=True) aligns
    by name and nulls the gaps — the pattern the reference itself uses for
    its exact/fuzzy merge (etl2_advclean_and_dimcreatin.py:243)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def estimate_plan_bytes(df: DataFrame) -> int:
    """Single-pass replacement for the reference's boto3 S3 size probe
    (etl2_advclean_and_dimcreatin.py:67-88): ask Catalyst for the optimized
    plan's size estimate (propagated from parquet footers / file sizes).
    No extra job, no object-store listing."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def target_file_count(
    total_bytes: int,
    target_mb: float = TARGET_FILE_SIZE_MB,
    max_files: int = MAX_OUTPUT_FILES,
) -> int:
    """The reference's output-file-count policy
    (etl2_advclean_and_dimcreatin.py:301-308): collapse to one file below
    target/2, else clamp(ceil(bytes/target), 1, max_files)."""
    target_bytes = target_mb * 1024 * 1024
    if total_bytes < target_bytes / 2:
        return 1
    return min(max_files, max(1, math.ceil(total_bytes / target_bytes)))


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_mb: float = TARGET_FILE_SIZE_MB,
    mode: str = "overwrite",
    dynamic_partitions: bool = False,
    bloom_filter_cols: list[str] | None = None,
    bloom_filter_ndv: int | None = None,
) -> None:
    """Partitioned parquet sink with single-pass adaptive file sizing
    (S3-S6).  Instead of the reference's write → S3 size probe → coalesce →
    rewrite (etl2_advclean_and_dimcreatin.py:285-315, two full passes over
    the fact table), we estimate bytes from the optimizer's plan statistics
    and coalesce the final stage to the target file count — one pass,
    still ~target_mb files. At cluster scale the double write is the
    difference between 1x and 2x the job's I/O. (coalesce narrows only the
    post-shuffle stage; upstream stages keep their parallelism.)

    ``bloom_filter_cols`` (r9): write parquet BLOOM FILTERS for the
    named columns (`parquet.bloom.filter.enabled#col` writer options —
    standard parquet-mr metadata, readable by any engine). At 100 TB
    this is the point-lookup complement to Z-ordering: min/max row-group
    stats prune RANGE predicates but do nothing for selective equality
    probes on high-cardinality keys scattered through every row group
    (doc ids, URL hashes, join keys on the probe side of an incremental
    anti-join); a bloom filter skips row groups the key cannot be in.
    ``bloom_filter_ndv`` sizes them (expected distinct values per row
    group) — parquet-mr derives the bitset size from it."""
    total_bytes = estimate_plan_bytes(df)
    n_files = target_file_count(total_bytes, target_mb) if total_bytes > 0 else 1
    # coalesce is shuffle-free and a no-op when the plan already has fewer
    # partitions, so it can be applied unconditionally. Deliberately NOT
    # consulting df.rdd.getNumPartitions(): under AQE that call
    # materializes every upstream stage — a full extra execution of the
    # plan, the very double-pass this writer exists to avoid.
    df = df.coalesce(n_files)
    writer = df.write.mode(mode)
    if dynamic_partitions:
        # Dynamic partition overwrite, scoped to THIS write (a writer
        # option, not a session conf): only partitions present in df are
        # replaced; sibling partitions' files are left untouched. The
        # incremental-run primitive (jobs.py --year/--month).
        writer = writer.option("partitionOverwriteMode", "dynamic")
    for col in bloom_filter_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
        if bloom_filter_ndv:
            writer = writer.option(
                f"parquet.bloom.filter.expected.ndv#{col}",
                str(bloom_filter_ndv),
            )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    # Drop any stale leaf-file listing for this path from the session's
    # shared FileStatusCache: a reader created after an overwrite must
    # see the new files, not cached pre-overwrite names.
    df.sparkSession.catalog.refreshByPath(path)


ASIDE_SUFFIX = ".__old__"


def _partition_leaf_dirs(root: str, depth: int) -> list[str]:
    """Absolute paths of the ``k1=v1/k2=v2/...`` leaf partition dirs
    ``depth`` levels under ``root``."""
    import os

    paths = [root]
    for _ in range(depth):
        paths = [
            os.path.join(p, d)
            for p in paths
            for d in sorted(os.listdir(p))
            if "=" in d and os.path.isdir(os.path.join(p, d))
        ]
    return paths


def _is_local_path(path: str) -> bool:
    """True when ``path`` is a plain local filesystem path (no scheme, or
    an explicit file:// scheme)."""
    from urllib.parse import urlparse

    scheme = urlparse(path).scheme
    return scheme in ("", "file")


def _leaf_data_files(spark, root: str, depth: int) -> dict[str, list[tuple[str, int]]]:
    """``{leaf_dir: [(file_name, size_bytes), ...]}`` for every
    ``k1=v1/.../kN=vN`` partition leaf under ``root``, data files only
    (dot/underscore-prefixed names excluded).

    Local paths take the cheap os.listdir walk; any other scheme
    (s3a://, hdfs://, abfss://, gs://...) goes through the JVM Hadoop
    FileSystem API, so size-based maintenance like compact_partitions
    works against object stores with no code change. Both paths return
    leaves sorted by path for deterministic iteration."""
    import os

    if _is_local_path(root):
        out = {}
        for leaf in _partition_leaf_dirs(root, depth):
            out[leaf] = sorted(
                (f, os.path.getsize(os.path.join(leaf, f)))
                for f in os.listdir(leaf)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
        return out
    return _hadoop_leaf_data_files(spark, root, depth)


def _hadoop_leaf_data_files(
    spark, root: str, depth: int
) -> dict[str, list[tuple[str, int]]]:
    """Hadoop-FileSystem implementation of ``_leaf_data_files`` — one
    listStatus per directory level, no local-FS assumptions. Also usable
    directly on local paths (Hadoop's file:// scheme) for tests."""
    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(root)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    leaves = [jroot]
    for _ in range(depth):
        nxt = []
        for p in leaves:
            for st in fs.listStatus(p):
                if st.isDirectory() and "=" in st.getPath().getName():
                    nxt.append(st.getPath())
        leaves = sorted(nxt, key=lambda p: p.toString())
    out = {}
    for leaf in leaves:
        files = sorted(
            (st.getPath().getName(), int(st.getLen()))
            for st in fs.listStatus(leaf)
            if st.isFile()
            and st.getPath().getName().endswith(".parquet")
            and not st.getPath().getName().startswith((".", "_"))
        )
        out[leaf.toString()] = files
    return out


def _recover_asides(path: str) -> None:
    """Finish any swap a previous process died in the middle of: for
    every ``X.__old__`` aside under ``path`` (or ``path`` itself), if the
    primary is missing the aside IS the data — restore it; if the primary
    exists the swap completed — drop the aside."""
    import os
    import shutil

    aside = path.rstrip("/") + ASIDE_SUFFIX
    if os.path.isdir(aside):
        if os.path.isdir(path):
            shutil.rmtree(aside, ignore_errors=True)
        else:
            os.replace(aside, path)
    if not os.path.isdir(path):
        return
    for dirpath, dirs, _files in os.walk(path):
        for d in list(dirs):
            if d.endswith(ASIDE_SUFFIX):
                primary = os.path.join(dirpath, d[: -len(ASIDE_SUFFIX)])
                stale = os.path.join(dirpath, d)
                if os.path.isdir(primary):
                    shutil.rmtree(stale, ignore_errors=True)
                else:
                    os.replace(stale, primary)
                dirs.remove(d)


def table_exists(path: str) -> bool:
    """Whether a (possibly mid-swap-crashed) table exists at ``path``.
    Runs aside recovery first, so callers deciding between 'merge into
    existing' and 'fresh write' never mistake a crashed swap for an
    absent table (which would silently discard the old rows)."""
    import os

    _recover_asides(path)
    return os.path.isdir(path)


def replace_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    target_mb: float = TARGET_FILE_SIZE_MB,
) -> None:
    """Rewrite ONLY the partition directories present in ``df``, leaving
    sibling partitions' files physically untouched — and, unlike a plain
    dynamic-overwrite, safe when ``df``'s plan READS from ``path`` (the
    merge-into-own-table shape Spark's file source refuses to overwrite):
    the frame is fully materialized into a side directory first, then the
    affected leaf dirs are swapped in.

    Crash-safe: a leaf's old copy is moved ASIDE (never deleted) before
    its replacement moves in, and asides are recovered on the next call
    (``_recover_asides``) — at no instant does a partition have zero
    copies on disk. On a failed swap the staging directory is left in
    place for inspection; the next invocation clears it.

    This is the portable stand-in for a lakehouse MERGE INTO + snapshot
    commit (Delta/Iceberg): on a cluster/object store the same shape is
    an output-committer rename; swap this for MERGE INTO when a table
    format is available and keep the call sites."""
    import os
    import shutil

    _recover_asides(path)
    staging = path.rstrip("/") + ".__incoming__"
    shutil.rmtree(staging, ignore_errors=True)
    write_parquet(df, staging, partition_by=partition_by, target_mb=target_mb)
    for leaf in _partition_leaf_dirs(staging, len(partition_by)):
        rel = os.path.relpath(leaf, staging)
        dest = os.path.join(path, rel)
        aside = dest + ASIDE_SUFFIX
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if os.path.isdir(dest):
            os.replace(dest, aside)
        os.replace(leaf, dest)
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    df.sparkSession.catalog.refreshByPath(path)


def replace_parquet(
    df: DataFrame,
    path: str,
    target_mb: float = TARGET_FILE_SIZE_MB,
) -> None:
    """Full-table overwrite that is safe when ``df`` reads from ``path``
    (e.g. merging new dim rows into the existing dim): materialize to a
    side directory, move the old table ASIDE (never rmtree the only
    copy), move the new one in, then drop the aside — a crash at any
    point leaves at least one full copy, which ``_recover_asides`` (run
    by table_exists/replace_* on the next invocation) restores."""
    import os
    import shutil

    _recover_asides(path)
    staging = path.rstrip("/") + ".__incoming__"
    aside = path.rstrip("/") + ASIDE_SUFFIX
    shutil.rmtree(staging, ignore_errors=True)
    write_parquet(df, staging, target_mb=target_mb)
    if os.path.isdir(path):
        os.replace(path, aside)
    os.replace(staging, path)
    shutil.rmtree(aside, ignore_errors=True)
    df.sparkSession.catalog.refreshByPath(path)


def delete_stale_keys(
    spark,
    path: str,
    partition_by: list[str],
    canonical_pred,
    keys: DataFrame,
    key_cols: list[str],
    order_by: list[str] | None = None,
) -> None:
    """After a partition-scoped write touched ``keys``, restore the
    table's one-row-per-key grain: a re-registered key that moved
    partitions left a row behind in its old partition.

    With ``order_by`` (recency columns, e.g. the same ones the table's
    keep-latest merge orders by), the KEY'S NEWEST ROW WINS regardless of
    which run wrote it: per key, the single max-recency row across the
    whole table survives (ties broken toward the ``canonical_pred``
    partitions — updates beat current, matching ``merge_upsert`` — then
    by partition values for determinism) and every other copy is
    scrubbed, including a just-written canonical row that an OLDER
    backfill produced for a key whose newer re-registration lives in a
    later partition. Out-of-order ``--year/--month`` runs are therefore
    safe: a backfill can never delete a newer row.

    Without ``order_by`` the behavior is last-RUN-wins (the canonical
    partitions are the truth and every outside row is scrubbed) — only
    correct when scoped runs are issued in chronological order.

    Only partitions actually holding losing rows are rewritten (found
    with a column-pruned probe join); a partition emptied entirely is
    dropped."""
    import os
    import shutil

    from pyspark.sql import functions as F

    if not table_exists(path):
        return
    current = spark.read.parquet(path)
    if order_by is None:
        losers = current.filter(~canonical_pred).join(keys, key_cols)
    else:
        # Total order per key: recency, then canonical-side flag (the
        # fresh write wins exact-recency ties), then partition values.
        rec = F.struct(
            *[F.col(c) for c in order_by],
            canonical_pred.cast("int").alias("__canon"),
            *[F.col(c) for c in partition_by],
        )
        keyed = current.join(keys, key_cols).withColumn("__rec", rec)
        winners = keyed.groupBy(*key_cols).agg(F.max("__rec").alias("__win"))
        losers = (
            keyed.join(winners, key_cols)
            .filter(F.col("__rec") != F.col("__win"))
            .drop("__rec", "__win")
        )
    stale_parts = sorted(
        tuple(r[c] for c in partition_by)
        for r in losers.select(*partition_by).distinct().collect()
    )
    if not stale_parts:
        return
    pred = None
    for part in stale_parts:
        clause = None
        for c, v in zip(partition_by, part):
            cl = F.col(c) == v
            clause = cl if clause is None else clause & cl
        pred = clause if pred is None else pred | clause
    scoped = current.filter(pred)
    if order_by is None:
        remaining = scoped.join(keys, key_cols, "left_anti")
    else:
        # Keep a row iff its key is untouched or it IS the key's winner
        # (__rec includes the partition values, so equality identifies
        # exactly one surviving copy).
        rec = F.struct(
            *[F.col(c) for c in order_by],
            canonical_pred.cast("int").alias("__canon"),
            *[F.col(c) for c in partition_by],
        )
        remaining = (
            scoped.withColumn("__rec", rec)
            .join(winners, key_cols, "left")
            .filter(F.col("__win").isNull() | (F.col("__rec") == F.col("__win")))
            .drop("__rec", "__win")
        )
    remaining = remaining.persist()
    remaining_parts = {
        tuple(r[c] for c in partition_by)
        for r in remaining.select(*partition_by).distinct().collect()
    }
    replace_partitions(remaining, path, partition_by=partition_by)
    for part in stale_parts:
        if part not in remaining_parts:
            leaf = os.path.join(
                path, *[f"{c}={v}" for c, v in zip(partition_by, part)]
            )
            shutil.rmtree(leaf, ignore_errors=True)
    remaining.unpersist()
    spark.catalog.refreshByPath(path)


def crowded_partitions(
    spark,
    path: str,
    partition_by: list[str],
    max_files_per_partition: int = 4,
    target_mb: float = TARGET_FILE_SIZE_MB,
) -> list[str]:
    """Leaf partition directories that need compaction: more than
    ``max_files_per_partition`` data files AND at least two below half
    the target size (a partition of target-sized files is converged —
    rewriting it would emit the same count again). Listing is
    scheme-aware (_leaf_data_files), so this probe runs unchanged
    against object stores; it is the discovery half of
    compact_partitions, exposed separately so lakehouse deployments can
    feed it to their own rewrite."""
    half_target = target_mb * 1024 * 1024 / 2
    crowded = []
    for leaf, files in _leaf_data_files(spark, path, len(partition_by)).items():
        sizes = [size for _name, size in files]
        if len(sizes) > max_files_per_partition and sum(
            1 for s in sizes if s < half_target
        ) >= 2:
            crowded.append(leaf)
    return crowded


def compact_partitions(
    spark,
    path: str,
    partition_by: list[str],
    max_files_per_partition: int = 4,
    target_mb: float = TARGET_FILE_SIZE_MB,
) -> int:
    """Small-file compaction — the maintenance pass every continuously
    ingested table needs (micro-batch merges and incremental runs leave
    a few files per touch; object-store scans degrade with file count).

    A partition is compacted when it holds more than
    ``max_files_per_partition`` data files AND at least two of them are
    below half the target size — a partition of target-sized files is
    already converged and is never futilely rewritten (the writer would
    emit the same count again). Each crowded partition is rewritten
    INDIVIDUALLY — read via its leaf directory with ``basePath`` (no
    re-parsing of escaped partition values or null sentinels out of dir
    names; Spark resolves the partition columns itself) and re-sized by
    the adaptive writer from that partition's own stats — through the
    same crash-safe swap as every write. Untouched partitions keep their
    files byte-identical. Returns the number of partitions compacted.

    Portability boundary, stated exactly: DISCOVERY (existence check +
    crowded-partition probe) is object-store-portable — non-local
    schemes (s3a://, hdfs://, ...) go through the JVM Hadoop FileSystem
    for both — but the REWRITE goes through replace_partitions' rename-
    based crash-safe swap, which needs a rename-capable filesystem. On
    an object store, call ``crowded_partitions`` directly and hand the
    leaves to a table-format rewrite (OPTIMIZE / rewrite_data_files) —
    that commit IS the swap there."""
    from urllib.parse import urlparse

    # The guard parses the scheme directly (not via _is_local_path, which
    # tests monkeypatch to force the Hadoop LISTING branch): the probe is
    # portable, but the rewrite below is rename-based — running it
    # against an object store would write a full .__incoming__ copy and
    # then crash in the local-FS swap, orphaning the copy. Fail fast
    # BEFORE any write instead of after an expensive half-rewrite.
    if urlparse(path).scheme not in ("", "file"):
        raise ValueError(
            f"compact_partitions' rewrite needs a rename-capable filesystem; "
            f"got {path!r}. Use crowded_partitions() for discovery and a "
            f"table-format rewrite (OPTIMIZE / rewrite_data_files) there."
        )
    if not table_exists(path):
        return 0
    crowded = crowded_partitions(
        spark, path, partition_by, max_files_per_partition, target_mb
    )
    for leaf in crowded:
        rewrite = spark.read.option("basePath", path).parquet(leaf)
        replace_partitions(
            rewrite, path, partition_by=partition_by, target_mb=target_mb
        )
    return len(crowded)
