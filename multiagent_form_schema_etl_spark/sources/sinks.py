"""Stage sinks (SURVEY.md §2.1 K1/K2/K4).

The reference snapshots every pipeline phase to JSON (main.py:154-208) and
writes final forms + eval reports (main.py:212-221,419-425). The engine
analog: partitioned parquet stage sinks for data (columnar, splittable,
predicate-pushable on re-read) and JSON only for small human-facing outputs
(final form rows, eval reports) -- never for fact-scale data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_stage(df: DataFrame, out_dir: str, stage: str,
                partition_by: list[str] | None = None) -> str:
    """K2: one pipeline-stage snapshot. Parquet, overwrite-idempotent, and
    optionally partitioned (doc_id-range / date partitioning at scale)."""
    path = os.path.join(out_dir, stage)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def write_final_json(df: DataFrame, out_dir: str, name: str) -> str:
    """K1/K4: small human-facing output (final forms, eval results) as one
    JSON file. coalesce(1) is deliberate and only valid because these
    outputs are tiny aggregates."""
    path = os.path.join(out_dir, name)
    # Explicit nulls: the reference's json.dump writes null-valued fields
    # (main.py:212-221); Spark's writer drops them unless told otherwise.
    (df.coalesce(1).write.mode("overwrite")
     .option("ignoreNullFields", "false").json(path))
    return path


def write_layout_optimized(df: DataFrame, out_dir: str, stage: str,
                           range_key: str, n_files: int,
                           sort_keys: list[str] | None = None,
                           max_records_per_file: int = 0) -> str:
    """Layout-aware parquet sink: the write-side lever for read performance
    at 100 TB.

    Three knobs, applied together:

    - ``repartitionByRange(n_files, range_key)`` -- each output file covers
      a disjoint key range, so every file's parquet min/max statistics are
      NARROW on the range key and a point/range predicate on re-read prunes
      to O(1) files instead of scanning all of them. (Hash partitioning
      spreads every key range over every file -- min/max stats then span
      the whole domain and prune nothing.)
    - ``sortWithinPartitions`` -- rows inside each file are ordered, so
      parquet page-level (column index) stats prune within the file too,
      and run-length/dictionary encodings compress better.
    - ``maxRecordsPerFile`` -- caps file size so one hot range cannot
      produce a multi-GB file (the write-side analog of AQE skew
      splitting); 0 = no cap. n_files controls the opposite failure: too
      many small files (name-node pressure, per-file open cost).

    Returns the output path. Re-read prunability is asserted in
    tests/test_sources_sinks.py by checking per-file parquet footer
    min/max disjointness."""
    path = os.path.join(out_dir, stage)
    out = df.repartitionByRange(n_files, range_key)
    out = out.sortWithinPartitions(*(sort_keys or [range_key]))
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)
    return path


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16,
               quantile: bool = False):
    """Morton (Z-order) interleave of 2-3 numeric columns as a JVM-side
    Column expression.

    Range layout (write_layout_optimized) buys min/max pruning on ONE key;
    a second predicate column gets full-domain stats and prunes nothing.
    Z-order trades a little prunability on the primary key for prunability
    on EVERY interleaved key: each column is scaled to a ``bits``-bit grid
    cell and the cell coordinates' bits are interleaved, so files covering
    a contiguous Z-range cover a bounded rectangle in every dimension --
    per-file min/max stats are narrow on all interleaved columns at once
    (the Delta/Iceberg OPTIMIZE ZORDER layout, rebuilt from public
    first principles with plain bitwise expressions).

    Scaling uses min/max uniform buckets by default (one tiny agg to the
    driver -- 2 scalars per column). ``quantile=True`` substitutes
    approx-quantile cut points for the uniform grid: on a skewed column a
    uniform grid collapses the dense region into one cell, so the files
    covering that cell carry wide min/max stats exactly where the probes
    land; equi-depth cells keep every cell's value range narrow in
    proportion to its data share. Cut points are one approx_percentile
    agg (KB-sized driver array, broadcast back as a literal); the per-row
    bucket lookup is size(filter(cuts, c -> c <= x)) -- a bounded in-
    register scan, still fully inside codegen. All per-row work is
    shift/and/or expressions -- no UDFs, no shuffle beyond the write's
    own repartition."""
    from pyspark.sql import functions as F

    n = len(cols)
    if not 2 <= n <= 3:
        raise ValueError("zorder_key interleaves 2 or 3 columns")
    if bits * n > 62:
        raise ValueError("bits * len(cols) must fit in a signed long")
    top = (1 << bits) - 1
    cells: list = []
    if quantile:
        if bits > 10:
            # cut-point count (and the per-row bounded scan) is 2^bits;
            # equi-depth cells don't need 16-bit resolution to fix skew
            raise ValueError("quantile cells: use bits <= 10 (per-row "
                             "lookup scans 2^bits cut points)")
        probs = [i / (top + 1) for i in range(1, top + 1)]
        cuts_rows = df.agg(*[
            F.percentile_approx(F.col(c).cast("double"), F.lit(probs),
                                F.lit(10000)).alias(f"q{i}")
            for i, c in enumerate(cols)]).first()
        for j, c in enumerate(cols):
            qcuts = cuts_rows[f"q{j}"]
            if qcuts is None:  # entirely-NULL column: constant cell 0
                cells.append(F.lit(0).cast("long"))
                continue
            cuts = F.lit([float(v) for v in qcuts])
            # NULL values yield an all-NULL filter predicate -> empty
            # array -> cell 0 (grouped with the low range, never NULL)
            cells.append(F.size(F.filter(
                cuts, lambda cut: cut <= F.col(c).cast("double")))
                .cast("long"))
    else:
        stats = df.agg(
            *[F.min(c).cast("double").alias(f"mn{i}")
              for i, c in enumerate(cols)],
            *[F.max(c).cast("double").alias(f"mx{i}")
              for i, c in enumerate(cols)],
        ).first()
        for j, c in enumerate(cols):
            mn, mx = stats[f"mn{j}"], stats[f"mx{j}"]
            if mn is None or mx is None:  # entirely-NULL column
                cells.append(F.lit(0).cast("long"))
                continue
            span = (mx - mn) or 1.0
            # NULL values coalesce to the min cell instead of nulling the
            # whole interleaved key (which silently clumped those rows
            # into one range partition, ADVICE r2)
            v = F.coalesce(F.col(c).cast("double"), F.lit(mn))
            cell = F.floor((v - F.lit(mn))
                           / F.lit(span) * F.lit(float(top))).cast("long")
            cells.append(F.least(F.greatest(cell, F.lit(0)), F.lit(top)))
    z = F.lit(0).cast("long")
    for j, cell in enumerate(cells):
        # bit i of this column's cell lands at interleaved position i*n + j
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cell, i).bitwiseAND(F.lit(1)),
                            i * n + j))
    return z


def write_zorder(df: DataFrame, out_dir: str, stage: str, cols: list[str],
                 n_files: int, bits: int = 16, quantile: bool = False,
                 max_records_per_file: int = 0) -> str:
    """Multi-column data-skipping layout: range-partition + in-file sort on
    the Morton key of ``cols``, so parquet min/max stats prune point/range
    predicates on ANY of the interleaved columns (see zorder_key). The
    transient __zkey column is dropped before the write; prunability is
    asserted in tests/test_sources_sinks.py against a single-key range
    layout of the same data."""
    path = os.path.join(out_dir, stage)
    keyed = df.withColumn("__zkey", zorder_key(df, cols, bits, quantile))
    out = (keyed.repartitionByRange(n_files, "__zkey")
           .sortWithinPartitions("__zkey").drop("__zkey"))
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)
    return path


def compact_stage(spark, out_dir: str, stage: str, n_files: int,
                  range_key: str | None = None) -> str:
    """Small-files compaction: rewrite a stage directory into ``n_files``
    right-sized parquet files, optionally range-laid-out on ``range_key``
    (then the rewrite also buys min/max prunability, see
    write_layout_optimized).

    The operational half of the file-size story at 100 TB: streaming
    foreachBatch sinks and fine-grained partitioned writes accumulate
    thousands of KB-sized files per stage (per-file open cost dominates
    re-reads; file listings strain the namenode). Compaction is one
    read → repartition → write; the rewrite lands in a sibling directory
    and replaces the stage only after the write committed. The two-rename
    swap has a small non-atomic window (two directories cannot be
    exchanged atomically on a generic filesystem); a crash inside it is
    self-healed on the next call: a stranded __precompact with no live
    stage is renamed back, and stale scratch/backup directories from any
    earlier crash are cleared before new work starts. Source data is never
    destructively touched until its replacement is fully committed."""
    import shutil

    src = os.path.join(out_dir, stage)
    tmp = src + "__compacting"
    old = src + "__precompact"
    # self-heal a previous crash: mid-swap (src gone, backup present) or
    # leftover scratch/backup dirs from an interrupted run
    if not os.path.exists(src) and os.path.exists(old):
        os.rename(old, src)
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    df = spark.read.parquet(src)
    out = (df.repartitionByRange(n_files, range_key).sortWithinPartitions(range_key)
           if range_key else df.repartition(n_files))
    out.write.mode("overwrite").parquet(tmp)
    os.rename(src, old)
    os.rename(tmp, src)
    shutil.rmtree(old)
    return src


def overwrite_partitions(df: DataFrame, out_dir: str, stage: str,
                         partition_by: list[str]) -> str:
    """Backfill write: replace ONLY the partitions present in ``df``,
    leaving every other partition of the stage untouched (dynamic
    partition-overwrite mode, scoped to this single write).

    The operational pattern behind reprocessing one bad day / one source
    out of a date- or source-partitioned 100 TB stage: a full-stage
    overwrite would rewrite everything (and delete partitions the batch
    does not carry); append would duplicate. Dynamic mode diffs at commit
    time against the partitions the job actually produced."""
    path = os.path.join(out_dir, stage)
    (df.write.mode("overwrite")
       .option("partitionOverwriteMode", "dynamic")
       .partitionBy(*partition_by)
       .parquet(path))
    return path


def read_stage(spark, out_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, stage))


def publish_stage(df: DataFrame, out_dir: str, stage: str) -> int:
    """Versioned publish with an atomic snapshot pointer -- the
    table-format core (Delta/Iceberg-style, rebuilt from first principles
    on plain parquet + a manifest file):

    - every publish writes a NEW immutable version directory
      (``stage/v=N``); existing data is never rewritten or touched, so a
      failed write can never corrupt what readers see;
    - the current-version pointer (``stage/_LATEST``) flips via
      write-to-temp + ``os.rename`` -- atomic on POSIX, so every reader
      sees either the old or the new version, never a mix (per-file
      parquet commits cannot give cross-file atomicity; the pointer can);
    - old versions remain readable (``read_stage_version``) until
      explicitly vacuumed -- time travel for audits/repro, and instant
      rollback is just rewriting the pointer to an older N.

    Returns the published version number."""
    root = os.path.join(out_dir, stage)
    os.makedirs(root, exist_ok=True)
    versions = [int(d.split("=", 1)[1]) for d in os.listdir(root)
                if d.startswith("v=")]
    n = max(versions, default=-1) + 1
    df.write.mode("errorifexists").parquet(os.path.join(root, f"v={n}"))
    tmp = os.path.join(root, "_LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(str(n))
    os.rename(tmp, os.path.join(root, "_LATEST"))
    return n


def publish_stage_audited(df: DataFrame, out_dir: str, stage: str,
                          audits: "dict[str, callable]") -> tuple[int, dict]:
    """Write-audit-publish: stage the new version's data, AUDIT the
    actually-written files, and only then flip the snapshot pointer --
    readers can never observe data that failed its checks.

    ``audits`` maps audit name -> callable(DataFrame) -> bool, evaluated
    against a re-read of the written version directory (auditing the real
    files catches writer truncation/corruption, not just the logical
    plan). All pass -> the pointer flips atomically (see publish_stage)
    and the new version number is returned. Any fail -> the pointer is
    untouched (readers keep the previous snapshot), the quarantined
    version directory stays on disk for forensics under ``v=N`` with a
    ``_QUARANTINED`` marker, and the per-audit results come back for the
    caller's alerting. Returns (version, {audit: bool}) -- version is the
    new N on success, the still-live previous version on failure."""
    root = os.path.join(out_dir, stage)
    os.makedirs(root, exist_ok=True)
    versions = [int(d.split("=", 1)[1]) for d in os.listdir(root)
                if d.startswith("v=")]
    n = max(versions, default=-1) + 1
    vdir = os.path.join(root, f"v={n}")
    df.write.mode("errorifexists").parquet(vdir)
    written = df.sparkSession.read.parquet(vdir)
    results = {name: bool(check(written)) for name, check in audits.items()}
    if all(results.values()):
        tmp = os.path.join(root, "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(str(n))
        os.rename(tmp, os.path.join(root, "_LATEST"))
        return n, results
    with open(os.path.join(vdir, "_QUARANTINED"), "w") as f:
        f.write(",".join(sorted(a for a, ok in results.items() if not ok)))
    try:
        live = published_version(out_dir, stage)
    except FileNotFoundError:  # first-ever publish failed its audits
        live = -1
    return live, results


def published_version(out_dir: str, stage: str) -> int:
    with open(os.path.join(out_dir, stage, "_LATEST")) as f:
        return int(f.read().strip())


def read_stage_version(spark, out_dir: str, stage: str,
                       version: int | None = None) -> DataFrame:
    """Read the published snapshot (default: current pointer), or any
    still-present historical version for time travel."""
    n = published_version(out_dir, stage) if version is None else version
    return spark.read.parquet(os.path.join(out_dir, stage, f"v={n}"))


def rollback_stage(out_dir: str, stage: str, version: int) -> None:
    """Flip the snapshot pointer back to ``version`` (atomic rename, same
    guarantee as publish). The bad version's data stays on disk for
    forensics until vacuumed."""
    root = os.path.join(out_dir, stage)
    if not os.path.isdir(os.path.join(root, f"v={version}")):
        raise FileNotFoundError(f"no such version {version} in {root}")
    tmp = os.path.join(root, "_LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.rename(tmp, os.path.join(root, "_LATEST"))


def vacuum_stage(out_dir: str, stage: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` versions, never the one the
    pointer references. Returns the vacuumed version numbers."""
    import shutil

    root = os.path.join(out_dir, stage)
    current = published_version(out_dir, stage)
    versions = sorted(int(d.split("=", 1)[1]) for d in os.listdir(root)
                      if d.startswith("v="))
    doomed = [v for v in versions[:-keep] if v != current] if keep else \
             [v for v in versions if v != current]
    for v in doomed:
        shutil.rmtree(os.path.join(root, f"v={v}"))
    return doomed
