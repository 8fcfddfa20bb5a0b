"""Data layout for multi-dimensional skipping: Z-ORDER (Morton) keys.

At 100 TB the cheapest scan is the one that never reads the file: parquet
(and Iceberg/Delta) keep per-file column min/max, and a range-clustered
layout makes those stats selective. A single-column sort only helps
predicates on that column; interleaving the bits of SEVERAL quantized
columns (the Morton curve) keeps files narrow in EVERY interleaved
dimension at once — the same technique Delta OPTIMIZE ZORDER BY and
Iceberg's z-ordered rewrites apply. This module builds the key with pure
JVM integer expressions (no UDF) and writes with repartitionByRange +
sortWithinPartitions, so the only data movement is one range exchange.

Determinism discipline: quantization is EXACT integer arithmetic —
q = (x − lo) · (2^bits − 1) div (hi − lo) — and the bit interleave is a
fixed fold of shifts/masks, so the key (and therefore the layout and the
SQL oracle) is engine- and partitioning-identical. Bounds come either
from the caller (at scale: yesterday's table stats — one metadata read)
or from one tiny global min/max aggregate (2 longs per column)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple[int, int]] | None = None,
    key_name: str = "z_key",
) -> DataFrame:
    """Adds `key_name`: the Morton interleave of the `bits`-bit integer
    quantizations of `cols` (column i owns bit positions b·ncols+i).
    Columns must be integral (cast upstream; for floats, quantize to
    fixed-point first — the repo-wide float stance). A constant column
    quantizes to 0 everywhere. bits·len(cols) must fit a long (≤ 62)."""
    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    if bits * n > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    if bounds is None:
        row = df.agg(
            *[F.min(c).cast("long").alias(f"_lo{i}") for i, c in enumerate(cols)],
            *[F.max(c).cast("long").alias(f"_hi{i}") for i, c in enumerate(cols)],
        ).collect()[0]
        bounds = {c: (row[f"_lo{i}"], row[f"_hi{i}"]) for i, c in enumerate(cols)}
    qmax = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo, hi = bounds[c]
        if hi == lo:
            continue  # constant column: contributes 0 bits
        # exact integer scaling; clamp keeps out-of-bounds rows legal
        q = F.expr(
            f"CAST(least(greatest(CAST({c} AS BIGINT) - {lo}L, 0L) * {qmax}L"
            f" div ({hi}L - {lo}L), {qmax}L) AS BIGINT)"
        )
        spread = F.lit(0).cast("long")
        for b in range(bits):
            spread = spread + F.expr(
                f"shiftleft(CAST(1 AS BIGINT), {b * n + i})"
            ) * F.shiftright(q, b).bitwiseAND(1)
        z = z + spread
    return df.withColumn(key_name, z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> None:
    """Range-cluster on the Morton key and write: ONE range exchange
    (repartitionByRange samples the key, so files are evenly sized even
    under key skew) + an in-partition sort that tightens per-page stats.
    The key column itself is dropped from the files — it's layout, not
    data; Iceberg's equivalent keeps it in metadata via a sort order."""
    keyed = zorder_key(df, cols, bits=bits, bounds=bounds)
    (
        keyed.repartitionByRange(n_files, F.col("z_key"))
        .sortWithinPartitions("z_key")
        .drop("z_key")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max of `cols` for a parquet directory — the exact
    numbers a stats-based pruner consults. Used by tests to PROVE the
    z-order layout skips: for a point predicate, a file prunes when the
    value falls outside its [min, max]."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    return df.groupBy("_f").agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
        F.count(F.lit(1)).alias("n_rows"),
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    id_col: str = "path",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Bin assignment for small-file compaction: lay the files end to end
    in deterministic id order and cut a bin every `target_bytes` —
    (id, size_bytes, bin, n_files_in_bin, bin_bytes). Bins with
    n_files_in_bin > 1 are rewrite groups (the Delta OPTIMIZE / Iceberg
    rewrite_data_files planning step); singleton bins are already at
    target and skip the rewrite. Linear packing is what the real tools do
    per partition — it preserves locality order (crucial after
    write_zordered: compacting ADJACENT z-ranges keeps file min/max tight,
    a size-sorted first-fit would destroy the clustering file_stats
    pruning relies on).

    Exact integers end to end: bin = (cumulative_bytes − 1) div target.
    Same two-phase distributed prefix sum as pps_systematic_sample (16
    md5-independent buckets? NO — order must be the id order, so the
    prefix sum runs per leading bucket of the id itself; with pathological
    id distributions pre-range-partition upstream). At real scale `files`
    is a metadata table (one row per file) — millions of rows, not data
    scale; a single window over it is already cheap."""
    if target_bytes < 1:
        raise ValueError("need target_bytes >= 1")
    from pyspark.sql import Window

    sized = files.select(
        F.col(id_col), F.col(size_col).cast("long").alias("size_bytes")
    ).filter(F.col("size_bytes") > 0)
    cum = sized.withColumn(
        "bin",
        F.expr(
            f"(sum(size_bytes) OVER (ORDER BY {id_col} ROWS BETWEEN UNBOUNDED"
            f" PRECEDING AND CURRENT ROW) - 1) div CAST({int(target_bytes)} AS BIGINT)"
        ).cast("long"),
    )
    per_bin = Window.partitionBy("bin")
    return cum.select(
        id_col,
        "size_bytes",
        "bin",
        F.count(F.lit(1)).over(per_bin).cast("long").alias("n_files_in_bin"),
        F.sum("size_bytes").over(per_bin).cast("long").alias("bin_bytes"),
    )


def zonemap_prune_stats(
    df: DataFrame,
    order_col: str,
    value_col: str,
    n_files: int = 16,
    bands: list[tuple[float, float]] | None = None,
    scale: int = 100,
) -> DataFrame:
    """Measure what a layout choice buys at the scan: split the table
    into n_files equal row-count files under TWO orders — `arrival`
    (the ingest order, order_col) and `clustered` (sorted by
    value_col) — record each file's [min, max] zone map, and count how
    many files a range predicate on value_col must scan under each:
    (layout, band_lo, band_hi, files_total, files_scanned, scan_micro).
    The quantified companion to zorder_key/compaction_plan: 'sorting
    this column cuts predicate X's scan from 100% of files to 2'. Run
    it on a sample — the ntile is a total sort, an advisor cost, not a
    production operator (the kendall_tau bounded-input contract).

    Exact: values quantize to the grid; zone mins/maxes and overlap
    counts are exact integers; scan_micro is ONE division.

    Scale (of the ADVISED layout, not the advisor): a file is scanned
    iff zone_max ≥ lo AND zone_min ≤ hi — precisely parquet row-group
    pruning; the operator exposes the arithmetic the engine applies."""
    from pyspark.sql import Window

    bands = bands or [(0.0, 10.0)]
    q = df.filter(F.col(value_col).isNotNull() & F.col(order_col).isNotNull()).select(
        F.col(order_col).alias("ord"),
        F.round(F.col(value_col) * scale, 0).cast("long").alias("qv"),
    )
    layouts = {
        "arrival": Window.orderBy("ord"),
        "clustered": Window.orderBy("qv", "ord"),
    }
    zones = None
    for name, w in layouts.items():
        z = (
            q.withColumn("f", F.ntile(n_files).over(w))
            .groupBy("f")
            .agg(F.min("qv").alias("zmin"), F.max("qv").alias("zmax"))
            .select(F.lit(name).alias("layout"), "zmin", "zmax")
        )
        zones = z if zones is None else zones.unionByName(z)
    bl = F.array(*[
        F.struct(
            F.lit(int(round(lo * scale))).cast("long").alias("blo"),
            F.lit(int(round(hi * scale))).cast("long").alias("bhi"),
        )
        for lo, hi in bands
    ])
    x = zones.select("layout", "zmin", "zmax", F.explode(bl).alias("b"))
    return x.groupBy("layout", F.col("b.blo").alias("band_lo"), F.col("b.bhi").alias("band_hi")).agg(
        F.count(F.lit(1)).cast("long").alias("files_total"),
        F.sum(
            ((F.col("zmax") >= F.col("b.blo")) & (F.col("zmin") <= F.col("b.bhi")))
            .cast("long")
        ).cast("long").alias("files_scanned"),
    ).select(
        "layout",
        "band_lo",
        "band_hi",
        "files_total",
        "files_scanned",
        F.round(
            F.col("files_scanned").cast("double") * F.lit(1_000_000.0)
            / F.col("files_total").cast("double"),
            0,
        ).cast("long").alias("scan_micro"),
    )
