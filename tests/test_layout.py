"""Z-order layout: Morton key bit math, determinism, and the actual
data-skipping win (per-file min/max stats prune on BOTH dimensions)."""

from __future__ import annotations

from kgraph_spark.operators.layout import file_stats, write_zordered, zorder_key


def test_zorder_key_hand_interleave(spark):
    # bits=2, bounds (0,3): q == x. Morton of (x,y) with x in even bit
    # positions, y in odd: z = x0 + 2*y0 + 4*x1 + 8*y1
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (2, 1)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["z_key"]
        for r in zorder_key(df, ["x", "y"], bits=2, bounds={"x": (0, 3), "y": (0, 3)}).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 3)] == 15
    assert got[(2, 1)] == 6  # x=10b: x1<<2 = 4; y=01b: y0<<1 = 2


def test_zorder_constant_column_contributes_zero(spark):
    df = spark.createDataFrame([(5, 9), (7, 9)], "x long, y long")
    got = zorder_key(df, ["x", "y"], bits=4).collect()
    # y constant -> only x bits; x spans (5,7): q(5)=0, q(7)=15
    by_x = {r["x"]: r["z_key"] for r in got}
    assert by_x[5] == 0
    assert by_x[7] == sum(1 << (2 * b) for b in range(4))


def test_zorder_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError):
        zorder_key(df, [])


def test_zordered_layout_prunes_both_dimensions(spark, tmp_path):
    # 64x64 grid of (a, b) points; z-ordered into 16 files. A point
    # predicate on EITHER dimension must prune most files by min/max
    # stats; a time-ordered (row_number) layout prunes only its sort col.
    rows = [(i % 64, i // 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "a long, b long")
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["a", "b"], n_files=16, bits=6)
    stats = file_stats(spark, zpath, ["a", "b"]).collect()
    assert len(stats) == 16

    def files_covering(col, v):
        return sum(1 for r in stats if r[f"min_{col}"] <= v <= r[f"max_{col}"])

    # each dimension: a point value should touch at most half the files
    for v in (0, 17, 42, 63):
        assert files_covering("a", v) <= 8, f"a={v} covers too many files"
        assert files_covering("b", v) <= 8, f"b={v} covers too many files"

    # baseline: laid out by a alone, every file spans ALL of b
    lpath = str(tmp_path / "linear")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(lpath)
    lstats = file_stats(spark, lpath, ["a", "b"]).collect()
    full_b = sum(1 for r in lstats if r["min_b"] == 0 and r["max_b"] == 63)
    assert full_b == len(lstats)


def test_zorder_key_partitioning_invariant(spark):
    df = spark.range(500).selectExpr("id AS x", "(id * 7) % 500 AS y")
    a = {r["x"]: r["z_key"] for r in zorder_key(df.repartition(7), ["x", "y"]).collect()}
    b = {r["x"]: r["z_key"] for r in zorder_key(df.coalesce(1), ["x", "y"]).collect()}
    assert a == b


def test_compaction_plan_bins_and_singletons(spark):
    from kgraph_spark.operators.layout import compaction_plan

    import pytest
    from pyspark.sql import functions as F

    files = spark.createDataFrame(
        [("a", 40), ("b", 40), ("c", 40), ("d", 150), ("e", 10), ("f", 0)],
        "path string, size_bytes long",
    )
    rows = {r["path"]: r for r in compaction_plan(files, target_bytes=100).collect()}
    assert "f" not in rows  # zero-size dropped
    # cum: a40 b80 c120 d270 e280 -> bins (cum-1)//100: 0,0,1,2,2
    assert rows["a"]["bin"] == 0 and rows["b"]["bin"] == 0
    assert rows["c"]["bin"] == 1
    assert rows["d"]["bin"] == 2 and rows["e"]["bin"] == 2
    assert rows["a"]["n_files_in_bin"] == 2 and rows["a"]["bin_bytes"] == 80
    assert rows["c"]["n_files_in_bin"] == 1  # singleton: skip rewrite
    with pytest.raises(ValueError):
        compaction_plan(files, target_bytes=0)


def test_zonemap_prune_clustered_beats_arrival(spark):
    from kgraph_spark.operators.layout import zonemap_prune_stats

    # 32 rows, arrival order scatters values ((i*13) % 32); clustered
    # zones partition [0..31] into 4 tight files of 8
    rows = [(i, float((i * 13) % 32)) for i in range(1, 33)]
    df = spark.createDataFrame(rows, "ord long, v double")
    out = {(r["layout"], r["band_lo"]): r for r in zonemap_prune_stats(
        df, "ord", "v", n_files=4, bands=[(10.0, 12.0)]).collect()}
    assert out[("clustered", 1000)]["files_scanned"] == 1
    assert out[("arrival", 1000)]["files_scanned"] == 4
    assert out[("clustered", 1000)]["scan_micro"] == 250_000
