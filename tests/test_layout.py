"""Z-order layout (operators/layout.py): the locality WIN is the
contract — under the same bucket count, z-order bounds must be tight
in BOTH dimensions where a 1-D sort is tight in one and useless in the
other — plus the write path's per-file footer-bounds round-trip and
the validation errors."""

import pytest
from pyspark.sql import functions as F

from flink_kafka_spark.operators.layout import (
    write_zordered,
    zorder_key,
    zorder_locality,
)

N = 1 << 12  # 4096 rows over a 64x64 grid


def _grid(spark):
    # uniform 2-D grid: x = id div 64, y = id % 64 — every (x, y) once
    return spark.range(N).select(
        (F.col("id") / 64).cast("long").alias("x"),
        (F.col("id") % 64).cast("long").alias("y"),
    )


def _avg_extent(rows, col):
    exts = [r[f"max_{col}"] - r[f"min_{col}"] for r in rows]
    return sum(exts) / len(exts)


def test_zorder_bounds_tight_in_both_dims(spark):
    """64 z-buckets over a 64x64 grid: each bucket is an 8x8 tile, so
    per-bucket extent is ~7 in BOTH dims. The 1-D-sort baseline (same
    bucket count, sorted by x) gives extent 0 in x but the FULL range
    63 in y — the asymmetry z-order removes."""
    rows = zorder_locality(_grid(spark), ["x", "y"], bits=6, n_buckets=64).collect()
    assert len(rows) == 64
    assert sum(r["n_rows"] for r in rows) == N
    assert _avg_extent(rows, "x") <= 8
    assert _avg_extent(rows, "y") <= 8

    # 1-D baseline: bucket by x-rank (the sorted-file boundary)
    base = (
        _grid(spark)
        .groupBy((F.col("x") / 1).cast("long").alias("bucket"))
        .agg(
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .collect()
    )
    assert _avg_extent(base, "y") == 63  # full range: no skipping on y


def test_zorder_key_is_exact_morton(spark):
    """Spot-check the interleave against a Python reference on the
    grid (bounds are [0, 63] so scaling is identity at bits=6)."""
    out = {
        (r["x"], r["y"]): r["zkey"]
        for r in zorder_key(_grid(spark), ["x", "y"], bits=6).collect()
    }

    def morton(x, y):
        z = 0
        for b in range(6):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    for x, y in [(0, 0), (1, 0), (0, 1), (63, 63), (17, 42), (5, 60)]:
        assert out[(x, y)] == morton(x, y), (x, y)


def test_zorder_validation(spark):
    df = _grid(spark)
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key(df, ["x"])
    with pytest.raises(ValueError, match="overflows"):
        zorder_key(df, ["x", "y"], bits=32)


def test_write_zordered_files_carry_tight_bounds(spark, tmp_path):
    """The materialized layout: every written file's actual (x, y)
    bounds — what its parquet footer advertises — must cover a tight
    tile, so a range predicate on EITHER dimension prunes most files."""
    path = str(tmp_path / "z")
    write_zordered(_grid(spark), path, ["x", "y"], bits=6, n_files=16)
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("x").alias("min_x"), F.max("x").alias("max_x"),
            F.min("y").alias("min_y"), F.max("y").alias("max_y"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r["n"] for r in per_file) == N
    assert len(per_file) >= 8
    # 16 range-files over the 64x64 grid -> 16x16 tiles: extent <= 15
    # in both dims (vs 63 for a 1-D sorted write's second dimension)
    assert _avg_extent(per_file, "x") <= 16
    assert _avg_extent(per_file, "y") <= 16


def test_zorder_three_column_interleave(spark):
    """N=3 interleave: bit b of column c lands at b*3 + c — pinned
    against a Python reference on an 8x8x8 grid (bits=3, identity
    scaling), since the 2-D tests can't catch a stride bug."""
    df = spark.range(512).select(
        (F.col("id") / 64).cast("long").alias("x"),
        ((F.col("id") / 8) % 8).cast("long").alias("y"),
        (F.col("id") % 8).cast("long").alias("z"),
    )
    out = {
        (r["x"], r["y"], r["z"]): r["zkey"]
        for r in zorder_key(df, ["x", "y", "z"], bits=3).collect()
    }

    def morton3(x, y, z):
        m = 0
        for b in range(3):
            m |= ((x >> b) & 1) << (3 * b)
            m |= ((y >> b) & 1) << (3 * b + 1)
            m |= ((z >> b) & 1) << (3 * b + 2)
        return m

    for x, y, z in [(0, 0, 0), (7, 7, 7), (1, 2, 4), (5, 0, 3), (6, 6, 1)]:
        assert out[(x, y, z)] == morton3(x, y, z), (x, y, z)
    assert len(set(out.values())) == 512  # bijective on the full grid
