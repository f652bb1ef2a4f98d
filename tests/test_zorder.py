"""Z-order layout: hand-pinned Morton codes + the data-skipping claim
(per-file bounding boxes must shrink on BOTH dimensions vs a
single-dimension sort layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.operators.zorder import (
    _interleave,
    zorder_layout,
)

SF_DIR = "/root/testdata/sf0.001"


def test_interleave_pinned_by_hand(spark):
    # qa=0b101 (bits → odd positions 1,3,5), qb=0b011 (even positions 0,2)
    # z = qa0<<1 | qa1<<3 | qa2<<5 | qb0<<0 | qb1<<2 | qb2<<4
    #   = (1<<1) + (0<<3) + (1<<5) + (1<<0) + (1<<2) + (0<<4) = 2+32+1+4 = 39
    df = spark.createDataFrame([(0b101, 0b011)], "qa long, qb long")
    z = df.select(
        _interleave(F.col("qa"), F.col("qb"), 3).alias("z")
    ).collect()[0]["z"]
    assert z == 39


def test_zvalue_is_bijective_on_grid(spark):
    """Every (qa, qb) grid cell maps to a distinct z-value (interleave is
    a bijection) — checked exhaustively on a 4-bit grid."""
    cells = spark.range(16).crossJoin(
        spark.range(16).withColumnRenamed("id", "id2")
    )
    n = cells.select(
        _interleave(F.col("id"), F.col("id2"), 4).alias("z")
    ).distinct().count()
    assert n == 256


def test_zorder_skips_files_on_both_dimensions(spark):
    """The point of the layout: a 1-D sort and a z-order produce the SAME
    mean bounding-box area (1/n_files), but the sort's boxes are pencils
    — tight in the sort key, full-range in the other dimension — while
    z-order's are squares.  The observable win is min-max file skipping
    under a selective predicate on EITHER dimension: count files whose
    [min, max] interval contains a probe value.  Under the custkey sort
    every file survives a price probe (16/16 scanned); under z-order only
    the files of one grid stripe do on each dimension."""
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    dims = orders.select(
        F.col("o_orderkey"), F.col("o_custkey").alias("a"), F.col("cents").alias("b")
    )
    n_files = 16

    z = zorder_layout(orders, "o_orderkey", "o_custkey", "cents", n_files=n_files)
    z_files = dims.join(z.select("o_orderkey", "file_id"), "o_orderkey")

    # single-dimension layout: files = equal row_number ranges of custkey sort
    from pyspark.sql import Window

    w = Window.orderBy("a", "o_orderkey")
    total = dims.count()
    sorted_files = dims.withColumn(
        "file_id",
        ((F.row_number().over(w) - 1) * n_files / F.lit(total)).cast("long"),
    )

    med = dims.approxQuantile(["a", "b"], [0.5], 0.0)
    probe_a, probe_b = med[0][0], med[1][0]

    def files_scanned(df, col, v) -> int:
        stats = df.groupBy("file_id").agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        )
        return stats.filter(
            (F.col("lo") <= v) & (F.col("hi") >= v)
        ).count()

    z_scan_a = files_scanned(z_files, "a", probe_a)
    z_scan_b = files_scanned(z_files, "b", probe_b)
    s_scan_a = files_scanned(sorted_files, "a", probe_a)
    s_scan_b = files_scanned(sorted_files, "b", probe_b)

    # the sort is pencil-shaped: a-probes are optimal, b-probes scan all
    assert s_scan_b >= n_files - 1, (s_scan_a, s_scan_b)
    # z-order: BOTH dimensions skip most files (one grid stripe each)
    assert z_scan_a <= n_files // 2, (z_scan_a, z_scan_b)
    assert z_scan_b <= n_files // 2, (z_scan_a, z_scan_b)
    # and the worst case across dimensions beats the sort's worst case
    assert max(z_scan_a, z_scan_b) < max(s_scan_a, s_scan_b)


def test_file_assignment_is_range_partitioning_of_z(spark):
    """file_id must be monotone in zval (a true range split) and use every
    file at fixture scale."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    z = zorder_layout(orders, "o_orderkey", "o_custkey", "cents", n_files=8)
    per_file = (
        z.groupBy("file_id")
        .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
        .orderBy("file_id")
        .collect()
    )
    assert len(per_file) >= 4  # fixture fills most of the range
    for prev, cur in zip(per_file, per_file[1:]):
        assert prev["hi"] <= cur["lo"]  # non-overlapping z ranges
