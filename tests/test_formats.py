"""Round-trip, pruning, and compaction tests for sources/formats.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.sources.formats import (
    compact_partitions,
    parquet_files,
    read_as,
    write_as,
    write_partitioned,
)
from etl_globalretail_spark.sources.readers import load_table


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_json_roundtrip_customer(spark, sf_dir, tmp_path):
    """customer survives CSV and JSON round-trips bit-identically under an
    explicit schema — including strings with embedded commas and doubles."""
    c = load_table(spark, "customer", sf_dir)
    for fmt in ("csv", "json", "orc"):
        p = str(tmp_path / f"cust_{fmt}")
        write_as(c, p, fmt)
        back = read_as(spark, p, fmt, c.schema)
        assert back.schema == c.schema
        assert _multiset(back) == _multiset(c)


def test_csv_quoting_edge_cases(spark, tmp_path):
    """Embedded delimiters, quotes, and newlines survive CSV quoting."""
    df = spark.createDataFrame(
        [(1, "a,b"), (2, 'say "hi"'), (3, "line1\nline2"), (4, "plain")],
        "id int, s string",
    )
    p = str(tmp_path / "tricky_csv")
    write_as(df, p, "csv")
    back = read_as(spark, p, "csv", df.schema)
    assert _multiset(back) == _multiset(df)


def test_csv_null_vs_empty_string(spark, tmp_path):
    """The NULL sentinel keeps NULL and '' distinct through CSV."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "id int, s string"
    )
    p = str(tmp_path / "nulls_csv")
    write_as(df, p, "csv")
    back = read_as(spark, p, "csv", df.schema)
    got = {r.id: r.s for r in back.collect()}
    assert got == {1: None, 2: "", 3: "x"}


def test_events_timestamp_roundtrip(spark, sf_dir, tmp_path):
    """Microsecond timestamps survive the CSV text round-trip."""
    e = load_table(spark, "events", sf_dir).select("event_id", "ts")
    p = str(tmp_path / "events_csv")
    write_as(e, p, "csv")
    back = read_as(spark, p, "csv", e.schema)
    assert _multiset(back) == _multiset(e)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """A predicate on the partition column becomes a PartitionFilter —
    non-matching directories are never read — and counts stay correct."""
    o = load_table(spark, "orders", sf_dir).withColumn(
        "ano", F.year("o_orderdate")
    )
    p = str(tmp_path / "orders_by_year")
    write_partitioned(o, p, ["ano"])

    back = spark.read.parquet(p).filter(F.col("ano") == 1995)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1995" in plan.split(
        "PushedFilters"
    )[0], plan
    assert back.count() == o.filter(F.col("ano") == 1995).count()

    # the partition column itself came back (hive layout reconstructs it)
    assert "ano" in back.columns


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    """Compacting a fragmented sink shrinks the file count to the target
    math and changes no data."""
    c = load_table(spark, "customer", sf_dir)
    p = str(tmp_path / "fragmented")
    c.repartition(16).write.parquet(p)
    assert len(parquet_files(p)) == 16

    n = c.count()
    before, after = compact_partitions(spark, p, target_rows_per_file=n)
    assert (before, after) == (16, 1)
    back = spark.read.parquet(p)
    assert back.schema == c.schema
    assert _multiset(back) == _multiset(c)


def test_range_sorted_layout_has_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """Every output file's footer min/max for the sort column is tight and
    NON-OVERLAPPING across files — the property file skipping needs."""
    import pyarrow.parquet as pq

    from etl_globalretail_spark.sources.formats import write_range_sorted

    o = load_table(spark, "orders", sf_dir)
    p = str(tmp_path / "orders_ranged")
    write_range_sorted(o, p, "o_orderkey", 8)

    ranges = []
    for f in parquet_files(p):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("o_orderkey")
        lo = min(
            md.row_group(i).column(idx).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(idx).statistics.max
            for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 2
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, ranges

    # data intact
    back = spark.read.parquet(p)
    assert back.count() == o.count()


def test_read_binary_assets_glob_and_content(spark, tmp_path):
    """binaryFile scan returns exact bytes + metadata, and pathGlobFilter
    prunes non-matching files at listing time."""
    from etl_globalretail_spark.sources.formats import read_binary_assets

    (tmp_path / "a.jpg").write_bytes(b"\xff\xd8JPEGBYTES")
    (tmp_path / "b.png").write_bytes(b"\x89PNGBYTES")
    (tmp_path / "notes.txt").write_bytes(b"not an image")
    df = read_binary_assets(spark, str(tmp_path), glob="*.{jpg,png}")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.jpg", "b.png"}
    assert bytes(rows["a.jpg"].content) == b"\xff\xd8JPEGBYTES"
    assert rows["b.png"].length == len(b"\x89PNGBYTES")


def test_read_text_corpus_line_and_whole_file(spark, tmp_path):
    from etl_globalretail_spark.sources.formats import read_text_corpus

    (tmp_path / "d1.txt").write_text("alpha\nbeta\n")
    (tmp_path / "d2.txt").write_text("gamma\n")
    lines = read_text_corpus(spark, str(tmp_path))
    got = {(r.source_file.rsplit("/", 1)[-1], r.text) for r in lines.collect()}
    assert got == {("d1.txt", "alpha"), ("d1.txt", "beta"), ("d2.txt", "gamma")}

    whole = read_text_corpus(spark, str(tmp_path), whole_file=True)
    by_file = {
        r.source_file.rsplit("/", 1)[-1]: r.text for r in whole.collect()
    }
    assert by_file == {"d1.txt": "alpha\nbeta\n", "d2.txt": "gamma\n"}


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Accreting sinks evolve: files written before a column existed read
    as NULL for it under an explicit evolved schema — no rewrite of old
    files, no inference."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "overwrite"
    ).parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(p)
    evolved = "id long, v string, score double"
    out = {r.id: r for r in spark.read.schema(evolved).parquet(p).collect()}
    assert out[1].score is None and out[2].score == 9.5
    assert spark.read.schema(evolved).parquet(p).filter(
        F.col("score").isNull()
    ).count() == 1


def test_morton_key_matches_python_interleave(spark):
    """morton_key ≡ the textbook bit interleave on a small grid."""
    from etl_globalretail_spark.sources.formats import morton_key

    def py_morton(x, y, bits=20):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    rows = [(x, y) for x in range(8) for y in range(8)] + [(1023, 77), (0, 0)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", morton_key("x", "y").alias("z")).collect()
    for r in got:
        assert r["z"] == py_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zordered_layout_boxes_tight_in_both_dims(spark, sf_dir, tmp_path):
    """write_zordered: per-file (partkey, suppkey) bounding boxes from REAL
    parquet footers cover far less area than files × global box — the
    multi-column file-skipping property. A single-column range sort leaves
    the OTHER column's per-file range at full width."""
    import pyarrow.parquet as pq

    from etl_globalretail_spark.sources.formats import (
        parquet_files,
        write_range_sorted,
        write_zordered,
    )

    # A square grid makes the geometry visible at file granularity: 64×64
    # cells into 16 files → each z-ordered file is ideally a 16×16 box.
    # (On a domain whose second dimension is narrower than the z-curve cut
    # — e.g. sf0.001 lineitem with 10 suppliers and 8 files — every box
    # legitimately spans the full narrow dimension, which demonstrates
    # nothing either way.)
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)],
        "l_partkey long, l_suppkey long",
    )
    li = grid
    n_files = 16

    def file_boxes(path):
        boxes = []
        for f in parquet_files(path):
            md = pq.ParquetFile(f).metadata
            names = md.schema.names
            pi, si = names.index("l_partkey"), names.index("l_suppkey")
            stats = [
                (md.row_group(i).column(pi).statistics,
                 md.row_group(i).column(si).statistics)
                for i in range(md.num_row_groups)
            ]
            if not stats:
                continue
            boxes.append((
                min(s[0].min for s in stats), max(s[0].max for s in stats),
                min(s[1].min for s in stats), max(s[1].max for s in stats),
            ))
        return boxes

    zp = str(tmp_path / "li_zorder")
    write_zordered(li, zp, "l_partkey", "l_suppkey", n_files)
    zboxes = file_boxes(zp)

    rp = str(tmp_path / "li_prange")
    write_range_sorted(li, rp, "l_partkey", n_files)
    rboxes = file_boxes(rp)

    def area(b):
        return (b[1] - b[0] + 1) * (b[3] - b[2] + 1)

    p_lo = min(b[0] for b in zboxes)
    p_hi = max(b[1] for b in zboxes)
    s_lo = min(b[2] for b in zboxes)
    s_hi = max(b[3] for b in zboxes)
    global_area = (p_hi - p_lo + 1) * (s_hi - s_lo + 1)

    # Z-order: average box is a small fraction of the global rectangle.
    assert len(zboxes) >= 4
    z_avg = sum(area(b) for b in zboxes) / len(zboxes)
    assert z_avg < global_area / 3, (z_avg, global_area)

    # The actual skipping claim, per dimension: a suppkey predicate can
    # skip z-ordered files (avg per-file suppkey width ≪ full range) but
    # not partkey-range-sorted files (every file spans ~the full suppkey
    # range).
    s_range = s_hi - s_lo + 1
    z_s_avg = sum(b[3] - b[2] + 1 for b in zboxes) / len(zboxes)
    r_s_avg = sum(b[3] - b[2] + 1 for b in rboxes) / len(rboxes)
    assert z_s_avg < 0.7 * s_range, (z_s_avg, s_range)
    assert r_s_avg > 0.9 * s_range, (r_s_avg, s_range)

    # data intact, on the real table
    real = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    rl = str(tmp_path / "li_zorder_real")
    write_zordered(real, rl, "l_partkey", "l_suppkey", 4)
    assert spark.read.parquet(rl).count() == real.count()


def test_versioned_snapshots_time_travel(spark, sf_dir, tmp_path):
    """Immutable version directories: pinned reads see the old snapshot
    after new writes; latest resolves to the newest; snapshot_diff over
    two versions reports the change."""
    from etl_globalretail_spark.plans.scd import snapshot_diff
    from etl_globalretail_spark.sources.formats import (
        list_versions,
        read_version,
        write_version,
    )

    root = str(tmp_path / "versioned_customer")
    import os
    os.makedirs(root)

    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    v1 = write_version(c, root)
    changed = c.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") == 1, F.lit(999999.0)).otherwise(
            F.col("c_acctbal")
        ),
    ).filter(F.col("c_custkey") != 2)
    v2 = write_version(changed, root)
    assert (v1, v2) == (1, 2) and list_versions(root) == [1, 2]

    old = read_version(spark, root, 1)
    assert old.count() == c.count()
    assert old.filter("c_custkey = 2").count() == 1  # time travel: row alive at v1

    latest = read_version(spark, root)
    assert latest.filter("c_custkey = 2").count() == 0

    d = snapshot_diff(
        read_version(spark, root, 1), read_version(spark, root, 2),
        keys=["c_custkey"], attrs=["c_name", "c_acctbal"],
    )
    cls_col = next(c for c in d.columns if "change" in c or "class" in c)
    by = {r[cls_col]: r["n_rows"] for r in
          d.groupBy(cls_col).agg(F.count(F.lit(1)).alias("n_rows")).collect()}
    deleted = by.get("deleted", by.get("DELETED"))
    changed = by.get("changed", by.get("CHANGED"))
    assert deleted == 1 and changed == 1
