"""Z-order layout: Morton key correctness, content preservation, and
the actual 2-D pruning benefit measured from parquet footers."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from minefields_kafka_streams_deduplication_spark.sources.layout import (
    ZORDER_FILES,
    morton_key,
    quantize,
    stage_zorder_events,
)


def _py_interleave(a: int, b: int) -> int:
    out = 0
    for i in range(16):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (40000, 123)]
    df = spark.createDataFrame(rows, "a LONG, b LONG").withColumn(
        "z", morton_key(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r.z == _py_interleave(r.a, r.b), (r.a, r.b)


def test_quantize_endpoints(spark):
    df = spark.range(1).select(
        quantize(F.lit(10), F.lit(10), F.lit(20)).alias("lo"),
        quantize(F.lit(20), F.lit(10), F.lit(20)).alias("hi"),
        quantize(F.lit(15), F.lit(10), F.lit(20)).alias("mid"),
        quantize(F.lit(7), F.lit(7), F.lit(7)).alias("degenerate"),
    ).collect()[0]
    assert df.lo == 0 and df.hi == 65535 and df.degenerate == 0
    assert 0 < df.mid < 65535


def _file_stats(root: str, cols: tuple[str, str]) -> list[dict]:
    """Per-file [min, max] of the two box columns from parquet footers."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(root, "*.parquet"))):
        md = pq.read_metadata(f)
        stats: dict = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    lo, hi = col.statistics.min, col.statistics.max
                    if name in stats:
                        stats[name] = (min(stats[name][0], lo), max(stats[name][1], hi))
                    else:
                        stats[name] = (lo, hi)
        out.append(stats)
    return out


def _skippable(stats: list[dict], box: dict) -> int:
    n = 0
    for s in stats:
        for col, (blo, bhi) in box.items():
            lo, hi = s[col]
            if hi < blo or lo > bhi:
                n += 1
                break
    return n


def test_zorder_prunes_2d_box_better_than_single_sort(spark, sf_dir, tmp_path):
    """The point of the layout: for a 2-D box, z-ordered files are
    rectangles (skippable on EITHER dimension), while a single-key sort
    leaves the second dimension full-range in every file."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    b = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    umin, umax, vmin, vmax = b
    box = {
        "user_id": (umin + 0.40 * (umax - umin), umin + 0.60 * (umax - umin)),
        "value": (vmin + 0.40 * (vmax - vmin), vmin + 0.60 * (vmax - vmin)),
    }

    zroot = stage_zorder_events(spark, sf_dir)
    zstats = _file_stats(zroot, ("user_id", "value"))
    assert len(zstats) >= ZORDER_FILES // 2  # staging really split files

    # comparison layout: same file count, sorted on user_id only
    uroot = str(tmp_path / "user_sorted")
    (
        ev.repartitionByRange(ZORDER_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(uroot)
    )
    ustats = _file_stats(uroot, ("user_id", "value"))

    z_skip = _skippable(zstats, box)
    u_skip = _skippable(ustats, box)
    # the single sort prunes ~80% of files on its own key; z-order must
    # beat it by also pruning on value, and skip most files outright
    assert z_skip > u_skip
    assert z_skip >= int(0.85 * len(zstats))


def test_zorder_layout_preserves_content(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    z = spark.read.parquet(stage_zorder_events(spark, sf_dir))
    assert z.count() == ev.count()
    a = ev.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    c = z.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    assert tuple(a) == tuple(c)
    assert sorted(z.columns) == sorted(ev.columns)


def test_zorder_box_query_pushes_both_predicates(spark, sf_dir):
    from minefields_kafka_streams_deduplication_spark.registry import QUERIES

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = QUERIES["zorder_box_query"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    line = pushed[0]
    assert "GreaterThanOrEqual(user_id" in line and "GreaterThanOrEqual(value" in line
    assert "LessThanOrEqual(user_id" in line and "LessThanOrEqual(value" in line


def test_merge_into_zorder_rewrites_only_touched_ranges(spark, sf_dir, tmp_path):
    """Incremental maintenance: a clustered batch merges by rewriting
    only its z-range partitions; content is the exact union; untouched
    partitions keep byte-identical files."""
    import glob
    import os
    from collections import Counter

    from minefields_kafka_streams_deduplication_spark.sources.layout import (
        ZORDER_PREFIX_BITS,
        merge_into_zorder,
        stage_zorder_partitioned,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "value"
    )
    root = str(tmp_path / "z")
    stage_zorder_partitioned(ev, root, "user_id", "value")

    def rows():
        return Counter(
            (r.event_id, r.user_id, r.value)
            for r in spark.read.parquet(root).select(
                "event_id", "user_id", "value"
            ).collect()
        )

    def file_sig():
        return {
            f: (os.path.getmtime(f), os.path.getsize(f))
            for f in glob.glob(f"{root}/zb=*/*.parquet")
        }

    before_rows, before_files = rows(), file_sig()

    # clustered batch: low user ids, low values -> one corner of the plane
    b = spark.createDataFrame(
        [(10_000_000 + i, 1 + i % 3, 0.5 + i * 0.01) for i in range(50)],
        "event_id LONG, user_id LONG, value DOUBLE",
    )
    touched = merge_into_zorder(spark, root, b, "user_id", "value")
    assert 0 < len(touched) <= 4  # corner batch -> few z-ranges
    assert len(touched) < 2 ** ZORDER_PREFIX_BITS

    after_rows = rows()
    expect = before_rows + Counter(
        (r.event_id, r.user_id, r.value) for r in b.collect()
    )
    assert after_rows == expect

    after_files = file_sig()
    for f, sig in before_files.items():
        zb = int(f.split("zb=")[1].split("/")[0])
        if zb not in touched:
            assert after_files.get(f) == sig, f


def test_merge_into_zorder_keeps_cell_assignment_stable(spark, tmp_path):
    """Bounds persist across merges: a row merged later lands in the
    same z-range as an identical row staged initially, and
    out-of-bounds values clamp into edge cells instead of erroring."""
    import os

    from minefields_kafka_streams_deduplication_spark.sources.layout import (
        merge_into_zorder,
        stage_zorder_partitioned,
    )

    base = spark.createDataFrame(
        [(i, i % 100, float(i % 50)) for i in range(1000)],
        "event_id LONG, user_id LONG, value DOUBLE",
    )
    root = str(tmp_path / "z")
    stage_zorder_partitioned(base, root, "user_id", "value")

    twin = spark.createDataFrame(
        [(9001, 7, 7.0)], "event_id LONG, user_id LONG, value DOUBLE"
    )
    t1 = merge_into_zorder(spark, root, twin, "user_id", "value")
    # the original row (7, 7.0) exists; its partition is the one touched
    orig_dir = None
    for d in os.listdir(root):
        if not d.startswith("zb="):
            continue
        got = (
            spark.read.parquet(os.path.join(root, d))
            .filter("user_id = 7 AND value = 7.0 AND event_id = 7")
            .count()
        )
        if got:
            orig_dir = int(d.split("=")[1])
    assert t1 == [orig_dir]

    # out-of-bounds: clamps, merges cleanly, content preserved
    wild = spark.createDataFrame(
        [(9002, 10_000, -999.0)], "event_id LONG, user_id LONG, value DOUBLE"
    )
    merge_into_zorder(spark, root, wild, "user_id", "value")
    assert spark.read.parquet(root).filter("event_id = 9002").count() == 1
