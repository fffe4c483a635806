"""Bucketed co-located join: the pay-the-shuffle-once scale pattern.

Writes lineitem and orders bucketed by order key with the same spec,
then asserts (a) the join result matches the plain join exactly and
(b) the physical plan contains ZERO exchanges — the join runs
entirely on bucket co-location.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from nfl26_bigdatabowl_prediction_spark.sources.io import table, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def _ops(df) -> list[str]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return re.findall(r"^\(\d+\) (\w+)", buf.getvalue(), re.M)


def test_bucketed_join_has_no_exchange(spark):
    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus")
    write_bucketed(li, "li_b", ["l_orderkey"], n_buckets=4, sort_cols=["l_orderkey"])
    write_bucketed(o, "o_b", ["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"])
    try:
        li_b, o_b = spark.table("li_b"), spark.table("o_b")
        joined = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey, "inner").select(
            "l_orderkey", "l_linenumber", "o_orderstatus"
        )
        # broadcast would trivially have no shuffle — force the
        # merge path to prove bucket co-location does the work.
        # NB: restore the SESSION's value afterwards — conf.unset
        # falls back to the Spark DEFAULT (10 MB), silently re-enabling
        # auto-broadcast for every later test in the shared session.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            ops = _ops(joined)
            assert "SortMergeJoin" in ops, ops
            assert ops.count("Exchange") == 0, ops
            got = joined.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert got == expect > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """write_parquet(partition_by=...) must yield scans that prune at
    the PARTITION level: a filter on the partition key appears as a
    PartitionFilter (directory pruning — at 100 TB the difference
    between listing one directory and reading the lake), and the
    pruned scan reads strictly fewer files than the full scan."""
    from nfl26_bigdatabowl_prediction_spark.sources.io import write_parquet

    ev = table(spark, SF_DIR, "events").select("event_id", "user_id", "event_type")
    path = str(tmp_path / "events_by_type")
    write_parquet(ev, path, partition_by=["event_type"])

    back = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "event_type" in pf[0], plan
    # and the data actually matches the unpartitioned filter
    expect = ev.filter(F.col("event_type") == "purchase").count()
    assert back.count() == expect > 0


def test_range_clustered_write_has_disjoint_file_ranges(spark, tmp_path):
    # Range clustering is the data-skipping layout: every parquet file
    # owns a disjoint slice of the cluster column, so a range predicate
    # can skip whole files on footer min/max stats alone.  pyarrow
    # reads the same stats the scanner's skipping logic uses.
    import glob

    import pyarrow.parquet as pq

    from nfl26_bigdatabowl_prediction_spark.sources.io import write_range_clustered

    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    out = str(tmp_path / "li_range")
    write_range_clustered(li, out, "l_orderkey", n_files=4)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("l_orderkey")
        mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2  # enough files for skipping to mean anything
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint slices: a range filter prunes files

    # round-trip integrity: clustering reorders rows, never drops them
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    got = back.agg(F.sum("l_quantity").alias("s")).collect()[0][0]
    want = li.agg(F.sum("l_quantity").alias("s")).collect()[0][0]
    assert got == want


def test_zorder_clustered_write_skips_on_both_columns(spark, tmp_path):
    # Z-ordering must give file-level min/max locality on BOTH key
    # columns: for each column, most files' [min,max] span must be a
    # strict fraction of the global range, so a point/range predicate
    # on either column prunes files.  (One-column range clustering
    # would leave the other column spanning the full range in every
    # file.)
    import glob

    import pyarrow.parquet as pq

    from nfl26_bigdatabowl_prediction_spark.sources.io import write_zorder_clustered

    li = table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    out = str(tmp_path / "li_zorder")
    write_zorder_clustered(li, out, "l_partkey", "l_suppkey", n_files=8)

    spans = {"l_partkey": [], "l_suppkey": []}
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        for col in spans:
            idx = md.schema.names.index(col)
            mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
            maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
            spans[col].append((min(mins), max(maxs)))
    assert len(spans["l_partkey"]) >= 4
    for col, file_spans in spans.items():
        glo = min(s[0] for s in file_spans)
        ghi = max(s[1] for s in file_spans)
        frac_tight = sum(
            1 for lo, hi in file_spans if (hi - lo) <= 0.75 * (ghi - glo)
        ) / len(file_spans)
        assert frac_tight >= 0.5, (col, file_spans)

    back = spark.read.parquet(out)
    assert back.count() == li.count()
    got = back.agg(F.sum("l_quantity").alias("s")).collect()[0][0]
    want = li.agg(F.sum("l_quantity").alias("s")).collect()[0][0]
    assert got == want
