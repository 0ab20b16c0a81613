"""Snapshot catalog (Iceberg emulation): append/overwrite, snapshot
isolation, time travel."""


def test_snapshot_append_and_time_travel(spark, tmp_path):
    from pdf_parser_spark.engine import catalog

    tdir = str(tmp_path / "tbl")
    df1 = spark.range(0, 10).withColumnRenamed("id", "v")
    s1 = catalog.commit(df1, tdir, "append")
    df2 = spark.range(10, 15).withColumnRenamed("id", "v")
    s2 = catalog.commit(df2, tdir, "append")

    assert catalog.read_snapshot(spark, tdir, s1).count() == 10
    assert catalog.read_snapshot(spark, tdir, s2).count() == 15
    assert catalog.read_snapshot(spark, tdir).count() == 15  # current
    assert catalog.current_snapshot(tdir) == s2

    hist = catalog.history(tdir)
    assert [h["sequence"] for h in hist] == [1, 2]
    assert hist[1]["parent"] == s1


def test_snapshot_overwrite(spark, tmp_path):
    from pdf_parser_spark.engine import catalog

    tdir = str(tmp_path / "tbl")
    s1 = catalog.commit(spark.range(100).withColumnRenamed("id", "v"),
                        tdir, "append")
    s2 = catalog.commit(spark.range(3).withColumnRenamed("id", "v"),
                        tdir, "overwrite")
    assert catalog.read_snapshot(spark, tdir, s2).count() == 3
    # old snapshot still fully readable (isolation)
    assert catalog.read_snapshot(spark, tdir, s1).count() == 100


def test_extraction_pipeline_over_snapshots(spark, tmp_path):
    """End-to-end: pages table committed as a snapshot, extraction reads
    a pinned snapshot id while a new append lands."""
    from pdf_parser_spark.engine import catalog, job, source
    from tests.conftest import SF0001

    tdir = str(tmp_path / "pages_tbl")
    pages = source.pages_table(spark, SF0001)
    s1 = catalog.commit(pages.limit(200), tdir, "append")
    pinned = catalog.read_snapshot(spark, tdir, s1)
    catalog.commit(pages.limit(300), tdir, "append")  # concurrent append
    ext = job.run_extract(pinned, n_partitions=8)
    assert ext.count() == 200  # snapshot isolation held
