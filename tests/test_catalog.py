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


def test_incremental_append_scan(spark, tmp_path):
    """read_appends returns ONLY the rows added between two snapshots —
    the 'process just the new crawl increment' primitive."""
    from pdf_parser_spark.engine import catalog

    tdir = str(tmp_path / "inc_tbl")
    s1 = catalog.commit(spark.range(0, 10), tdir, "append")
    s2 = catalog.commit(spark.range(10, 25), tdir, "append")
    s3 = catalog.commit(spark.range(25, 30), tdir, "append")

    inc = catalog.read_appends(spark, tdir, s1, s3).toPandas()
    assert sorted(inc.id) == list(range(10, 30))
    inc12 = catalog.read_appends(spark, tdir, s1, s2).toPandas()
    assert sorted(inc12.id) == list(range(10, 25))
    # same-snapshot delta is empty with a stable schema
    assert catalog.read_appends(spark, tdir, s3, s3).count() == 0


def test_incremental_scan_refuses_overwrite_boundary(spark, tmp_path):
    import pytest

    from pdf_parser_spark.engine import catalog

    tdir = str(tmp_path / "ow_tbl")
    s1 = catalog.commit(spark.range(0, 10), tdir, "append")
    catalog.commit(spark.range(0, 3), tdir, "overwrite")
    s3 = catalog.commit(spark.range(3, 6), tdir, "append")
    with pytest.raises(ValueError, match="overwrite"):
        catalog.read_appends(spark, tdir, s1, s3)


def test_rollback_preserves_history(spark, tmp_path):
    from pdf_parser_spark.engine import catalog

    tdir = str(tmp_path / "rb_tbl")
    s1 = catalog.commit(spark.range(0, 10), tdir, "append")
    s2 = catalog.commit(spark.range(10, 20), tdir, "append")
    rb = catalog.rollback(tdir, s1)
    # current view = s1's data; s2 still time-travelable
    assert catalog.current_snapshot(tdir) == rb
    assert catalog.read_snapshot(spark, tdir).count() == 10
    assert catalog.read_snapshot(spark, tdir, s2).count() == 20
    ops = [h["operation"] for h in catalog.history(tdir)]
    assert ops == ["append", "append", "rollback"]


def test_schema_evolution_add_column(spark, tmp_path):
    """Iceberg-style add-column evolution: an append carrying a new
    column evolves the table schema; rows written before the column
    existed read back NULL for it, time travel reads the OLD schema,
    and the incremental scan uses the evolved one."""
    from pdf_parser_spark.engine import catalog

    tdir = str(tmp_path / "evo_tbl")
    s1 = catalog.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string"),
        tdir, "append")
    s2 = catalog.commit(
        spark.createDataFrame([(3, "c", 0.9)],
                              "id long, name string, quality double"),
        tdir, "append")

    cur = catalog.read_snapshot(spark, tdir)
    assert set(cur.columns) == {"id", "name", "quality"}
    rows = {r.id: r.quality for r in cur.collect()}
    assert rows == {1: None, 2: None, 3: 0.9}

    # time travel: the old snapshot keeps its own (pre-column) schema
    old = catalog.read_snapshot(spark, tdir, s1)
    assert set(old.columns) == {"id", "name"}

    # incremental scan reads the evolved schema
    inc = catalog.read_appends(spark, tdir, s1, s2)
    assert set(inc.columns) == {"id", "name", "quality"}
    assert inc.count() == 1

    # rollback restores the pre-evolution schema
    catalog.rollback(tdir, s1)
    assert set(catalog.read_snapshot(spark, tdir).columns) == {"id", "name"}


def test_schema_evolution_guards(spark, tmp_path):
    """Appends cannot silently narrow or retype the table: a column the
    append lacks STAYS in the schema (its new files read back NULL),
    and a type change is refused loudly."""
    import pytest

    from pdf_parser_spark.engine import catalog

    tdir = str(tmp_path / "guard_tbl")
    catalog.commit(
        spark.createDataFrame([(1, "a")], "id long, name string"),
        tdir, "append")
    # narrowing append: name column survives; new row reads NULL name
    catalog.commit(spark.createDataFrame([(2,)], "id long"),
                   tdir, "append")
    cur = catalog.read_snapshot(spark, tdir)
    assert set(cur.columns) == {"id", "name"}
    assert {r.id: r.name for r in cur.collect()} == {1: "a", 2: None}
    # retype is refused (old files would be unreadable under the pin)
    with pytest.raises(ValueError, match="type change"):
        catalog.commit(
            spark.createDataFrame([("3", "c")], "id string, name string"),
            tdir, "append")
