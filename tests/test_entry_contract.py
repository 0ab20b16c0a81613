"""Driver-contract invariants for __spark_entry__ (no Spark needed)."""

import __spark_entry__ as em


def test_oracle_keys_subset_of_queries():
    qs = set(em.queries())
    os_ = set(em.oracle_sql())
    assert os_ <= qs, os_ - qs


def test_rows_only_queries_documented():
    # queries without oracles must be the documented non-SQL-expressible
    # set only (driver records weaker checks for these)
    rows_only = set(em.queries()) - set(em.oracle_sql())
    assert rows_only == set()  # every query has a value oracle


def test_oracle_sql_is_runnable_duckdb():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
    for name, sql in em.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 1").fetchall()
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"oracle for {name} failed: {e}") from e


def test_contract_at_most_fifty_queries():
    """The driver records at most 50 correctness rows (observed r4: a
    51-key contract left hourly_events silently unchecked). Every key
    must have a recordable row, so the contract stays at <= 50 — merge
    queries (like the round-5 media row) before adding new ones."""
    import __spark_entry__ as e

    qs = e.queries()
    assert len(qs) <= 50, (
        f"{len(qs)} queries exceed the driver's 50-row correctness cap; "
        f"merge or retire one before adding more")
    # and every query is oracle-checked (no silent rows-only drift)
    assert set(e.oracle_sql()) == set(qs)


def test_operator_index_is_fresh():
    """docs/OPERATORS.md is auto-generated; a stale index misleads the
    next user, so regenerating must be a no-op. (Fails after adding an
    operator until `python tools/gen_operator_index.py` is re-run.)"""
    import io
    import pathlib
    from contextlib import redirect_stdout

    import tools.gen_operator_index as gen

    path = pathlib.Path("docs/OPERATORS.md")
    before = path.read_text()
    try:
        with redirect_stdout(io.StringIO()):
            gen.main()
        assert path.read_text() == before, (
            "docs/OPERATORS.md is stale — run "
            "python tools/gen_operator_index.py")
    finally:
        path.write_text(before)
