"""File-tree sync (S13) and the SQL surface (S11/S12, K6-K12): the DBAPI
bulk sink is DRIVEN against DuckDB; the JDBC wrapper is exercised up to the
driver-jar boundary and skips cleanly where no jar exists."""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def tree(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    (src / "sub").mkdir(parents=True)
    dst.mkdir()
    (src / "a.txt").write_text("alpha")
    (src / "b.txt").write_text("bravo-bigger")
    (src / "sub" / "c.txt").write_text("charlie")
    # dst already has an identical a.txt, a drifted b.txt, and an extra file
    (dst / "a.txt").write_text("alpha")
    (dst / "b.txt").write_text("old")
    (dst / "extra.txt").write_text("not in src")
    return str(src), str(dst)


def test_files_to_sync_and_sync_dirs(spark, tree):
    from d6tstack_spark.sources.sync import files_to_sync, list_files, sync_dirs

    src, dst = tree
    lst = list_files(spark, src).toPandas()
    assert set(lst["relpath"]) == {"a.txt", "b.txt", "sub/c.txt"}

    todo = files_to_sync(spark, src, dst).toPandas()
    assert set(todo["relpath"]) == {"sub/c.txt", "b.txt"}  # missing + drifted
    todo2 = files_to_sync(spark, src, dst, include_size_mismatch=False).toPandas()
    assert set(todo2["relpath"]) == {"sub/c.txt"}

    s = sync_dirs(spark, src, dst)
    assert s["n_files"] == 2 and s["total_bytes"] == len("charlie") + len(
        "bravo-bigger"
    )
    assert open(os.path.join(dst, "b.txt")).read() == "bravo-bigger"
    assert open(os.path.join(dst, "sub/c.txt")).read() == "charlie"
    # extra dst file untouched (one-way sync, like the reference)
    assert os.path.isfile(os.path.join(dst, "extra.txt"))
    # idempotent: second run copies nothing
    assert sync_dirs(spark, src, dst)["n_files"] == 0


def test_list_files_plan_prunes_content(spark, tree):
    from d6tstack_spark.sources.sync import list_files

    df = list_files(spark, tree[0])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "content" not in read_schema  # metadata-only listing


def test_to_sql_dbapi_duckdb_roundtrip(spark, tmp_path):
    import duckdb

    from d6tstack_spark.sources.sql import to_sql_dbapi

    db_path = str(tmp_path / "sink.duckdb")

    # a closure, not a module-level function: cloudpickle ships it by VALUE,
    # so executors don't need the test module on their import path
    def _connect(p=db_path):
        import duckdb as _d

        return _d.connect(p)

    df = spark.range(100).selectExpr(
        "id", "cast(id * 1.5 as double) AS v", "concat('row-', id) AS s"
    )
    n = to_sql_dbapi(df.coalesce(1), _connect, "t1", mode="overwrite")
    assert n == 100
    # duckdb is single-process-exclusive: close the assert connection before
    # the next distributed write or the executors can't take the file lock
    con = duckdb.connect(db_path)
    assert con.sql('SELECT COUNT(*), SUM(v) FROM "t1"').fetchone() == (100, 7425.0)
    con.close()
    # append doubles it
    n = to_sql_dbapi(df.coalesce(1), _connect, "t1", mode="append")
    assert n == 100
    con = duckdb.connect(db_path)
    assert con.sql('SELECT COUNT(*) FROM "t1"').fetchone()[0] == 200
    con.close()

    with pytest.raises(ValueError, match="append"):
        to_sql_dbapi(df, _connect, "t1", mode="upsert")


def test_read_jdbc_surface(spark):
    from d6tstack_spark.sources.sql import read_jdbc

    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc(spark, "jdbc:x", table="t", query="SELECT 1")
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(spark, "jdbc:x", table="t", partition_column="id")
    # no JDBC driver jar in this image: the load must fail with the
    # driver-resolution error (proving the option plumbing is reached),
    # which on a real cluster is where the jar takes over
    try:
        read_jdbc(
            spark, "jdbc:postgresql://localhost/x", table="t",
            partition_column="id", lower_bound=0, upper_bound=10,
            num_partitions=2,
        ).count()
    except Exception as e:
        msg = str(e)
        assert "driver" in msg.lower() or "No suitable driver" in msg
    else:  # pragma: no cover
        pytest.skip("a JDBC driver is on the classpath here")


def test_jdbc_partition_predicates_contract():
    """The range predicates must partition ANY data disjointly and
    completely (Spark JDBCRelation semantics): first takes below+NULLs,
    last takes at/above, bounds never clip rows."""
    from d6tstack_spark.sources.sql import jdbc_partition_predicates

    preds = jdbc_partition_predicates("id", 0, 100, 4)
    assert len(preds) == 4
    assert preds[0] == "id < 25 OR id IS NULL"
    assert preds[1] == "id >= 25 AND id < 50"
    assert preds[3] == "id >= 75"
    # degenerate cases collapse to one full-scan predicate
    assert jdbc_partition_predicates("id", 5, 5, 4) == ["1=1"]
    assert jdbc_partition_predicates("id", 0, 1, 8) == ["1=1"]
    import pytest as _p

    with _p.raises(ValueError):
        jdbc_partition_predicates("id", 10, 0, 2)
    with _p.raises(ValueError):
        jdbc_partition_predicates("id", 0, 10, 0)

    # disjoint + complete against a real engine, including out-of-bounds
    # rows and NULLs (bounds only balance, never filter)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest([-50, 0, 10, 25, 49, 99, 100, 250]) AS id"
    )
    con.execute("INSERT INTO t VALUES (NULL)")
    total = con.execute("SELECT count(*) FROM t").fetchone()[0]
    counts = [
        con.execute(f"SELECT count(*) FROM t WHERE {p}").fetchone()[0]
        for p in preds
    ]
    assert sum(counts) == total == 9


def test_read_sql_dbapi_partitioned(spark, tmp_path):
    """Distributed DBAPI read: range predicates fan out one connection per
    partition; the union equals the table exactly (S11/S12 driven against
    DuckDB — no JDBC jar in the image)."""
    import duckdb

    from d6tstack_spark.sources.sql import (
        jdbc_partition_predicates,
        read_sql_dbapi,
    )

    db = str(tmp_path / "r.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE ev AS SELECT i AS id, 'u' || (i % 7) AS user_id, "
        "i * 1.5 AS val FROM range(0, 1000) r(i)"
    )
    con.execute("INSERT INTO ev VALUES (NULL, 'unull', NULL)")
    con.close()

    def connect(p=db):
        import duckdb as _d

        return _d.connect(p, read_only=True)
    preds = jdbc_partition_predicates("id", 0, 1000, 4)
    df = read_sql_dbapi(spark, connect, "SELECT * FROM ev", predicates=preds)
    assert df.rdd.getNumPartitions() == 4
    got = df.toPandas().sort_values("user_id", ignore_index=True)
    assert len(got) == 1001
    assert int(got["id"].sum()) == 499500  # every row exactly once
    assert got["id"].isna().sum() == 1  # NULL landed in partition 0
    # pushed-down query + no predicates = single full scan
    one = read_sql_dbapi(
        spark, connect, "SELECT user_id, count(*) AS n FROM ev GROUP BY user_id"
    )
    p = one.toPandas()
    assert len(p) == 8 and int(p["n"].sum()) == 1001


# ---------------------------------------------------------------------------
# live JDBC round-trip against embedded Derby (jars ship in /opt/spark/jars
# — no network, no external server: the closest thing to a real database
# this sandbox can run). Moves S11/S12 from contract-level to executed.
# ---------------------------------------------------------------------------

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY)
        return True
    except Exception:
        return False


def test_jdbc_roundtrip_embedded_derby(spark):
    """to_jdbc write → read_jdbc full + partitioned reads, frame-equal.
    Also proves the partitioned read plans one range predicate per
    partition over live JDBC, not just in the contract test."""
    import pandas as pd

    from d6tstack_spark.operators.sinks import to_jdbc
    from d6tstack_spark.sources.sql import read_jdbc

    if not _derby_available(spark):
        pytest.skip("Derby driver not on the classpath")
    url = "jdbc:derby:memory:d6t_rt;create=true"
    want = pd.DataFrame(
        {
            "id": range(100),
            "grp": [f"g{i % 7}" for i in range(100)],
            "val": [i * 0.5 for i in range(100)],
        }
    )
    df = spark.createDataFrame(want)
    to_jdbc(df, url, "rt_table", mode="overwrite", driver=DERBY)

    got = (
        read_jdbc(spark, url, table="rt_table", driver=DERBY)
        .orderBy("id")
        .toPandas()
    )
    got.columns = [c.lower() for c in got.columns]  # Derby upper-cases
    pd.testing.assert_frame_equal(want.reset_index(drop=True), got[want.columns.tolist()])

    part = read_jdbc(
        spark, url, table="rt_table", partition_column="id",
        lower_bound=0, upper_bound=100, num_partitions=4, driver=DERBY,
    )
    assert part.rdd.getNumPartitions() == 4
    got2 = part.orderBy("id").toPandas()
    got2.columns = [c.lower() for c in got2.columns]
    pd.testing.assert_frame_equal(want.reset_index(drop=True), got2[want.columns.tolist()])
    # disjoint + complete: each range predicate owns its slice exactly once
    sizes = part.rdd.glom().map(len).collect()
    assert sum(sizes) == 100 and all(s == 25 for s in sizes)


def test_jdbc_query_pushdown_derby(spark):
    """query= pushes the SQL to the database (aggregation happens
    DB-side; Spark sees only the result rows)."""
    from d6tstack_spark.operators.sinks import to_jdbc
    from d6tstack_spark.sources.sql import read_jdbc

    if not _derby_available(spark):
        pytest.skip("Derby driver not on the classpath")
    url = "jdbc:derby:memory:d6t_q;create=true"
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id int, k int"
    )
    to_jdbc(df, url, "q_table", mode="overwrite", driver=DERBY)
    agg = read_jdbc(
        spark, url,
        query='SELECT "k", COUNT(*) AS "n" FROM q_table GROUP BY "k"',
        driver=DERBY,
    ).orderBy("k").collect()
    assert [(r["k"], r["n"]) for r in agg] == [(0, 10), (1, 10), (2, 10)]


def test_to_sql_dbapi_prefers_copy_when_available(spark, tmp_path):
    """Capability branch: a psycopg2-style driver (cursor has
    copy_expert) gets the native bulk COPY wire path instead of
    executemany — the reference's only measured speedup (utils.py:69-111,
    6.0x). Stub-driven: the sandbox has no Postgres, so the contract is
    asserted on the captured COPY payloads (escaping incl. commas,
    quotes, newlines, NULLs)."""
    import csv
    import functools
    import glob
    import io

    from d6tstack_spark.sources.sql import to_sql_dbapi
    from d6tstack_spark.testing.stubs import make_copy_capture_conn

    spool = str(tmp_path / "spool")
    rows = [
        (1, "plain"),
        (2, 'comma, and "quotes"'),
        (3, "line\nbreak"),
        (4, None),
        (5, ""),  # empty string must NOT collapse to NULL on the wire
    ]
    df = spark.createDataFrame(rows, "id long, txt string").coalesce(1)
    n = to_sql_dbapi(
        df, functools.partial(make_copy_capture_conn, spool), "t_copy"
    )
    assert n == 5
    payloads = sorted(glob.glob(spool + "/*.copy"))
    assert payloads, "COPY path produced no spool — branch not taken"
    assert not glob.glob(spool + "/*.rows")  # executemany never ran
    got = {}
    raw = ""
    for p in payloads:
        sql, body = open(p).read().split("\n\x00\n", 1)
        assert sql.startswith('COPY "t_copy" ("id", "txt") FROM STDIN')
        raw += body
        for rec in csv.reader(io.StringIO(body)):
            if rec:
                got[int(rec[0])] = rec[1]
    assert got[2] == 'comma, and "quotes"'
    assert got[3] == "line\nbreak"
    assert got[4] == ""  # csv.reader can't distinguish; the raw line can:
    # COPY csv semantics: UNQUOTED empty = NULL, QUOTED empty = ''
    assert '"4",\n' in raw or raw.endswith('"4",')
    assert '"5",""' in raw
    assert len(got) == 5


def test_to_sql_dbapi_binary_frames_skip_copy(spark, tmp_path):
    """bytes have no faithful CSV text form: a binary column must take
    the executemany path even when the driver offers copy_expert."""
    import functools
    import glob

    from d6tstack_spark.sources.sql import to_sql_dbapi
    from d6tstack_spark.testing.stubs import make_copy_capture_conn

    spool = str(tmp_path / "spool_bin")
    df = spark.createDataFrame(
        [(1, b"\x00\xffraw")], "id long, payload binary"
    ).coalesce(1)
    n = to_sql_dbapi(
        df, functools.partial(make_copy_capture_conn, spool), "t_bin"
    )
    assert n == 1
    assert not glob.glob(spool + "/*.copy")  # COPY branch not taken
    assert glob.glob(spool + "/*.rows")  # executemany carried the bytes
