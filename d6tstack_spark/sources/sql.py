"""SQL read/write surface (SURVEY.md §2.1 S11/S12, §2.11 K6-K12).

The reference's SQL story is two-sided:
- reads via pandas ``read_sql`` (utils.py:17-65);
- writes via native bulk loads — ``pd_to_psql`` COPY FROM / ``pd_to_mysql``
  LOAD DATA, its ONE measured benchmark (28 s → 4.65 s, examples-sql.ipynb).

Spark-first equivalents:
- ``read_jdbc``: ``spark.read.jdbc`` with partitioned scans (predicate-split
  parallel read — the distributed generalization of read_sql);
- ``to_jdbc`` (operators.sinks): Spark's batched JDBC writer;
- ``to_sql_dbapi``: per-partition DBAPI bulk insert for engines without a
  JDBC driver on the classpath — each task opens its own connection and
  bulk-inserts its partition, which is exactly the reference's
  "bulk native beats per-row" insight, fanned out. Driven in tests against
  DuckDB (the in-image SQL engine).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    **options,
) -> DataFrame:
    """JDBC scan (table or pushed-down query). With ``partition_column`` +
    bounds the read is SPLIT into ``num_partitions`` range predicates that
    scan in parallel — without it a JDBC read is one connection on one task,
    which at 100 TB is not a scan, it's a straw. Requires the driver jar on
    the classpath — driven live in tests against embedded Derby
    (/opt/spark/jars ships the driver; no network needed)."""
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= or query=")
    reader = spark.read.format("jdbc").option("url", url)
    if query is not None:
        reader = reader.option("query", query)
    else:
        reader = reader.option("dbtable", table)
    if partition_column is not None:
        if query is not None:
            raise ValueError("partitioned reads need table=, not query=")
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column needs lower_bound, upper_bound, num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_partition_predicates(
    column: str, lower_bound: int, upper_bound: int, num_partitions: int
) -> list[str]:
    """The WHERE predicates a range-partitioned JDBC scan generates —
    mirroring Spark's JDBCRelation.columnPartition semantics: stride =
    (upper-lower)/n, first partition takes everything below its upper edge
    PLUS NULLs, last takes everything at/above its lower edge, so the
    partitions are provably disjoint and complete for ANY data (bounds only
    steer balance, never clip rows). Pure function: the contract is testable
    against a real database without a JDBC driver jar, and read_sql_dbapi
    consumes it directly."""
    if num_partitions <= 0:
        raise ValueError("num_partitions must be >= 1")
    if lower_bound > upper_bound:
        raise ValueError("lower_bound must be <= upper_bound")
    n = min(num_partitions, max(upper_bound - lower_bound, 1))
    if n <= 1:
        return ["1=1"]
    stride = (upper_bound - lower_bound) // n
    preds = []
    cur = lower_bound + stride
    for i in range(n):
        if i == 0:
            preds.append(f"{column} < {cur} OR {column} IS NULL")
        elif i == n - 1:
            preds.append(f"{column} >= {cur - stride}")
        else:
            preds.append(f"{column} >= {cur - stride} AND {column} < {cur}")
        cur += stride
    return preds


def read_sql_dbapi(
    spark: SparkSession,
    connect_fn: Callable[[], object],
    query: str,
    predicates: list[str] | None = None,
) -> DataFrame:
    """Distributed SQL read through any DBAPI driver: one connection per
    predicate per task, each scanning ``SELECT * FROM (query) WHERE pred`` —
    the S11/S12 read surface without a JDBC jar (the reference reads via
    pandas read_sql on one connection; this is that, fanned out). Pair with
    :func:`jdbc_partition_predicates` for range splits. ``connect_fn`` must
    be picklable and safe to open concurrently (e.g.
    ``functools.partial(duckdb.connect, path, read_only=True)``).

    Schema comes from a driver-side 100-row sample (DBAPI type codes are
    driver-specific); an empty result falls back to all-string columns."""
    preds = list(predicates) if predicates else ["1=1"]
    con = connect_fn()
    try:
        cur = con.cursor()
        try:
            cur.execute(f"SELECT * FROM ({query}) __q LIMIT 100")
            cols = [d[0] for d in cur.description]
            sample = pd.DataFrame(cur.fetchall(), columns=cols)
        finally:
            cur.close()
    finally:
        con.close()

    import decimal

    def _kind(col: pd.Series) -> str:
        k = getattr(col.dtype, "kind", "O")
        if k == "O":
            nn = col.dropna()
            if len(nn) and isinstance(nn.iloc[0], decimal.Decimal):
                return "f"  # DBAPI DECIMAL (e.g. DuckDB arithmetic) → double
        return k

    kinds = {c: _kind(sample[c]) for c in cols}
    fields = ", ".join(
        "`{}` {}".format(
            c,
            {"i": "bigint", "u": "bigint", "f": "double", "b": "boolean",
             "M": "timestamp"}.get(kinds[c], "string"),
        )
        for c in cols
    )
    pdf = spark.createDataFrame([(p,) for p in preds], "__pred string")
    pdf = pdf.repartition(len(preds))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for pred in b["__pred"]:
                c = connect_fn()
                try:
                    cu = c.cursor()
                    try:
                        cu.execute(
                            f"SELECT * FROM ({query}) __q WHERE {pred}"
                        )
                        out = pd.DataFrame(cu.fetchall(), columns=cols)
                    finally:
                        cu.close()
                finally:
                    c.close()
                for col in cols:
                    k = kinds[col]
                    if k in ("i", "u") and out[col].isna().any():
                        out[col] = out[col].astype("Int64")
                    elif k in ("i", "u"):
                        out[col] = out[col].astype("int64")
                    elif k == "f":
                        out[col] = out[col].astype("float64")
                    elif k == "b":
                        out[col] = out[col].astype("bool")
                    elif k == "M":
                        out[col] = pd.to_datetime(out[col])
                yield out

    return pdf.mapInPandas(scan, fields)


def _ddl_type(dtype) -> str:
    k = dtype.kind if hasattr(dtype, "kind") else "O"
    return {"i": "BIGINT", "u": "BIGINT", "f": "DOUBLE", "b": "BOOLEAN",
            "M": "TIMESTAMP"}.get(k, "VARCHAR")


def to_sql_dbapi(
    df: DataFrame,
    connect_fn: Callable[[], object],
    table: str,
    mode: str = "append",
    batch_rows: int = 10_000,
) -> int:
    """Bulk-insert a DataFrame through any DBAPI driver, one connection per
    partition (each task loads its own slice — the reference's bulk-load
    speedup, distributed). ``connect_fn`` must be picklable (a module-level
    function or functools.partial). ``mode='overwrite'`` recreates the
    table first (driver-side, once). Returns rows written.

    Note: single-writer engines (DuckDB, SQLite) need ``df.coalesce(1)``;
    server databases (Postgres, MySQL) take the parallel fan-in."""
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")
    cols = df.columns
    if mode == "overwrite":
        head = df.limit(0).toPandas()
        ddl = ", ".join(f'"{c}" {_ddl_type(head[c].dtype)}' for c in cols)
        con = connect_fn()
        try:
            cur = con.cursor()
            try:
                cur.execute(f'DROP TABLE IF EXISTS "{table}"')
                cur.execute(f'CREATE TABLE "{table}" ({ddl})')
                con.commit()
            finally:
                # some drivers (duckdb) implement cursor() as a duplicate
                # CONNECTION: it must close too or the file lock outlives us
                cur.close()
        finally:
            con.close()

    placeholders = ", ".join(["?"] * len(cols))
    collist = ", ".join(f'"{c}"' for c in cols)
    insert = f'INSERT INTO "{table}" ({collist}) VALUES ({placeholders})'
    copy_sql = f'COPY "{table}" ({collist}) FROM STDIN WITH (FORMAT csv)'
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        MapType,
        StructType,
    )

    # bytes have no faithful CSV text form (str(b'..') reprs would
    # corrupt bytea columns) and array/map/struct cells arrive as numpy
    # arrays whose str() isn't server-parseable (and trips pd.isna) —
    # frames with any such column always take the executemany path
    has_binary = any(
        isinstance(f.dataType, (ArrayType, BinaryType, MapType, StructType))
        for f in df.schema
    )

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        con = connect_fn()
        n = 0
        try:
            cur = con.cursor()
            try:
                # capability branch: psycopg2-style COPY (the reference's
                # only measured win — pd_to_psql 6.0x via copy_expert,
                # d6tstack utils.py:69-111). The wire path streams CSV
                # straight into the server's bulk loader. Escaping is
                # explicit, not pandas to_csv: COPY csv reads an UNQUOTED
                # empty field as NULL and a QUOTED empty field as '', so
                # every non-null value is quoted (QUOTE_MINIMAL would
                # silently turn '' into NULL — a divergence from the
                # executemany path).
                copy = (
                    None if has_binary
                    else getattr(cur, "copy_expert", None)
                )
                for b in batches:
                    if copy is not None:
                        # vectorized serialization (the per-cell python
                        # loop eroded the 6x bulk-load win this path
                        # exists for): per column, quote-and-escape the
                        # whole Series, then mask nulls to the unquoted
                        # empty field COPY csv reads as NULL. Same
                        # escaping contract as before — every non-null
                        # value quoted ('' stays '', not NULL).
                        parts = None
                        for c in cols:
                            s = b[c]
                            q = (
                                '"'
                                + s.astype(str).str.replace(
                                    '"', '""', regex=False
                                )
                                + '"'
                            ).mask(s.isna(), "")
                            parts = q if parts is None else parts + "," + q
                        lines = [] if parts is None else parts.tolist()
                        buf = io.StringIO(
                            "\n".join(lines) + ("\n" if lines else "")
                        )
                        copy(copy_sql, buf)
                        n += len(b)
                        continue
                    rows = list(b[cols].itertuples(index=False, name=None))
                    for i in range(0, len(rows), batch_rows):
                        cur.executemany(insert, rows[i : i + batch_rows])
                    n += len(rows)
                con.commit()
            finally:
                cur.close()
        finally:
            con.close()
        yield pd.DataFrame({"n": [n]})

    out = df.mapInPandas(write, "n long")
    from pyspark.sql import functions as F

    return int(out.agg(F.coalesce(F.sum("n"), F.lit(0))).first()[0])
