"""Table layer interface: Iceberg catalog when the runtime jar is present,
hash-partitioned parquet + our JSON manifest otherwise (SURVEY.md §7 step 0
— the sandbox has no iceberg-spark-runtime on the classpath, so the parquet
fallback is the tested path; the Iceberg branch is the same call surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read an Iceberg table reference (``catalog.db.table``), an Iceberg
    table DIRECTORY (snapshot resolved via the pure-python metadata reader
    — no runtime jar needed; v2 position deletes applied merge-on-read),
    or a plain parquet path."""
    if "/" not in ref and iceberg_available(spark):
        return spark.read.table(ref)
    from d6tstack_spark.sources.iceberg_meta import (
        is_iceberg_dir,
        snapshot_files_detail,
    )

    if is_iceberg_dir(ref):
        detail = snapshot_files_detail(ref)
        if not detail["data"]:
            raise ValueError(f"Iceberg snapshot at {ref} has no data files")
        df = spark.read.parquet(*[f["path"] for f in detail["data"]])
        if detail["position_deletes"]:
            df = _apply_position_deletes(
                spark, df, [f["path"] for f in detail["position_deletes"]]
            )
        for f in detail["equality_deletes"]:
            df = _apply_equality_deletes(spark, df, f["path"])
        return df
    return spark.read.parquet(ref)


def _apply_equality_deletes(
    spark: SparkSession, df: DataFrame, delete_path: str
) -> DataFrame:
    """Merge-on-read equality deletes: the delete file's columns ARE its
    equality ids (spec: a row matches when it equals a delete row on those
    columns); null-safe equality via an eqNullSafe anti-join condition."""
    from functools import reduce

    dels = spark.read.parquet(delete_path)
    bad = [c for c in dels.columns if c not in df.columns]
    if bad:
        raise ValueError(
            f"equality-delete file {delete_path} names columns {bad} "
            "absent from the table"
        )
    d = dels.dropDuplicates().alias("__eq_del")
    cond = reduce(
        lambda a, b: a & b,
        [df[c].eqNullSafe(d[c]) for c in dels.columns],
    )
    from pyspark.sql import functions as F

    return df.join(F.broadcast(d), cond, "left_anti")


def _apply_position_deletes(
    spark: SparkSession, df: DataFrame, delete_paths: list[str]
) -> DataFrame:
    """Merge-on-read: drop (file, row-position) pairs named by v2
    position-delete files. Row identity comes from the parquet reader's
    ``_metadata`` columns (file_path, row_index); the delete set is small
    relative to data, so the anti-join broadcasts."""
    from pyspark.sql import functions as F

    strip = lambda c: F.regexp_replace(c, "^file:(//)?", "")  # noqa: E731
    dels = (
        spark.read.parquet(*delete_paths)
        .select(
            strip(F.col("file_path")).alias("__fp"),
            F.col("pos").alias("__pos"),
        )
    )
    cols = df.columns
    return (
        df.select(
            "*",
            strip(F.col("_metadata.file_path")).alias("__fp"),
            F.col("_metadata.row_index").alias("__pos"),
        )
        .join(F.broadcast(dels), ["__fp", "__pos"], "left_anti")
        .select(*cols)
    )


def write_table(
    df: DataFrame, ref: str, mode: str = "append", partition_by: list[str] | None = None
) -> None:
    """Append to an Iceberg table (hidden partitioning) or parquet path
    (explicit partitionBy)."""
    if "/" not in ref and iceberg_available(df.sparkSession):
        df.writeTo(ref).append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)


def snapshot_files(spark: SparkSession, ref: str) -> list[str]:
    """The file listing an encode job plans over: Iceberg snapshot manifest
    (catalog table via the jar, or a table directory via the pure-python
    metadata reader), else a parquet directory listing (deterministic
    order)."""
    if "/" not in ref and iceberg_available(spark):
        return [
            r["file_path"]
            for r in spark.sql(f"SELECT file_path FROM {ref}.files").collect()
        ]
    import glob
    import os

    from d6tstack_spark.sources.iceberg_meta import (
        is_iceberg_dir,
        snapshot_data_files,
    )

    if is_iceberg_dir(ref):
        return sorted(f["path"] for f in snapshot_data_files(ref))
    if os.path.isfile(ref):
        return [ref]
    return sorted(glob.glob(os.path.join(ref, "*.parquet")))


def encode_iceberg_table(
    spark: SparkSession, table_dir: str, order_cols=("conv_id", "turn_idx"), **kw
):
    """Encode an Iceberg table directory with the right strategy for its
    snapshot state: no delete files → the scan-fused zero-shuffle path over
    the snapshot's data files; v2 deletes present → merge-on-read first
    (``read_table``) and encode the MERGED rows — encoding the raw files
    would silently bake deleted rows into the blocks.

    Returns ``(blocks_df, manifest)`` like the underlying encoders."""
    from d6tstack_spark.operators.encode import encode_parquet_files, encode_table
    from d6tstack_spark.sources.iceberg_meta import snapshot_files_detail

    detail = snapshot_files_detail(table_dir)
    if not detail["position_deletes"] and not detail["equality_deletes"]:
        return encode_parquet_files(
            spark, [f["path"] for f in detail["data"]], order_cols=order_cols, **kw
        )
    return encode_table(read_table(spark, table_dir), order_cols=order_cols, **kw)
