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
        if detail["position_deletes"] or detail["equality_deletes"]:
            df = _merge_on_read(spark, df, detail)
        return df
    return spark.read.parquet(ref)


def _merge_on_read(spark: SparkSession, df: DataFrame, detail: dict) -> DataFrame:
    """Apply v2 delete files with spec-correct sequence-number scoping.

    Per the Iceberg v2 spec, a POSITION delete applies to data files with
    data sequence number ≤ its own, and an EQUALITY delete only to data
    files with sequence number STRICTLY LESS than its own — so a row
    re-inserted after an equality delete was committed stays live. Without
    the scoping, reading such a table silently drops the re-inserted row
    (round-3 review finding).

    Each row learns its data file's sequence number via a broadcast join
    of the (tiny) per-file manifest metadata on ``_metadata.file_path``;
    delete sets are small relative to data, so every anti-join broadcasts.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    strip = lambda c: F.regexp_replace(c, "^file:(//)?", "")  # noqa: E731
    cols = df.columns
    seq_lookup = F.broadcast(
        spark.createDataFrame(
            [(f["path"], f.get("sequence_number", 0)) for f in detail["data"]],
            "__fp string, __seq long",
        )
    )
    merged = df.select(
        "*",
        strip(F.col("_metadata.file_path")).alias("__fp"),
        F.col("_metadata.row_index").alias("__pos"),
    ).join(seq_lookup, "__fp", "left")

    for pdel in detail["position_deletes"]:
        dseq = pdel.get("sequence_number", 0)
        dels = spark.read.parquet(pdel["path"]).select(
            strip(F.col("file_path")).alias("__dfp"),
            F.col("pos").alias("__dpos"),
        )
        cond = (
            (merged["__fp"] == dels["__dfp"])
            & (merged["__pos"] == dels["__dpos"])
            & (merged["__seq"] <= F.lit(dseq))
        )
        merged = merged.join(F.broadcast(dels), cond, "left_anti")

    for edel in detail["equality_deletes"]:
        dseq = edel.get("sequence_number", 0)
        dels = spark.read.parquet(edel["path"])
        bad = [c for c in dels.columns if c not in cols]
        if bad:
            raise ValueError(
                f"equality-delete file {edel['path']} names columns {bad} "
                "absent from the table"
            )
        # the delete file's columns ARE its equality ids (null-safe match)
        d = dels.dropDuplicates().alias("__eq_del")
        cond = reduce(
            lambda a, b: a & b,
            [merged[c].eqNullSafe(d[c]) for c in dels.columns],
        ) & (merged["__seq"] < F.lit(dseq))
        merged = merged.join(F.broadcast(d), cond, "left_anti")
    return merged.select(*cols)


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
