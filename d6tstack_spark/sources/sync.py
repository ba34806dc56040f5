"""Incremental file-tree sync (SURVEY.md §2.1 S13) — the reference's
FTP/S3 sync (sync.py:61-164) re-expressed Spark-first:

- listings are DataFrames from the ``binaryFile`` source with the content
  column PRUNED (metadata-only scan: path, size, mtime) — the reference's
  os.walk / FTP listing generalized to any Hadoop-compatible filesystem
  (file://, s3a://, hdfs://, ...);
- the sync set is a ``left_anti`` join on relative path (the reference's
  set().difference, sync.py:137-145), optionally widened by size mismatch;
- the copy itself is DISTRIBUTED: each task copies its slice of the missing
  list (the reference copies serially on the driver, sync.py:155-164).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F


def list_files(spark: SparkSession, root: str) -> DataFrame:
    """Recursive file manifest of a directory tree: (relpath, length,
    mtime). Content is never projected, so the binaryFile scan reads only
    file status — a pure metadata listing at any scale."""
    marker = os.path.abspath(root).rstrip("/") + "/"
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    return df.select(
        F.substring_index(F.col("path"), marker, -1).alias("relpath"),
        F.col("length"),
        F.col("modificationTime").alias("mtime"),
    )


def files_to_sync(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    include_size_mismatch: bool = True,
) -> DataFrame:
    """Files present in src but missing (or size-drifted) in dst —
    the reference's get_files_for_sync as one anti-join plus an optional
    size-compare join."""
    src = list_files(spark, src_dir)
    if not os.path.isdir(dst_dir) or not os.listdir(dst_dir):
        return src.select("relpath", "length")
    dst = list_files(spark, dst_dir)
    missing = src.join(dst, "relpath", "left_anti").select("relpath", "length")
    if not include_size_mismatch:
        return missing
    drifted = (
        src.alias("s")
        .join(dst.alias("d"), "relpath")
        .filter(F.col("s.length") != F.col("d.length"))
        .select("relpath", F.col("s.length").alias("length"))
    )
    return missing.unionByName(drifted)


def sync_dirs(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    include_size_mismatch: bool = True,
) -> dict:
    """Copy every missing/drifted file from src to dst (distributed) and
    return {'n_files', 'total_bytes'} — the reference's upload_ftp_files
    summary (sync.py:129-152)."""
    todo = files_to_sync(spark, src_dir, dst_dir, include_size_mismatch)
    src_abs = os.path.abspath(src_dir)
    dst_abs = os.path.abspath(dst_dir)
    os.makedirs(dst_abs, exist_ok=True)

    def copy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import shutil

        for b in batches:
            done = []
            for rel in b["relpath"]:
                s = os.path.join(src_abs, rel)
                d = os.path.join(dst_abs, rel)
                os.makedirs(os.path.dirname(d), exist_ok=True)
                shutil.copy2(s, d)
                done.append((rel, os.path.getsize(d)))
            yield pd.DataFrame(done, columns=["relpath", "nbytes"])

    copied = todo.repartition(
        max(spark.sparkContext.defaultParallelism, 1), "relpath"
    ).mapInPandas(copy, "relpath string, nbytes long")
    row = copied.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("nbytes"), F.lit(0)).alias("b")
    ).first()
    return {"n_files": int(row["n"]), "total_bytes": int(row["b"])}
