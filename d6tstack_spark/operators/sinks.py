"""Sinks — the reference's output surface (SURVEY.md §2.11 K1-K14)
re-expressed as Spark writers.

Mapping:
- to_csv_combine   ← combine_csv.py:436-457 (all files → one CSV, header once)
- to_csv_align     ← combine_csv.py:406-434 (one cleaned file per source)
- to_parquet_combine ← combine_csv.py:486-504
- to_parquet_align ← combine_csv.py:459-484
- to_jdbc          ← to_sql/psql/mysql_combine (combine_csv.py:506-628) —
  Spark's jdbc writer already batches; the reference's COPY FROM insight
  ("bulk native beats per-row", measured 6×, examples-sql.ipynb) is the same
  argument as our Arrow-blocks path (SURVEY.md §4 R6)
- write_blocks / read_blocks — the engine's own encoded sink (K4's
  generalization per the north rule)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def to_csv_combine(df: DataFrame, path: str, mode: str = "overwrite", **options):
    """Single combined CSV (one file: coalesce(1) — only for small exports,
    like the reference's single-file writer)."""
    df.coalesce(1).write.mode(mode).options(header=True, **options).csv(path)


def to_csv_head(
    df: DataFrame, path: str, n: int = 3, mode: str = "overwrite", **options
):
    """Preview sink: first n rows as one CSV (K1, combine_csv.py:383-404)."""
    df.limit(n).coalesce(1).write.mode(mode).options(header=True, **options).csv(path)


def to_csv_align(
    df: DataFrame, path: str, source_col: str = "filename", mode: str = "overwrite",
    **options,
):
    """One output directory per source file (partitionBy provenance column) —
    the aligned-per-file layout of to_csv_align."""
    df.write.mode(mode).partitionBy(source_col).options(header=True, **options).csv(
        path
    )


def to_parquet_combine(df: DataFrame, path: str, mode: str = "overwrite", **options):
    df.write.mode(mode).options(**options).parquet(path)


def to_parquet_align(
    df: DataFrame, path: str, source_col: str = "filename", mode: str = "overwrite",
    **options,
):
    df.write.mode(mode).partitionBy(source_col).options(**options).parquet(path)


def to_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "error", **options
):
    """JDBC sink (needs a driver jar on the classpath — driven live in
    tests against embedded Derby, jdbc:derby:memory:...)."""
    df.write.mode(mode).format("jdbc").options(url=url, dbtable=table, **options).save()


def write_blocks(
    blocks: DataFrame, path: str, mode: str = "overwrite",
    compression: str = "uncompressed",
):
    """Encoded-blocks sink: parquet of binary payloads + codec manifest
    columns. Partitioned by nothing on purpose — block_id pruning happens
    via parquet min/max stats on the sorted block_id column.

    Default compression is ``uncompressed``: the payloads are already
    entropy-coded by the engine's own codecs, so snappy on top buys <2%
    bytes for a measurable CPU/bandwidth cost on every write AND read —
    at 100 TB that tax is the difference between a write-bound and an
    encode-bound job. Parquet dictionary encoding is off for the same
    reason: payloads are unique multi-MB blobs — the writer would hash
    every page into a dictionary only to abandon it.

    The shuffle-free bulk decode (encode.decode_parquet_blocks) relies on
    every block's column-rows living in ONE file; a nonzero
    spark.sql.files.maxRecordsPerFile would let the writer split a block
    across files, so it is rejected here rather than failing at decode."""
    max_rec = blocks.sparkSession.conf.get(
        "spark.sql.files.maxRecordsPerFile", "0"
    )
    if int(max_rec or 0) > 0:
        raise ValueError(
            "write_blocks requires spark.sql.files.maxRecordsPerFile=0: a "
            f"per-file record cap (currently {max_rec}) can split one "
            "block's column-rows across files, breaking the per-file "
            "complete-block invariant the shuffle-free decode path depends on"
        )
    blocks.sortWithinPartitions("block_id").write.mode(mode).option(
        "compression", compression
    ).option("parquet.enable.dictionary", "false").parquet(path)


def read_blocks(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
