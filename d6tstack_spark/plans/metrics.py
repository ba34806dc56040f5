"""Compression-ratio / lineage metrics over the blocks table.

Generalizes the reference's pluggable logger + sync size totals
(utils.py:7-12, sync.py:140-141) into queryable metric DataFrames — the
blocks table IS the lineage record (SURVEY.md §2.4 A6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def compression_rollup(blocks: DataFrame) -> DataFrame:
    """Per (column, codec): blocks, rows, raw/encoded bytes, ratio."""
    return (
        blocks.groupBy("column", "codec")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("n_rows").alias("rows"),
            F.sum("null_count").alias("nulls"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
        )
        .withColumn(
            "ratio",
            F.round(
                F.col("raw_bytes").cast("double")
                / F.greatest(F.col("enc_bytes"), F.lit(1)).cast("double"),
                3,
            ),
        )
        .orderBy("column", "codec")
    )


def table_totals(blocks: DataFrame) -> DataFrame:
    """Whole-table totals: encoded vs raw bytes and overall ratio."""
    return blocks.agg(
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        F.countDistinct("block_id").alias("n_blocks"),
        (
            F.sum("raw_bytes").cast("double")
            / F.greatest(F.sum("enc_bytes"), F.lit(1)).cast("double")
        ).alias("ratio"),
    )
