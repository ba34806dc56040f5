"""Physical-plan quality gates — the '.explain and iterate' discipline.

These assert the plans we WANT at 100 TB, not just correct answers:
- parquet filter pushdown + column pruning reach the scan;
- small-dimension joins go broadcast;
- aggregations keep partial (map-side) aggregation;
- decode of one block prunes via parquet min/max on block_id;
- whole-stage codegen covers the JVM-side operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_pushdown_and_pruning(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_orderkey") == 7)
        .select("l_orderkey", "l_quantity")
    )
    p = plan(df)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,7)]" in p
    # column pruning: scan reads only the 2 projected columns
    assert "ReadSchema" in p
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_quantity" in read_schema and "l_extendedprice" not in read_schema


def test_broadcast_join_for_small_dim(spark, sf_dir):
    import __spark_entry__ as em

    df = em.queries()["topk_part_revenue"](spark, sf_dir)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    # top-k is TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p.replace("TakeOrdered", "")


def test_partial_aggregation_present(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    p = plan(df)
    # partial_count before the exchange == map-side combine
    assert "partial_count" in p


def test_blocks_scan_prunes_on_block_id(spark, transcripts_path, tmp_path):
    from d6tstack_spark.operators.encode import encode_parquet_files
    from d6tstack_spark.operators.sinks import read_blocks, write_blocks

    blocks, manifest = encode_parquet_files(spark, transcripts_path)
    out = str(tmp_path / "blocks")
    write_blocks(blocks, out)
    some_id = int(read_blocks(spark, out).agg(F.min("block_id")).first()[0])
    one = read_blocks(spark, out).filter(F.col("block_id") == some_id)
    p = plan(one)
    assert "PushedFilters" in p and f"EqualTo(block_id,{some_id})" in p
    assert one.count() == 6  # one row per column


def test_wholestage_codegen_on_text_ops(spark, sf_dir):
    from d6tstack_spark.operators.text import quality_score

    df = quality_score(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    p = plan(df)
    assert "[codegen id :" in p  # whole-stage codegen covers the projection
    assert "BatchEvalPython" not in p  # no row-at-a-time python in the plan


def test_encode_local_mode_has_no_shuffle(spark, transcripts_path):
    from d6tstack_spark.operators.encode import encode_table

    df = spark.read.parquet(transcripts_path)
    blocks, _ = encode_table(df, order_cols=("conv_id", "turn_idx"), mode="local")
    p = plan(blocks)
    assert "Exchange" not in p  # scan → mapInArrow, zero shuffles


def test_encode_cluster_mode_single_shuffle(spark, transcripts_path):
    from d6tstack_spark.operators.encode import encode_table

    df = spark.read.parquet(transcripts_path)
    blocks, _ = encode_table(
        df, order_cols=("conv_id", "turn_idx"), mode="cluster", skew_max_rows=None
    )
    p = plan(blocks)
    # exactly one Exchange node in the plan tree (the block repartition);
    # formatted output prints each node twice (tree + detail section)
    assert p.count("+- Exchange") == 1


def test_blocks_dir_self_describing_manifest(spark, transcripts_path, tmp_path):
    """save_manifest makes a plain write_blocks dir decodable by path alone
    in a later session: load_blocks_manifest + decode_parquet_blocks round
    trip, and the underscore-named sidecar is invisible to both the Spark
    parquet reader and the bulk decoder's *.parquet listing."""
    import pandas as pd

    from d6tstack_spark.operators.encode import (
        decode_parquet_blocks,
        encode_parquet_files,
    )
    from d6tstack_spark.operators.sinks import write_blocks
    from d6tstack_spark.plans.checkpoint import (
        load_blocks_manifest,
        save_manifest,
    )

    blocks, man = encode_parquet_files(
        spark, transcripts_path, order_cols=("conv_id", "turn_idx")
    )
    bdir = str(tmp_path / "blocks")
    write_blocks(blocks, bdir)
    save_manifest(man, bdir)
    man2 = load_blocks_manifest(bdir)
    assert man2 == man
    # sidecar present but ignored by the parquet scan of the same dir
    assert (tmp_path / "blocks" / "_manifest.json").exists()
    cols = spark.read.parquet(bdir).columns
    assert "column" in cols and "payload" in cols
    dec = decode_parquet_blocks(spark, bdir, man2)
    want = (
        spark.read.parquet(transcripts_path)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    got = dec.orderBy("conv_id", "turn_idx").toPandas()[want.columns.tolist()]
    pd.testing.assert_frame_equal(
        want.reset_index(drop=True), got.reset_index(drop=True)
    )
