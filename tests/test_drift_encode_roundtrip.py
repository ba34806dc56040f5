"""FIXTURES.md T2: schema-drift variants → unify → encode → decode →
bit-identical vs an independently-built unionByName golden — the full
d6tstack combine pipeline fused with the codec layer (the reference's
golden-construction pattern, tests/test_combine_csv.py:103-109, composed
with its write→read equivalence pattern, :434-466)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from d6tstack_spark.operators.encode import decode_table, encode_table
from d6tstack_spark.operators.stack import stack


@pytest.fixture(scope="module")
def drift_parts(spark, transcripts_path):
    df = spark.read.parquet(transcripts_path)
    m = F.pmod(F.xxhash64("conv_id"), F.lit(4))
    clean = df.filter(m == 0)
    colmismatch = df.filter(m == 1).withColumn(
        "tokens", F.size(F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"))
    )
    reorder = df.filter(m == 2).select(
        "conv_id", "turn_idx", "text", "role", "tool", "ts"  # (role,text) swapped
    )
    renamed = df.filter(m == 3).withColumnRenamed("text", "content")
    return df, [clean, colmismatch, reorder, renamed]


def test_drift_unify_encode_decode_bitidentical(spark, drift_parts):
    df, parts = drift_parts
    unified = stack(parts, rename_maps=[None, None, None, {"content": "text"}])

    # golden built independently with unionByName(allowMissingColumns=True)
    golden = (
        parts[0]
        .unionByName(parts[1], allowMissingColumns=True)
        .unionByName(parts[2], allowMissingColumns=True)
        .unionByName(
            parts[3].withColumnRenamed("content", "text"),
            allowMissingColumns=True,
        )
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )

    blocks, manifest = encode_table(unified, order_cols=("conv_id", "turn_idx"))
    out = (
        decode_table(blocks, manifest)
        .orderBy("conv_id", "turn_idx")
        .toPandas()[golden.columns.tolist()]
    )
    pd.testing.assert_frame_equal(golden, out)

    # the drift column is null exactly where its partition didn't have it
    n_mismatch = parts[1].count()
    assert out["tokens"].notna().sum() == n_mismatch
    # every original row survived
    assert len(out) == df.count()
