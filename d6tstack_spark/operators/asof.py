"""As-of join — for every left row, the most recent right row at or before
it (per key). Spark has no built-in; the naive formulation is a non-equi
range join (quadratic per key). This is the scale formulation:

    union both sides (tagged) → one window per key ordered by (time, side)
    → last non-null right-payload carried forward → keep left rows.

One shuffle on the key, linear work, no range join, no driver state —
the standard big-data as-of (same shape Flink/kdb use for time-series
joins). Ties (equal timestamps) resolve to the right row sorting BEFORE
the left row, i.e. a right row AT the left timestamp matches — DuckDB's
ASOF JOIN (>=) semantics, which the oracle uses verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Join each left row to the latest right row with ``right.on <=
    left.on`` (within ``by`` groups). Returns all left columns plus the
    chosen ``right_cols`` (suffixed; null when no right row precedes).

    ``on``: ordering column name present in both sides (numeric or
    timestamp). ``by``: equality key column(s) present in both sides."""
    by = [by] if isinstance(by, str) else list(by or [])
    right_cols = right_cols or [
        c for c in right.columns if c != on and c not in by
    ]
    l_tag = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
    )
    r_tag = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    ).orderBy("__t", "__side").rowsBetween(Window.unboundedPreceding, 0)
    filled = u.select(
        "__side",
        "__lrow",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_cols
        ],
    ).filter(F.col("__side") == 1)
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in right_cols]
    return filled.select(*out_cols)
