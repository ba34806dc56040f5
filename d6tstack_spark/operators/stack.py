"""Schema-aligning stack (UNION ALL of drifted sources) — d6tstack's core
combine semantics re-expressed Spark-first.

Reference behavior being generalized (SURVEY.md §2.2, §2.7):
- per-file rename maps with conflict resolution (combine_csv.py:276-292)
- reindex onto the unified column set, absent → null (combine_csv.py:100)
- canonical column ORDER = statistical mode of each column's positional
  index across sources, tie-broken by mode count (combine_csv.py:161-172)
- provenance columns filepath/filename (combine_csv.py:103-105)
- apply_after_read per-chunk hook (combine_csv.py:101-102) → per-source
  DataFrame transform hook

Everything is metadata algebra + unionByName: no custom shuffle; Catalyst
prunes columns straight through the union.
"""

from __future__ import annotations

import warnings
from collections import Counter
from functools import reduce
from typing import Callable, Sequence

from pyspark.sql import DataFrame, functions as F


def apply_renames(df: DataFrame, rename: dict[str, str] | None) -> DataFrame:
    """Per-source rename with the reference's conflict rule: a rename whose
    target already exists in the source is dropped with a warning
    (combine_csv.py:276-292 — minus its `k in k in` typo bug, SURVEY.md §4)."""
    if not rename:
        return df
    safe = {}
    for old, new in rename.items():
        if old not in df.columns:
            continue
        if new in df.columns and new != old:
            warnings.warn(
                f"rename {old!r}->{new!r} conflicts with existing column; skipped"
            )
            continue
        safe[old] = new
    return df.withColumnsRenamed(safe) if safe else df


def columns_all(dfs: Sequence[DataFrame]) -> list[str]:
    """Union of column sets in canonical order (see :func:`canonical_order`)."""
    return canonical_order(dfs)


def columns_common(dfs: Sequence[DataFrame]) -> list[str]:
    """Sorted intersection of column sets (helpers.py:77-82)."""
    common = set(dfs[0].columns)
    for d in dfs[1:]:
        common &= set(d.columns)
    return sorted(common)


def columns_unique(dfs: Sequence[DataFrame]) -> list[str]:
    """Columns not present in every source (combine_csv.py:170)."""
    return sorted(set(canonical_order(dfs)) - set(columns_common(dfs)))


def canonical_order(dfs: Sequence[DataFrame]) -> list[str]:
    """Mode of each column's positional index across sources, ties broken by
    (mode count desc, name) — the reference's scipy.stats.mode ordering
    (combine_csv.py:161-172) in pure python over schema metadata."""
    positions: dict[str, list[int]] = {}
    for d in dfs:
        for i, c in enumerate(d.columns):
            positions.setdefault(c, []).append(i)
    keyed = []
    for c, pos in positions.items():
        mode_pos, mode_cnt = Counter(pos).most_common(1)[0]
        keyed.append((mode_pos, -mode_cnt, c))
    return [c for _, _, c in sorted(keyed)]


def align_to(df: DataFrame, columns: list[str]) -> DataFrame:
    """Project onto the unified column list; absent columns become typed
    nulls at unionByName time (reindex, combine_csv.py:100)."""
    present = set(df.columns)
    return df.select(*[c for c in columns if c in present])


def stack(
    dfs: Sequence[DataFrame],
    rename_maps: Sequence[dict[str, str] | None] | None = None,
    source_names: Sequence[str] | None = None,
    columns_select: list[str] | None = None,
    columns_common_only: bool = False,
    apply_after_read: Callable[[DataFrame], DataFrame] | None = None,
    add_filename: bool = False,
    filename_col: str = "filename",
) -> DataFrame:
    """UNION ALL of schema-drifted sources with by-name alignment.

    Mirrors CombinerCSV.to_pandas/combine semantics (combine_csv.py:351-360):
    rename → align → apply hook → provenance → unionByName(null-fill).
    """
    rename_maps = rename_maps or [None] * len(dfs)
    renamed = [apply_renames(d, m) for d, m in zip(dfs, rename_maps)]
    if columns_select:
        dup = [c for c, k in Counter(columns_select).items() if k > 1]
        if dup:
            raise ValueError(f"duplicate columns in select: {dup}")  # :89-91
        target = columns_select
    elif columns_common_only:
        target = columns_common(renamed)
    else:
        target = canonical_order(renamed)
    parts = []
    for i, d in enumerate(renamed):
        p = align_to(d, target)
        if apply_after_read is not None:
            p = apply_after_read(p)
        if add_filename:
            name = (
                source_names[i]
                if source_names is not None
                else f"source-{i}"
            )
            p = p.withColumn(filename_col, F.lit(name))
        parts.append(p)
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
    )


def presence_matrix(dfs: Sequence[DataFrame], names: Sequence[str]) -> DataFrame:
    """file×column presence/position metadata DataFrame (combine_csv.py:147-158)
    — sniff output as data, queryable with ordinary Spark ops."""
    spark = dfs[0].sparkSession
    rows = [
        (names[i], c, pos)
        for i, d in enumerate(dfs)
        for pos, c in enumerate(d.columns)
    ]
    return spark.createDataFrame(rows, "file string, column string, position int")
