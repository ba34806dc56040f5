"""EXPLAIN for state-dir reads: a dry-run of the planning every decode
path does, reported instead of executed.

At 100 TB the difference between a healthy and a pathological read is
*which files the plan keeps*, and that decision happens across three
layers (snapshot resolution → Bloom sidecar → zone-map DNF) plus the
tombstone generations that will be applied merge-on-read. This module
runs exactly those planning steps — the same compilers and the same
stats-only scans, no payload I/O — and returns the counts and the
compiled predicate so a user can see WHY a query reads what it reads
(the `EXPLAIN` / `DESCRIBE DETAIL` of the block format).

Reference analog: d6tstack prints per-file sniff reports before
combining (combine_csv.py preview mode); this is the same
inspect-before-you-run contract for the decode side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F


def resolve_read_state(
    spark: SparkSession, state_dir: str, snapshot: int | None = None
) -> tuple[dict, list[str], list[dict], dict]:
    """The read-planning preamble every state-dir consumer performs:
    refuse a mid-swap purge journal, load the manifest, resolve the
    blocks-file set (live listing or snapshot log), and scope the
    visible tombstones. Returns ``(manifest, basenames, visible_tombstones,
    first_seen_ids)`` — exactly the inputs :func:`decode_state` plans
    from, without touching any payload."""
    from d6tstack_spark.operators.encode import _hadoop_list_files
    from d6tstack_spark.plans.checkpoint import (
        _blocks_dir,
        _first_seen_ids,
        _purge_journal_path,
        _visible_tombstones,
        load_deletes,
        load_manifest,
        load_snapshots,
        resolve_snapshot,
    )

    if os.path.exists(_purge_journal_path(state_dir)):
        raise RuntimeError(
            f"state dir {state_dir} has an in-flight purge commit journal; "
            "replay it (any writer entry point) before planning reads"
        )
    manifest = load_manifest(state_dir)
    deletes = load_deletes(state_dir)
    recs = load_snapshots(state_dir)

    if snapshot is not None:
        recorded = {
            t["id"]
            for r in recs
            if r["op"] == "delete"
            for t in r.get("tombstones", [])
        }
        unscoped = [d for d in deletes if d["id"] not in recorded]
        if unscoped:
            # decode_state(snapshot=) refuses these; the planners must
            # refuse identically or fast_count/explain would answer for
            # a read the decode rejects
            raise ValueError(
                f"state dir {state_dir} has pending tombstone(s) "
                f"{[d['id'] for d in unscoped]} with no snapshot record; "
                "run plans.maintenance.purge_deletes() first or plan live"
            )
        basenames = resolve_snapshot(state_dir, snapshot)
        vis = _visible_tombstones(recs, snapshot)
        seen = _first_seen_ids(recs, snapshot)
    else:
        basenames = sorted(
            os.path.basename(p)
            for p in _hadoop_list_files(
                spark, _blocks_dir(state_dir), ".parquet"
            )
        )
        from d6tstack_spark.plans.checkpoint import _live_visibility

        vis, seen = _live_visibility(recs, deletes)
    return manifest, basenames, vis, seen


def explain_decode(
    spark: SparkSession,
    state_dir: str,
    where: str | None = None,
    columns: list[str] | None = None,
    snapshot: int | None = None,
) -> dict:
    """Plan (but do not run) ``decode_state(spark, state_dir, where=...,
    columns=..., snapshot=...)``. Returns::

        {
          "files_total":        files the read starts from (snapshot- or
                                live-resolved),
          "files_after_bloom":  after Bloom point-lookup pruning,
          "files_after_zone":   after the zone-map stats scan (the final
                                file count the bulk decode plans),
          "zone_dnf":           the compiled OR-of-ANDs, or None when the
                                predicate is unprunable,
          "bloom_columns":      indexed columns consulted (None = no
                                sidecar),
          "tombstones_visible": pending tombstones the read will apply,
          "tombstone_generations": distinct applicable-tombstone file
                                groups (each decodes separately),
          "est_rows_scanned":   sum of n_rows over the qualifying blocks
                                of the kept files (what the tasks will
                                actually decode, before the exact row
                                filter),
          "columns_decoded":    projection incl. predicate/tombstone
                                columns decoded-then-dropped,
        }

    Planning only — the numbers come from the metadata/stats scans the
    real read performs, so they are exact for the plan, not estimates of
    the result (the exact row filter still runs on decode)."""
    import math

    from d6tstack_spark.operators.encode import (
        _strip_evolved_unprunable,
        _zone_keep_condition,
        zone_dnf_from_where,
    )
    from d6tstack_spark.plans.bloomidx import (
        bloom_prune_basenames,
        load_bloom_meta,
    )
    from d6tstack_spark.plans.checkpoint import _resolve_block_paths

    manifest, basenames, vis, seen = resolve_read_state(
        spark, state_dir, snapshot
    )
    report: dict = {
        "files_total": len(basenames),
        "tombstones_visible": len(vis),
    }

    # tombstone generations: same grouping the scoped decode performs
    gens = set()
    for b in basenames:
        add = seen.get(b, math.inf)
        gens.add(
            frozenset(
                t["id"]
                for t in vis
                if t.get("_rec") is None or add < t["_rec"]
            )
        )
    report["tombstone_generations"] = len(gens) if basenames else 0

    # layer 2: Bloom sidecar
    meta = load_bloom_meta(state_dir)
    report["bloom_columns"] = meta["columns"] if meta else None
    if where is not None and basenames:
        basenames = bloom_prune_basenames(
            spark, state_dir, manifest, where, basenames
        )
    report["files_after_bloom"] = len(basenames)

    # layer 3: zone-map DNF (the driver half of the bulk decode's pruning)
    dnf = None
    if where is not None:
        dnf = zone_dnf_from_where(where, manifest) or None
        dnf = _strip_evolved_unprunable(dnf, manifest)
    report["zone_dnf"] = dnf
    paths = _resolve_block_paths(state_dir, basenames)
    est_rows = 0
    if paths:
        stats = spark.read.parquet(*paths)
        if dnf and "vmin_num" in stats.columns:
            qual = None
            for branch in dnf:
                branch_df = None
                for bf in branch:
                    col, keep = _zone_keep_condition(manifest, bf)
                    s = (
                        stats.filter(F.col("column") == col)
                        .filter(keep)
                        .select(F.input_file_name().alias("f"), "block_id")
                        .distinct()
                    )
                    branch_df = (
                        s
                        if branch_df is None
                        else branch_df.join(s, ["f", "block_id"], "inner")
                    )
                qual = (
                    branch_df
                    if qual is None
                    else qual.unionByName(branch_df)
                )
            kept = qual.join(
                stats.groupBy(
                    F.input_file_name().alias("f"), "block_id"
                ).agg(F.max("n_rows").alias("r")),
                ["f", "block_id"],
            )
            agg = kept.agg(
                F.countDistinct("f").alias("nf"), F.sum("r").alias("rows")
            ).collect()[0]
            report["files_after_zone"] = int(agg["nf"] or 0)
            est_rows = int(agg["rows"] or 0)
        else:
            agg = (
                stats.groupBy(
                    F.input_file_name().alias("f"), "block_id"
                )
                .agg(F.max("n_rows").alias("r"))
                .agg(F.sum("r").alias("rows"))
                .collect()[0]
            )
            report["files_after_zone"] = len(paths)
            est_rows = int(agg["rows"] or 0)
    else:
        report["files_after_zone"] = 0
    report["est_rows_scanned"] = est_rows

    # projection incl. decode-then-drop columns (predicate + tombstones)
    if columns is None:
        report["columns_decoded"] = list(manifest)
    else:
        import re

        need = list(columns)
        texts = [where or ""] + [
            t.get("where", "") for t in vis if t.get("kind") != "keys"
        ]
        for t in vis:
            if t.get("kind") == "keys":
                texts.append(" ".join(t.get("cols", [])))
        blob = " ".join(texts)
        for c in manifest:
            if c not in need and re.search(
                rf"\b{re.escape(c)}\b", blob, re.IGNORECASE
            ):
                need.append(c)
        report["columns_decoded"] = need
    return report
