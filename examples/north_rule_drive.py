"""The north-rule flow, literally, in one spark-submit script:

Iceberg transcript table → snapshot file list (pure-python metadata reader)
→ checkpointed resumable encode (per-partition lineage + compression
metrics) → zone-map-pruned decode spot-check → bit-identity assertion
→ predicate delete + zone-targeted purge → clustering rewrite on the
shifted query key (all on a copy of the state dir) → row-level UPDATE
(redaction pass) → Bloom-indexed point lookup on the time-ordered dir
— run it under a multi-executor master at two cluster sizes:

    zip -qr /tmp/pkg.zip d6tstack_spark
    spark-submit --master 'local-cluster[2,4,4096]' --py-files /tmp/pkg.zip \
        examples/north_rule_drive.py /tmp/north_tbl 0.05
    spark-submit --master 'local-cluster[8,4,4096]' --py-files /tmp/pkg.zip \
        examples/north_rule_drive.py /tmp/north_tbl 0.05

Prints one JSON line per run (throughput, bytes, resume stats). A second
invocation at the same state dir resumes: splits_skipped == splits_planned
and zero new encode work — kill it mid-run to see partial resume.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(work_dir: str, sf: float = 0.05) -> None:
    spark = (
        SparkSession.builder.appName("north-rule-drive")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from d6tstack_spark.datagen import write_transcripts
    from d6tstack_spark.operators.encode import (
        decode_parquet_blocks,
        decode_where,
    )
    from d6tstack_spark.plans.checkpoint import encode_resume, load_manifest
    from d6tstack_spark.plans.metrics import table_totals
    from d6tstack_spark.sources.iceberg_meta import write_iceberg_table_minimal
    from d6tstack_spark.sources.table_io import snapshot_files

    os.makedirs(work_dir, exist_ok=True)
    # 1. the input is an ICEBERG TABLE of transcripts
    src = write_transcripts(os.path.join(work_dir, "data"), sf=sf)
    tbl_dir = os.path.join(work_dir, "iceberg_tbl")
    write_iceberg_table_minimal(tbl_dir, [src])
    files = snapshot_files(spark, tbl_dir)

    # 2. checkpointed, resumable encode with lineage + metrics
    state = os.path.join(work_dir, "state")
    t0 = time.time()
    summary = encode_resume(
        spark, files, state, order_cols=("conv_id", "turn_idx")
    )
    wall = time.time() - t0
    blocks = spark.read.parquet(os.path.join(state, "blocks"))
    totals = table_totals(blocks).first().asDict()

    # 3. decode spot-check: zone-map-pruned slice + full bit-identity
    man = load_manifest(state)
    full_src = spark.read.parquet(src)
    n = full_src.count()
    dec = decode_parquet_blocks(spark, os.path.join(state, "blocks"), man)
    mismatch = (
        dec.exceptAll(full_src).count() + full_src.exceptAll(dec).count()
    )
    first_conv = full_src.agg(F.min("conv_id")).first()[0]
    pruned = decode_parquet_blocks(
        spark,
        os.path.join(state, "blocks"),
        man,
        block_filter=("conv_id", first_conv, first_conv),
    )
    n_pruned = pruned.filter(F.col("conv_id") == first_conv).count()

    # disjunctive SQL slice: the DNF compiler prunes each OR branch
    # independently and unions the qualifying blocks
    last_conv = full_src.agg(F.max("conv_id")).first()[0]
    n_sliced = decode_where(
        spark,
        os.path.join(state, "blocks"),
        man,
        f"conv_id = '{first_conv}' OR (conv_id = '{last_conv}' AND turn_idx < 2)",
    ).count()

    # 4. delete lifecycle: tombstone (merge-on-read) → targeted purge
    # (only zone-affected files rewrite) → decode still exact. Runs on a
    # COPY of the state dir so re-invoking this script still demos the
    # skip-everything resume against the pristine state.
    import shutil

    from d6tstack_spark.plans.checkpoint import decode_state, delete_where
    from d6tstack_spark.plans.maintenance import purge_deletes

    state_del = os.path.join(work_dir, "state_del")
    shutil.rmtree(state_del, ignore_errors=True)
    shutil.copytree(state, state_del)
    # delete by a ts range: the stream is ts-ordered, so the zone maps
    # confine the rewrite to the leading blocks' files (a conv-id range
    # would NOT prune here — a conversation's turns scatter across the
    # whole timeline, and the report would honestly say full rewrite)
    cut_ts = (
        full_src.select("ts")
        .orderBy("ts")
        .offset(int(n * 0.05))
        .limit(1)
        .first()[0]
    )
    del_pred = f"ts < TIMESTAMP '{cut_ts}' AND role = 'user'"
    drep = delete_where(spark, state_del, del_pred)
    prep = purge_deletes(spark, state_del)
    want_after = full_src.filter(f"NOT coalesce(({del_pred}), false)")
    dec2 = decode_state(spark, state_del)
    del_mismatch = (
        dec2.exceptAll(want_after).count() + want_after.exceptAll(dec2).count()
    )

    # 5. the query pattern shifts to conv_id: the ts-clustered dir cannot
    # prune conv slices (a conversation's turns scatter across the whole
    # timeline — every file qualifies), so one clustering rewrite
    # (cluster_blocks, the OPTIMIZE/ZORDER analogue, same journaled
    # commit as the purge above) re-sorts on (conv_id, turn_idx) and the
    # same slice now touches a handful of files.
    from d6tstack_spark.operators.encode import _hadoop_list_files
    from d6tstack_spark.plans.maintenance import cluster_blocks

    def conv_qualifying_files(sd: str, conv: str) -> int:
        bd = os.path.join(sd, "blocks")
        stats = spark.read.parquet(
            *_hadoop_list_files(spark, bd, ".parquet")
        )
        key = conv.encode()
        return (
            stats.filter(F.col("column") == "conv_id")
            .filter(
                (F.col("vmin_str") <= F.lit(key))
                & F.coalesce(F.col("vmax_str") >= F.lit(key), F.lit(True))
            )
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    qual_before = conv_qualifying_files(state_del, first_conv)
    crep = cluster_blocks(
        spark, state_del, cluster_by=("conv_id", "turn_idx")
    )
    qual_after = conv_qualifying_files(state_del, first_conv)
    dec3 = decode_state(
        spark, state_del, where=f"conv_id = '{first_conv}'"
    )
    want3 = want_after.filter(f"conv_id = '{first_conv}'")
    cluster_mismatch = (
        dec3.exceptAll(want3).count() + want3.exceptAll(dec3).count()
    )

    # 6. row-level UPDATE (redaction pass: SET tool for one conv's
    # assistant turns) — zone+Bloom-targeted rewrite under the same
    # journaled commit — and a Bloom point lookup on the pre-cluster
    # TIME-ordered dir, where conv zone ranges span every file and the
    # sidecar is the only pruning.
    from d6tstack_spark.plans.bloomidx import build_bloom_index
    from d6tstack_spark.plans.explain import explain_decode
    from d6tstack_spark.plans.maintenance import update_where

    upd_pred = f"conv_id = '{first_conv}' AND role = 'assistant'"
    from d6tstack_spark.plans.checkpoint import load_snapshots

    pre_upd = load_snapshots(state_del)[-1]["id"]
    urep = update_where(
        spark, state_del, {"tool": "'redacted'"}, upd_pred
    )
    dec4 = decode_state(spark, state_del, where=upd_pred)
    update_ok = (
        dec4.count() == urep["matched"]
        and dec4.filter("tool = 'redacted'").count() == urep["matched"]
    )

    # 6b. snapshot ROLLBACK: undo the redaction — restore the live table
    # to the pre-update snapshot (retired files copy back, the update's
    # rewrite outputs retire; history stays readable both ways).
    from d6tstack_spark.plans.maintenance import rollback_to_snapshot

    rrep = rollback_to_snapshot(spark, state_del, pre_upd)
    dec4b = decode_state(spark, state_del, where=upd_pred)
    rollback_ok = (
        dec4b.count() == urep["matched"]
        and dec4b.filter("tool = 'redacted'").count() == 0
    )

    # a TYPICAL conv (the corpus plants hot convs that appear in nearly
    # every file — those are salting's story, not the index's)
    small_conv = (
        full_src.groupBy("conv_id")
        .count()
        .filter("count <= 12")
        .agg(F.min("conv_id"))
        .first()[0]
    )
    build_bloom_index(spark, state, ["conv_id"])
    plan = explain_decode(
        spark, state, where=f"conv_id = '{small_conv}'"
    )
    dec5 = decode_state(
        spark, state, where=f"conv_id = '{small_conv}'"
    )
    want5 = full_src.filter(f"conv_id = '{small_conv}'")
    bloom_mismatch = (
        dec5.exceptAll(want5).count() + want5.exceptAll(dec5).count()
    )

    # 7. metadata-only aggregation: COUNT(*) from per-block n_rows alone
    # (zero payload reads), and a ts-slice count where zone stats prove
    # most blocks all-match — only boundary blocks decode.
    from d6tstack_spark.plans.fastcount import fast_count, fast_min_max

    fc_all = fast_count(spark, state)
    fc_slice = fast_count(spark, state, where=f"ts >= TIMESTAMP '{cut_ts}'")
    want_slice = full_src.filter(f"ts >= TIMESTAMP '{cut_ts}'").count()
    mm = fast_min_max(spark, state, "conv_id")
    minmax_ok = (mm["min"], mm["max"]) == (first_conv, last_conv)

    print(
        json.dumps(
            {
                "master": spark.sparkContext.master,
                "n_turns": n,
                "encode_wall_sec": round(wall, 3),
                "turns_per_sec": round(n / wall, 1),
                "resume": summary,
                "bytes": {
                    k: (round(float(v), 3) if k == "ratio" else int(v))
                    for k, v in totals.items()
                    if v is not None
                },
                "decode_bit_identical": mismatch == 0,
                "zone_pruned_rows_for_one_conv": n_pruned,
                "or_slice_rows": n_sliced,
                "delete": {
                    "matched": drep.get("matched"),
                    "files_rewritten": prep["files_rewritten"],
                    "files_scanned": prep["files_scanned"],
                    "decode_exact_after_purge": del_mismatch == 0,
                },
                "cluster": {
                    "files": [crep["files_before"], crep["files_after"]],
                    "conv_qualifying_files": [qual_before, qual_after],
                    "decode_exact_after_cluster": cluster_mismatch == 0,
                },
                "update": {
                    "matched": urep["matched"],
                    "files_rewritten": urep["files_rewritten"],
                    "files_scanned": urep["files_scanned"],
                    "decode_exact_after_update": update_ok,
                },
                "rollback": {
                    "files_restored": rrep["files_restored"],
                    "files_retired": rrep["files_retired"],
                    "update_undone_exact": rollback_ok,
                },
                "bloom_point_lookup": {
                    "files_total": plan["files_total"],
                    "files_after_bloom": plan["files_after_bloom"],
                    "decode_exact": bloom_mismatch == 0,
                },
                "fast_count": {
                    "count_star_exact": fc_all["count"] == n,
                    "count_star_mode": fc_all["mode"],
                    "ts_slice_exact": fc_slice["count"] == want_slice,
                    "ts_slice_blocks": [
                        fc_slice["blocks_decoded"],
                        fc_slice["blocks_total"],
                    ],
                    "minmax_exact": minmax_ok,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/north_rule_drive",
        float(sys.argv[2]) if len(sys.argv) > 2 else 0.05,
    )
