"""Bloom-filter file index over encoded state dirs — point-lookup pruning
on columns the zone maps cannot help with.

Zone maps prune by [min, max]: perfect on the clustering key, useless for
``conv_id = 'x'`` on a time-ordered table where every file's conv range
spans the alphabet. This sidecar closes that gap the way Iceberg's Puffin
blobs do: one Bloom bitmap per (blocks file, column), built by a separate
maintenance pass (:func:`build_bloom_index` — the encode hot path is
untouched), stored as parquet ``array<long>`` words under
``<state>/bloomidx/``. At read time :func:`~d6tstack_spark.plans.
checkpoint.decode_state` consults it automatically: equality / IN atoms in
the WHERE's zone DNF probe the bitmaps IN SPARK (``element_at`` +
shift/mask — no driver-side index scan), and only files the index
positively rules out are dropped.

Correctness never depends on the index — it is advisory in every
direction. Files with no index row (appended after the build, or a
rewrite's replacements) are always kept; a branch of the DNF with no
indexed point atom keeps everything; false positives only cost I/O. A
file a bitmap rules out truly cannot contain the value (no false
negatives: the build hashes every distinct value of the file). Staleness
therefore only ever WIDENS the read set; rebuild after heavy churn to
restore selectivity.

Scale: the index is ~``m_bits/8`` bytes per (file, column) — at the
default 2 MiB-bit (256 KiB) sizing, a 100 TB dir with 10⁵ files carries a
~25 GB sidecar per column, scanned distributedly at probe time (a
metadata-sized job) and never collected; only the surviving file NAMES
reach the driver. fpp at the default sizing stays <1% up to ~150k
distinct values per file.

Reference analog: d6tstack has no secondary index; this generalizes its
"sniff once, reuse per file" metadata pattern (csv_sniff_all,
combine_csv.py) to value-membership metadata.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import time

from pyspark.sql import SparkSession, functions as F

BLOOM_K = 6
DEFAULT_M_BITS = 1 << 21  # 256 KiB per (file, column); fpp<1% @ ~150k NDV

_INDEXABLE_PTYPES = ("str", "bin", "i8", "i16", "i32", "i64")


def _bloom_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "bloomidx")


def _bloom_meta_path(state_dir: str) -> str:
    return os.path.join(_bloom_dir(state_dir), "meta.json")


def _bloom_data_dir(state_dir: str) -> str:
    return os.path.join(_bloom_dir(state_dir), "data")


def _positions(data: bytes, m_bits: int) -> list[int]:
    """k Bloom bit positions via double hashing over one md5 — the same
    stdlib-only construction the dedup operators use, so build and probe
    cannot drift."""
    d = hashlib.md5(data).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:16], "little") | 1  # odd → full-period stride
    return [(h1 + i * h2) % m_bits for i in range(BLOOM_K)]


def _canonical_bytes(value, m: dict) -> bytes | None:
    """PHYSICAL column value → hash input. None = not hashable here
    (conservative: the caller must treat the atom as unprunable)."""
    ptype = m["ptype"]
    if ptype == "str":
        return value.encode() if isinstance(value, str) else None
    if ptype == "bin":
        return bytes(value) if isinstance(value, (bytes, bytearray)) else None
    if ptype in ("i8", "i16", "i32", "i64"):
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        try:
            return struct.pack("<q", value)
        except struct.error:
            return None
    return None


def _to_physical(value, m: dict):
    """Logical query literal (what ``_parse_zone_literal`` yields) →
    physical stored value, mirroring ``operators.encode._physicalize``:
    ts/ts_ntz → µs since epoch, date → days since epoch, bool → int."""
    import datetime as _dt

    logical = m.get("logical")
    if logical in ("ts", "ts_ntz"):
        if not isinstance(value, _dt.datetime):
            return None
        base = value
        if base.tzinfo is not None:
            base = base.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return round(
            (base - _dt.datetime(1970, 1, 1)) / _dt.timedelta(microseconds=1)
        )
    if logical == "date":
        if isinstance(value, _dt.datetime) or not isinstance(value, _dt.date):
            return None
        return (value - _dt.date(1970, 1, 1)).days
    if logical == "bool":
        return int(value) if isinstance(value, (bool, int)) else None
    return value


def build_bloom_index(
    spark: SparkSession,
    state_dir: str,
    columns: list[str] | tuple[str, ...],
    m_bits: int = DEFAULT_M_BITS,
) -> dict:
    """Build (or rebuild) the Bloom sidecar for ``columns`` — a
    distributed pass over the blocks files: each (file, column) group
    decodes only that column's payloads, hashes the DISTINCT values
    (cardinality-bounded work), and ORs the per-block bitmaps. One
    output row per (file, column); the whole sidecar is rewritten, so a
    rebuild also forgets files a rewrite retired.

    Indexable column types: strings, binary, integers (including
    timestamp/date/bool columns, which physicalize to ints). Float and
    list columns are refused — point equality on them is not a pruning
    pattern."""
    from d6tstack_spark.operators.encode import _hadoop_list_files
    from d6tstack_spark.plans.checkpoint import (
        _blocks_dir,
        _purge_journal_path,
        load_manifest,
    )

    if os.path.exists(_purge_journal_path(state_dir)):
        raise RuntimeError(
            f"state dir {state_dir} has an in-flight purge commit journal; "
            "run plans.maintenance.purge_deletes() first, then index"
        )
    manifest = load_manifest(state_dir)
    columns = list(columns)
    if not columns:
        raise ValueError("columns is empty — nothing to index")
    missing = [c for c in columns if c not in manifest]
    if missing:
        raise ValueError(f"columns not in manifest: {missing}")
    bad = [
        c for c in columns if manifest[c]["ptype"] not in _INDEXABLE_PTYPES
    ]
    if bad:
        raise ValueError(
            f"columns {bad} have un-indexable types "
            f"({[manifest[c]['ptype'] for c in bad]}); Bloom point lookup "
            "covers strings, binary and integer-physicalized columns"
        )
    if m_bits % 64 or m_bits < 64:
        raise ValueError(f"m_bits must be a positive multiple of 64: {m_bits}")
    bd = _blocks_dir(state_dir)
    paths = sorted(_hadoop_list_files(spark, bd, ".parquet"))
    if not paths:
        raise ValueError(f"no blocks parquet files under {bd}")

    pmeta = {c: dict(manifest[c]) for c in columns}
    mb = int(m_bits)
    idx = _index_df(spark, paths, columns, pmeta, mb)
    dd = _bloom_data_dir(state_dir)
    idx.write.mode("overwrite").parquet(dd)
    _fill_gaps(spark, dd, paths, columns, mb)
    meta = {
        "m_bits": mb,
        "k": BLOOM_K,
        "columns": sorted(columns),
        "built_ts": time.time(),
    }
    mp = _bloom_meta_path(state_dir)
    with open(mp + ".tmp", "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(mp + ".tmp", mp)
    n_files = spark.read.parquet(dd).select("file").distinct().count()
    return {"files_indexed": int(n_files), "columns": sorted(columns)}


def refresh_bloom_index(spark: SparkSession, state_dir: str) -> dict:
    """Incrementally extend the sidecar to files added since the last
    build/refresh — cost scales with the NEW data, not the table (the
    maintenance cadence a streamed or resumed 100 TB dir needs; a full
    :func:`build_bloom_index` is only warranted to also FORGET files a
    rewrite retired). Columns and sizing come from the recorded meta;
    already-covered (file, column) rows are never rewritten."""
    from d6tstack_spark.operators.encode import _hadoop_list_files
    from d6tstack_spark.plans.checkpoint import (
        _blocks_dir,
        _purge_journal_path,
        load_manifest,
    )

    meta = load_bloom_meta(state_dir)
    if meta is None:
        raise ValueError(
            f"no Bloom index under {state_dir}; run build_bloom_index first"
        )
    if os.path.exists(_purge_journal_path(state_dir)):
        raise RuntimeError(
            f"state dir {state_dir} has an in-flight purge commit journal; "
            "run plans.maintenance.purge_deletes() first, then index"
        )
    columns = list(meta["columns"])
    mb = int(meta["m_bits"])
    manifest = load_manifest(state_dir)
    pmeta = {c: dict(manifest[c]) for c in columns}
    bd = _blocks_dir(state_dir)
    paths = sorted(_hadoop_list_files(spark, bd, ".parquet"))
    dd = _bloom_data_dir(state_dir)
    covered = {
        (r[0], r[1])
        for r in spark.read.parquet(dd).select("file", "column").collect()
    }
    new_paths = [
        p
        for p in paths
        if any((os.path.basename(p), c) not in covered for c in columns)
    ]
    if not new_paths:
        return {"files_refreshed": 0, "columns": sorted(columns)}
    idx = _index_df(spark, new_paths, columns, pmeta, mb)
    if covered:
        # a partially-covered file re-indexes all its columns; drop the
        # rows that already exist so the sidecar stays duplicate-free.
        # left_anti against a small DataFrame, NOT isin() — an In
        # expression with one literal per covered pair grows to the full
        # sidecar size (10^5+ literals) and blows up plan construction
        # on exactly the incremental cadence this function exists for
        cov_df = spark.createDataFrame(
            sorted(covered), "file string, column string"
        )
        idx = idx.join(
            F.broadcast(cov_df), ["file", "column"], "left_anti"
        )
    idx.write.mode("append").parquet(dd)
    _fill_gaps(spark, dd, new_paths, columns, mb)
    meta["built_ts"] = time.time()
    mp = _bloom_meta_path(state_dir)
    with open(mp + ".tmp", "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(mp + ".tmp", mp)
    return {"files_refreshed": len(new_paths), "columns": sorted(columns)}


def _fill_gaps(
    spark: SparkSession, dd: str, paths: list[str], columns: list[str],
    mb: int,
) -> None:
    """Cover EVERY listed file: zero-row part files (empty commit
    partitions) and files lacking a column entirely (pre-evolution)
    produce no build group, but leaving them index-less would make them
    permanently unprunable. A zero bitmap is the sound record: the file
    holds no value of the column, so no equality probe can match it."""
    covered = {
        (r[0], r[1])
        for r in spark.read.parquet(dd).select("file", "column").collect()
    }
    gaps = [
        (os.path.basename(p), c)
        for p in paths
        for c in columns
        if (os.path.basename(p), c) not in covered
    ]
    if gaps:
        zero = [0] * (mb // 64)
        spark.createDataFrame(
            [(f, c, 0, zero) for f, c in gaps],
            schema="file string, column string, n_distinct long, "
            "bloom array<long>",
        ).coalesce(1).write.mode("append").parquet(dd)


def _index_df(
    spark: SparkSession,
    paths: list[str],
    columns: list[str],
    pmeta: dict,
    mb: int,
):
    """The distributed index build: one applyInPandas group per
    (blocks file, column), each decoding only that column's payloads and
    hashing the DISTINCT values (cardinality-bounded work), ORing the
    per-block bitmaps."""

    def _build(key, pdf):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        pa.set_cpu_count(1)
        from d6tstack_spark.codecs.blocks import (
            decode_block,
            decode_block_arrow,
        )
        from d6tstack_spark.operators.encode import _decode_arrow_fallback

        fpath, col = key
        m = pmeta[col]
        ptype = m["ptype"]
        words = np.zeros(mb // 64, dtype=np.uint64)
        seen: set = set()
        for r in pdf.itertuples(index=False):
            n = int(r.n_rows)
            nc = int(r.null_count)
            if nc >= n:
                continue
            if ptype == "any" or r.codec == "arrow":
                arr = _decode_arrow_fallback(r.payload)
                vals = arr.drop_null().unique().to_pylist()
            elif ptype in ("str", "bin"):
                arr = decode_block_arrow(
                    r.payload, r.params, r.codec, n, nc, ptype
                )
                vals = arr.drop_null().unique().to_pylist()
                if ptype == "str":
                    vals = [
                        v if isinstance(v, str) else v.decode()
                        for v in vals
                    ]
            else:
                values, valid = decode_block(
                    r.payload, r.params, r.codec, n, nc, ptype
                )
                vals = np.unique(values[valid]).tolist()
            for v in vals:
                b = _canonical_bytes(v, m)
                if b is None or b in seen:
                    continue
                seen.add(b)
                for pos in _positions(b, mb):
                    words[pos >> 6] |= np.uint64(1 << (pos & 63))
        return pd.DataFrame(
            {
                "file": [os.path.basename(fpath)],
                "column": [col],
                "n_distinct": [len(seen)],
                "bloom": [words.view(np.int64).tolist()],
            }
        )

    rows = (
        spark.read.parquet(*paths)
        .filter(F.col("column").isin(columns))
        .select(
            F.input_file_name().alias("f"),
            "column",
            "codec",
            "params",
            "payload",
            "n_rows",
            "null_count",
        )
    )
    return rows.groupBy("f", "column").applyInPandas(
        _build,
        schema="file string, column string, n_distinct long, "
        "bloom array<long>",
    )


def load_bloom_meta(state_dir: str) -> dict | None:
    mp = _bloom_meta_path(state_dir)
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        return json.load(f)


def _bit_hit(pos: int):
    """Spark condition: bit ``pos`` of the array<long> bitmap is set.
    ``shiftright`` is arithmetic, so bit 63 (sign bit of the stored
    int64 word) reads correctly through the ``& 1``; ``try_element_at``
    (not ``element_at``) so a malformed row yields NULL — which the
    miss-filter treats as "not a miss" = file kept — instead of an ANSI
    out-of-bounds error."""
    word, bit = pos >> 6, pos & 63
    return F.expr(
        f"(shiftright(try_element_at(bloom, {word + 1}), {bit}) & 1) = 1"
    )


_MAX_IN_PROBES = 64


def _in_list_constraints(
    where: str, manifest: dict, indexed: set
) -> list[tuple]:
    """Top-level ``col IN (lit, ...)`` conjuncts on indexed columns —
    the zone compiler collapses IN to a [min, max] envelope, losing the
    value set the Bloom needs, so the prober re-scans the conjuncts
    itself with the SAME splitter/literal parser the zone compiler uses
    (no second grammar to drift). A top-level conjunct constrains every
    matching row, so a file where ALL the listed values miss is
    eliminable outright, whatever the rest of the predicate does.
    Conservative throughout: parse failure, unparseable literal, lists
    longer than ``_MAX_IN_PROBES`` → no constraint."""
    import re as _re

    from d6tstack_spark.operators.encode import (
        _IDENT_RE,
        _LIT_RE,
        _parse_zone_literal,
        _split_conjuncts,
        _strip_outer_parens,
    )

    if "\\" in where:  # same literal-escape hazard as the zone compiler
        return []
    out: list[tuple] = []
    for conj in _split_conjuncts(where):
        conj = _strip_outer_parens(conj)
        m = _re.match(
            rf"(?i)^({_IDENT_RE})\s+IN\s*\(\s*"
            rf"({_LIT_RE}(?:\s*,\s*(?:{_LIT_RE}))*)\s*\)$",
            conj,
        )
        if not m:
            continue
        col = m.group(1)
        if col not in indexed or col not in manifest:
            continue
        lits = [
            _parse_zone_literal(t, manifest[col])
            for t in _re.findall(_LIT_RE, m.group(2))
        ]
        if not lits or len(lits) > _MAX_IN_PROBES:
            continue
        probes = []
        for v in lits:
            phys = None if v is None else _to_physical(v, manifest[col])
            b = (
                None
                if phys is None
                else _canonical_bytes(phys, manifest[col])
            )
            if b is None:
                probes = None
                break
            probes.append(b)
        if probes:
            out.append((col, probes))
    return out


def bloom_value_keep(
    spark: SparkSession,
    state_dir: str,
    manifest: dict,
    col: str,
    values: list,
    basenames: list[str],
) -> list[str]:
    """Files that may contain ANY of ``values`` in ``col`` — the
    value-set twin of :func:`bloom_prune_basenames`, for callers that
    hold the values directly (equality-delete key sets) rather than a
    WHERE string. ``values`` are LOGICAL (what a decode returns);
    uncovered files and unconvertible values keep everything, and lists
    longer than ``_MAX_IN_PROBES`` skip the probe — same advisory
    contract as everywhere else."""
    meta = load_bloom_meta(state_dir)
    if (
        meta is None
        or not basenames
        or meta.get("k") != BLOOM_K
        or col not in set(meta["columns"])
        or col not in manifest
        or not values
        or len(values) > _MAX_IN_PROBES
    ):
        return basenames
    m = manifest[col]
    mb = int(meta["m_bits"])
    probes = []
    for v in values:
        phys = None if v is None else _to_physical(v, m)
        b = None if phys is None else _canonical_bytes(phys, m)
        if b is None:
            # NULL or unconvertible value — the Bloom cannot speak for it
            return basenames
        probes.append(b)
    dd = _bloom_data_dir(state_dir)
    try:
        idx = spark.read.parquet(dd)
    except Exception:
        return basenames
    idx = idx.filter(F.expr(f"size(bloom) = {mb // 64}"))
    any_hit = None
    for b in probes:
        hit = None
        for pos in _positions(b, mb):
            c = _bit_hit(pos)
            hit = c if hit is None else (hit & c)
        any_hit = hit if any_hit is None else (any_hit | hit)
    misses = (
        idx.filter(F.col("column") == col)
        .filter(~any_hit)
        .select("file")
        .distinct()
        .collect()
    )
    dead = {r[0] for r in misses}
    return [b for b in basenames if b not in dead]


def bloom_prune_basenames(
    spark: SparkSession,
    state_dir: str,
    manifest: dict,
    where: str,
    basenames: list[str],
) -> list[str]:
    """Advisory file pruning for a WHERE clause: drop basenames the Bloom
    sidecar proves cannot contain a matching row. Sound under the DNF
    reading of the predicate — a file survives iff SOME branch remains
    possible; a branch is ruled out for a file only when one of its
    equality atoms on an indexed column Bloom-misses in that file's
    bitmap; top-level ``IN`` conjuncts additionally rule a file out when
    every listed value misses. Everything un-indexed, un-parsed,
    uncovered or non-equality passes through untouched. Returns a subset
    of ``basenames`` (order preserved); with no index or no usable atom,
    returns it unchanged."""
    meta = load_bloom_meta(state_dir)
    if meta is None or not basenames:
        return basenames
    if meta.get("k") != BLOOM_K:
        return basenames  # built by a different construction — ignore
    from d6tstack_spark.operators.encode import zone_dnf_from_where

    indexed = set(meta["columns"])
    dnf = zone_dnf_from_where(where, manifest) or []
    ins = _in_list_constraints(where, manifest, indexed)
    if not dnf and not ins:
        return basenames
    mb = int(meta["m_bits"])

    # per branch: (col, probe bytes) for its usable equality atoms.
    # Schema evolution needs no special case here: pre-evolution files
    # have no blocks row for an evolved column, hence no index row, and
    # uncovered (file, column) pairs always pass.
    branches: list[list[tuple]] = []
    for branch in dnf:
        probes: list[tuple] = []
        for atom in branch:
            if len(atom) != 3 or atom[0] not in indexed:
                continue
            col, lo, hi = atom
            if lo is None or lo != hi:
                continue  # range atom — zone maps handle those
            m = manifest[col]
            phys = _to_physical(lo, m)
            if phys is None:
                continue
            b = _canonical_bytes(phys, m)
            if b is None:
                continue
            probes.append((col, b))
        branches.append(probes)
    if all(not p for p in branches) and not ins:
        return basenames

    dd = _bloom_data_dir(state_dir)
    try:
        idx = spark.read.parquet(dd)
    except Exception:
        return basenames
    # a row whose bitmap was written under a different m_bits (a crashed
    # rebuild left data/meta mismatched) must not testify: size-gate it,
    # so its file counts as uncovered — conservative in the safe direction
    idx = idx.filter(F.expr(f"size(bloom) = {mb // 64}"))

    universe = set(basenames)

    # ---- batched probing (round 6): the round-5 shape ran one tiny
    # Spark job per (column, probe) per DNF branch plus one per IN
    # conjunct — a 20-value IN-list scheduled ~dozens of serial jobs.
    # All probes now evaluate in ONE aggregation over the sidecar: per
    # file, a miss flag per distinct (column, probe bytes); one collect
    # of (file, flags); the DNF/IN set algebra runs on the driver over
    # those flags. Miss semantics are unchanged — a file misses a probe
    # iff it HAS a (size-gated) index row for that column whose bitmap
    # rules the value out; files without a row always pass.
    probe_ix: dict[tuple, int] = {}
    for col, probes in ins:
        for b in probes:
            probe_ix.setdefault((col, b), len(probe_ix))
    for probes in branches:
        for col, b in probes:
            probe_ix.setdefault((col, b), len(probe_ix))
    if not probe_ix:
        return basenames
    flags = []
    for (col, b), i in probe_ix.items():
        hit = None
        for pos in _positions(b, mb):
            c = _bit_hit(pos)
            hit = c if hit is None else (hit & c)
        flags.append(
            F.max(
                F.when((F.col("column") == col) & (~hit), 1).otherwise(0)
            ).alias(f"m{i}")
        )
    cols_needed = sorted({col for col, _ in probe_ix})
    rows = (
        idx.filter(F.col("column").isin(cols_needed))
        .groupBy("file")
        .agg(*flags)
        .collect()
    )
    miss: list[set] = [set() for _ in probe_ix]
    for r in rows:
        for i in range(len(probe_ix)):
            if r[f"m{i}"] == 1:
                miss[i].add(r["file"])

    # top-level IN conjuncts constrain every row: a file where ALL the
    # listed values miss leaves the universe outright
    for col, probes in ins:
        all_miss = None
        for b in probes:
            m = miss[probe_ix[(col, b)]]
            all_miss = set(m) if all_miss is None else (all_miss & m)
        universe -= all_miss or set()
    if not universe:
        return []

    # a file is ruled out of a branch iff ANY of the branch's probes
    # MISSES in an existing index row; files without a row always pass.
    # (Stale rows for retired files may land in the miss sets — harmless,
    # the subtraction below only ever touches the live universe.)
    alive: set[str] | None = None
    for probes in branches:
        ruled_out: set[str] = set()
        for col, b in probes:
            ruled_out |= miss[probe_ix[(col, b)]]
        branch_alive = universe - ruled_out
        alive = branch_alive if alive is None else (alive | branch_alive)
        if alive == universe:
            break  # nothing more prunable — stop probing
    if alive is None:  # IN constraints only (no usable DNF branch)
        alive = universe
    return [b for b in basenames if b in alive]
