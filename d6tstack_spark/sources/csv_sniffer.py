"""CSV dialect sniffing + schema-drift-tolerant multi-file CSV reading.

Re-expresses the reference's sniffer (SURVEY.md §2.1 S4-S8):

- delimiter: per-line candidate counts, majority vote across sampled lines
  (sniffer.py:58-98 scan_delim/get_delim, Counter.most_common analog A2);
- skiprows: leading lines not containing the chosen delimiter
  (sniffer.py:107-117);
- header: absent iff the first data row contains ≥1 numeric token
  (sniffer.py:119-143 has_header);
- multi-file consensus with a hard error on disagreement
  (sniffer.py:145-193 CSVSnifferList.get_all / sniff_settings_csv);
- row-width consistency predicate (sniffer.py:100-105, P11).

Sampling reads only the top n lines per file — the reference's
"only reads the headers" discipline (R1). The sample is tiny by design, so
per-file detection runs driver-side like the reference; the subsequent READ
is a distributed ``spark.read.csv`` with the sniffed dialect, stacked via
operators.stack (the d6tstack combine pipeline end-to-end).
"""

from __future__ import annotations

import csv
import io
from collections import Counter

from pyspark.sql import DataFrame, SparkSession

DELIM_CANDIDATES = [",", ";", "\t", "|"]


def _sample_lines(spark: SparkSession, path: str, n: int) -> list[str]:
    return [r[0] for r in spark.read.text(path).limit(n).collect()]


def _split_line(ln: str, delim: str) -> list[str]:
    """Quote-aware split of one sampled CSV line (stdlib csv, so quoted
    delimiters don't inflate the column count during sniffing/inference).
    Quoted embedded newlines are NOT supported on this path: the sample is
    read line-wise by spark.read.text."""
    try:
        return next(csv.reader(io.StringIO(ln), delimiter=delim))
    except (csv.Error, StopIteration):
        return ln.split(delim)


def _is_number(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


_DATE_RE = None


def _token_type(tok: str) -> str | None:
    """Type of one CSV token for driver-side schema inference (None=empty)."""
    global _DATE_RE
    tok = tok.strip()
    if tok == "":
        return None
    try:
        int(tok)
        return "bigint"
    except ValueError:
        pass
    try:
        float(tok)
        return "double"
    except ValueError:
        pass
    if _DATE_RE is None:
        import re

        _DATE_RE = re.compile(r"\d{4}-\d{2}-\d{2}")
    if _DATE_RE.fullmatch(tok):
        return "date"
    return "string"


def _merge_types(a: str | None, b: str | None) -> str | None:
    if a is None:
        return b
    if b is None or a == b:
        return a
    if {a, b} == {"bigint", "double"}:
        return "double"
    return "string"


def infer_schema_from_sample(
    lines: list[str], delim: str, skiprows: int, has_header: bool
) -> str:
    """Spark DDL schema string inferred from the sniff sample — the
    reference's nrows_preview discipline (combine_csv.py:128-131) applied to
    types. At scale this replaces ``inferSchema=True``, which costs a FULL
    extra pass over every CSV file; the sample was already read for dialect
    detection, so schema inference is free."""
    data_lines = [ln for ln in lines[skiprows:] if delim in ln]
    first = _split_line(data_lines[0], delim)
    names = (
        [c.strip() for c in first]
        if has_header
        else [f"_c{i}" for i in range(len(first))]
    )
    rows = data_lines[1:] if has_header else data_lines
    types: list[str | None] = [None] * len(names)
    for ln in rows:
        for i, tok in enumerate(_split_line(ln, delim)[: len(names)]):
            types[i] = _merge_types(types[i], _token_type(tok))
    return ", ".join(
        f"`{n}` {t or 'string'}" for n, t in zip(names, types)
    )


def sniff_file(spark: SparkSession, path: str, n_lines: int = 20) -> dict:
    """Dialect of one file: {'delim','skiprows','has_header','n_columns'}."""
    lines = _sample_lines(spark, path, n_lines)
    if not lines:
        raise ValueError(f"empty file: {path}")
    # per-line winner = candidate with max occurrences; majority across lines
    votes: Counter = Counter()
    for ln in lines:
        counts = {d: ln.count(d) for d in DELIM_CANDIDATES}
        best = max(counts, key=lambda d: (counts[d], -DELIM_CANDIDATES.index(d)))
        if counts[best] > 0:
            votes[best] += 1
    if not votes:
        raise IOError(f"no delimiter found in {path}")  # sniffer.py:87-88
    delim = votes.most_common(1)[0][0]
    # skiprows: leading lines without the delimiter (e.g. preamble/comments)
    skiprows = 0
    for ln in lines:
        if delim in ln:
            break
        skiprows += 1
    data_lines = [ln for ln in lines[skiprows:] if delim in ln]
    widths = {len(_split_line(ln, delim)) for ln in data_lines}
    consistent = len(widths) == 1
    first = _split_line(data_lines[0], delim)
    has_header = not any(_is_number(t) for t in first)
    return {
        "delim": delim,
        "skiprows": skiprows,
        "has_header": has_header,
        "n_columns": len(first),
        "consistent_width": consistent,
        "_lines": lines,  # sniff sample, reused for schema inference
    }


def sniff_settings_csv(spark: SparkSession, paths: list[str], n_lines: int = 20) -> dict:
    """Consensus dialect across files; raises if files disagree
    (the reference's NotImplementedError on inconsistent dialects,
    sniffer.py:169 — surfaced as ValueError with the offenders named)."""
    per_file = {p: sniff_file(spark, p, n_lines) for p in sorted(paths)}
    consensus = {}
    for key in ("delim", "skiprows", "has_header"):
        vals = {p: d[key] for p, d in per_file.items()}
        uniq = set(vals.values())
        if len(uniq) > 1:
            raise ValueError(f"inconsistent {key} across files: {vals}")
        consensus[key] = uniq.pop()
    consensus["per_file"] = per_file
    return consensus


def read_csv_stacked(
    spark: SparkSession,
    paths: list[str],
    rename_maps: list[dict | None] | None = None,
    add_filename: bool = True,
    n_lines: int = 20,
    mode: str = "FAILFAST",
    **stack_kwargs,
) -> DataFrame:
    """The CombinerCSV pipeline end-to-end: sniff dialect → distributed
    spark.read.csv per file → rename/align/stack with provenance
    (reference combine_csv.py:93-106 + 351-360, Spark-first).

    ``mode`` is the Spark CSV parse mode and defaults to FAILFAST: the schema
    is inferred from a small sniff sample, so any later value that doesn't fit
    the sampled type (``N/A`` after numeric rows, a timestamp after date-shaped
    samples) must ERROR, not silently become null — pass ``mode="PERMISSIVE"``
    to opt into null-on-drift explicitly.

    Caveat: quoted embedded newlines are unsupported when ``skiprows > 0``
    (that path reads line-wise); for skiprows == 0 use Spark's multiLine
    option via ``spark.read.csv`` directly.
    """
    from d6tstack_spark.operators.stack import stack

    settings = sniff_settings_csv(spark, paths, n_lines)
    delim, skiprows = settings["delim"], settings["skiprows"]
    has_header = settings["has_header"]
    dfs = []
    for p in sorted(paths):
        lines = settings["per_file"][p]["_lines"]
        schema = infer_schema_from_sample(lines, delim, skiprows, has_header)
        if skiprows:
            # JVM-only preamble drop, bounded to the file head: drop exactly
            # the first `skiprows` physical lines (+ the header line). Line
            # numbers come from monotonically_increasing_id: for a text scan
            # of ONE file, partition 0 is the byte range starting at offset 0
            # and its ids are 0..k-1 in file order, while every later
            # partition's ids start at >= 1<<33 — so `id >= n_drop` removes
            # only head lines and can never drop data rows that merely lack
            # the delimiter or textually repeat the header (the r2 path
            # filtered on contains(delim)/!= header and lost such rows).
            # Parsing stays in whole-stage codegen via from_csv.
            from pyspark.sql import functions as F

            n_drop = skiprows + (1 if has_header else 0)
            body = (
                spark.read.text(p)
                .select(
                    F.monotonically_increasing_id().alias("_line_id"), "value"
                )
                .filter(F.col("_line_id") >= n_drop)
            )
            df = body.select(
                F.from_csv(
                    F.col("value"), schema, {"sep": delim, "mode": mode}
                ).alias("r")
            ).select("r.*")
        else:
            df = (
                spark.read.schema(schema)
                .option("sep", delim)
                .option("header", has_header)
                .option("mode", mode)
                .csv(p)
            )
        dfs.append(df)
    return stack(
        dfs,
        rename_maps=rename_maps,
        source_names=[p.rsplit("/", 1)[-1] for p in sorted(paths)],
        add_filename=add_filename,
        **stack_kwargs,
    )
