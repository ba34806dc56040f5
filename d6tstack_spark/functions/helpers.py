"""Column-set algebra and file-validation helpers.

Re-expresses reference d6tstack/helpers.py over Spark metadata:
- columns_all_equal (helpers.py:65-74)
- list_common / list_unique (helpers.py:77-90)
- extension checks (helpers.py:13-62, check_valid_xls :106-115)
None of these touch data — they are schema/path predicates, so they stay
plain Python (the reference's own choice); the DataFrame variants live in
operators.stack.
"""

from __future__ import annotations

import ntpath
import os


def columns_all_equal(col_lists: list[list[str]]) -> bool:
    """True iff every list has the same column SET (order-insensitive, like
    the reference which compares sorted lists, helpers.py:65-74)."""
    if not col_lists:
        return True
    first = sorted(col_lists[0])
    return all(sorted(c) == first for c in col_lists[1:])


def list_common(col_lists: list[list[str]]) -> list[str]:
    """Sorted intersection (helpers.py:77-82)."""
    if not col_lists:
        return []
    common = set(col_lists[0])
    for c in col_lists[1:]:
        common &= set(c)
    return sorted(common)


def list_unique(col_lists: list[list[str]]) -> list[str]:
    """Sorted union minus intersection (helpers.py:85-90)."""
    union: set = set()
    for c in col_lists:
        union |= set(c)
    return sorted(union - set(list_common(col_lists)))


def file_extensions_get(fname_list: list[str]) -> list[str]:
    return [os.path.splitext(f)[-1].lower() for f in fname_list]


def file_extensions_all_equal(ext_list: list[str]) -> bool:
    return len(set(e.lower() for e in ext_list)) <= 1


def file_extensions_valid(ext_list: list[str], valid=(".csv", ".txt", ".tsv", ".parquet", ".json")) -> bool:
    return all(e.lower() in valid for e in ext_list)


def check_valid_files(fname_list: list[str], valid=(".csv", ".txt", ".tsv", ".parquet", ".json")) -> None:
    """Raises unless all files share one whitelisted extension
    (helpers.py:25-62 discipline, minus the xls formats we don't ingest)."""
    exts = file_extensions_get(fname_list)
    if not file_extensions_all_equal(exts):
        raise IOError(f"mixed file extensions: {sorted(set(exts))}")
    if not file_extensions_valid(exts, valid):
        raise IOError(f"invalid extension {exts[0]!r}; valid: {valid}")


def basename(path: str) -> str:
    """Filename part, windows-path tolerant (ntpath, combine_csv.py:103-105)."""
    return ntpath.basename(path)


def compare_versions(version1: str, version2: str) -> int:
    """Dotted-version compare (SURVEY §2.8 F5, reference helpers.py:118-125):
    1 if v1>v2, -1 if v1<v2, 0 if equal. Non-numeric segments compare as 0
    (the reference normalizes with a digit filter)."""

    def norm(v: str) -> list[int]:
        out = []
        for seg in v.split("."):
            digits = "".join(ch for ch in seg if ch.isdigit())
            out.append(int(digits) if digits else 0)
        while out and out[-1] == 0:
            out.pop()
        return out

    a, b = norm(version1), norm(version2)
    return (a > b) - (a < b)


def list_tofront(items: list, val) -> list:
    """Move ``val`` to the front of a list, order of the rest preserved
    (SURVEY §2.8 F5 family, reference helpers.py:93-98). Missing value
    raises — silently no-opping would hide a schema mismatch."""
    out = list(items)
    out.remove(val)  # ValueError if absent, matching list semantics
    return [val] + out


def columns_tofront(df, col: str = "_filename"):
    """Reorder a DataFrame's columns so ``col`` leads — the Spark analog
    of the reference's df_filename_tofront (helpers.py:101-103): a pure
    projection, so Catalyst collapses it into the surrounding plan (no
    data movement)."""
    return df.select(*list_tofront(df.columns, col))
