"""Excel sources (SURVEY.md §2.1 S9/S10, §2.11 K13) — the reference's
second-biggest module, re-expressed Spark-first:

- ``read_excel_advanced``: header-range selection, multi-row header
  collapse, blank row/col removal, preview (reference convert_xls.py:24-98);
- ``sniff_xls``: sheet inventory + consistency predicates across files
  (XLSSniffer, convert_xls.py:105-209);
- ``read_excel_stacked``: many files → one DataFrame with provenance, the
  convert step distributed via ``mapInPandas`` (each task parses its own
  files — Excel files are small; the FLEET of them is the big-data axis);
- ``convert_xlsx_to_csv``: XLStoCSVMultiFile with skip/replace semantics
  (convert_xls.py:216-437), distributed the same way.

Parsing uses openpyxl when available; otherwise a built-in stdlib parser
(zipfile + ElementTree) that covers the xlsx subset produced by pandas,
openpyxl and this module's own writer (shared strings, inline strings,
numeric/boolean cells, sparse rows). Legacy .xls (BIFF8) is parsed by the
stdlib OLE2+BIFF reader in :mod:`d6tstack_spark.sources.xls_biff` — the
xlrd leg of the reference without the xlrd dependency.
"""

from __future__ import annotations

import os
import re
import zipfile
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not present in this image
    import openpyxl  # noqa: F401

    _HAVE_OPENPYXL = True
except ImportError:
    _HAVE_OPENPYXL = False

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def coordinate_from_string(ref: str) -> tuple[str, int]:
    """'B4' -> ('B', 4) — openpyxl.utils.cell.coordinate_from_string."""
    m = _CELL_REF.fullmatch(ref.upper())
    if not m:
        raise ValueError(f"invalid cell reference: {ref!r}")
    return m.group(1), int(m.group(2))


def column_index(letters: str) -> int:
    """'A'->0, 'B'->1, ..., 'AA'->26."""
    idx = 0
    for ch in letters.upper():
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _strip_tag(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ElementTree.fromstring(data):
        # a shared string is one <t> or a sequence of rich-text runs <r><t>
        parts = [
            (el.text or "")
            for el in si.iter()
            if _strip_tag(el.tag) == "t"
        ]
        out.append("".join(parts))
    return out


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    v_el = next((el for el in c if _strip_tag(el.tag) == "v"), None)
    if t == "inlineStr":
        parts = [
            (el.text or "") for el in c.iter() if _strip_tag(el.tag) == "t"
        ]
        return "".join(parts)
    if v_el is None or v_el.text is None:
        return None
    txt = v_el.text
    if t == "s":
        return shared[int(txt)]
    if t == "str":
        return txt
    if t == "b":
        return txt == "1"
    # numeric: int when integral (pandas-like), float otherwise
    f = float(txt)
    return int(f) if f.is_integer() and "e" not in txt.lower() else f


def _sheet_targets(zf: zipfile.ZipFile) -> dict[str, str]:
    """sheet name → member path inside the archive."""
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {}
    for rel in rels:
        tgt = rel.get("Target").lstrip("/")
        if not tgt.startswith("xl/"):
            tgt = "xl/" + tgt
        rid_to_target[rel.get("Id")] = tgt
    out: dict[str, str] = {}
    for el in wb.iter():
        if _strip_tag(el.tag) != "sheet":
            continue
        rid = next(
            (v for k, v in el.attrib.items() if k.endswith("}id") or k == "id"),
            None,
        )
        out[el.get("name")] = rid_to_target[rid]
    return out


def _is_biff(path: str) -> bool:
    return path.endswith(".xls") and not path.endswith(".xlsx")


def sheet_names_xlsx(path: str) -> list[str]:
    if _is_biff(path):
        from d6tstack_spark.sources.xls_biff import sheet_names_xls

        return sheet_names_xls(path)
    if _HAVE_OPENPYXL:  # pragma: no cover
        wb = openpyxl.load_workbook(path, read_only=True)
        try:
            return list(wb.sheetnames)
        finally:
            wb.close()
    with zipfile.ZipFile(path) as zf:
        return list(_sheet_targets(zf))


def read_sheet_cells(path: str, sheet: str | int = 0) -> list[list]:
    """One sheet → dense list-of-rows (None-padded). Stdlib parser; uses
    openpyxl when installed."""
    if _is_biff(path):
        from d6tstack_spark.sources.xls_biff import read_xls_cells

        return read_xls_cells(path, sheet)
    if _HAVE_OPENPYXL:  # pragma: no cover
        wb = openpyxl.load_workbook(path, read_only=True)
        try:
            ws = wb[wb.sheetnames[sheet] if isinstance(sheet, int) else sheet]
            return [list(r) for r in ws.iter_rows(values_only=True)]
        finally:
            wb.close()
    with zipfile.ZipFile(path) as zf:
        targets = _sheet_targets(zf)
        names = list(targets)
        name = names[sheet] if isinstance(sheet, int) else sheet
        if name not in targets:
            raise KeyError(f"sheet {name!r} not in {names}")
        shared = _parse_shared_strings(zf)
        root = ElementTree.fromstring(zf.read(targets[name]))
    rows: dict[int, dict[int, object]] = {}
    max_col = -1
    for row_el in root.iter():
        if _strip_tag(row_el.tag) != "row":
            continue
        r_idx = int(row_el.get("r")) - 1 if row_el.get("r") else len(rows)
        cells = rows.setdefault(r_idx, {})
        next_col = 0
        for c in row_el:
            if _strip_tag(c.tag) != "c":
                continue
            ref = c.get("r")
            col = column_index(_CELL_REF.fullmatch(ref).group(1)) if ref else next_col
            next_col = col + 1
            cells[col] = _cell_value(c, shared)
            max_col = max(max_col, col)
    if not rows:
        return []
    n_rows = max(rows) + 1
    return [
        [rows.get(r, {}).get(c) for c in range(max_col + 1)]
        for r in range(n_rows)
    ]


# ---------------------------------------------------------------------------
# read_excel_advanced (reference convert_xls.py:24-98)
# ---------------------------------------------------------------------------


def read_excel_advanced_pandas(
    path: str,
    sheet_name: str | int = 0,
    remove_blank_cols: bool = True,
    remove_blank_rows: bool = True,
    collapse_header: bool = True,
    header_xls_range: str | None = None,
    header_xls_start: str | None = None,
    header_xls_end: str | None = None,
    is_preview: bool = False,
    nrows_preview: int = 3,
) -> pd.DataFrame:
    """Driver/worker-side kernel of read_excel_advanced: one sheet →
    pandas, with the reference's header-range / collapse / blank-drop
    semantics (convert_xls.py:24-98)."""
    if header_xls_range:
        if header_xls_start or header_xls_end:
            raise ValueError(
                "Parameter conflict. Can only pass header_xls_range or "
                "header_xls_start with header_xls_end"
            )
        header_xls_start, header_xls_end = header_xls_range.split(":")

    cells = read_sheet_cells(path, sheet_name)
    if header_xls_start and header_xls_end:
        scol_l, srow = coordinate_from_string(header_xls_start)
        ecol_l, erow = coordinate_from_string(header_xls_end)
        scol, ecol = column_index(scol_l), column_index(ecol_l)
        header_rows = [
            [
                (r[c] if c < len(r) else None)
                for c in range(scol, ecol + 1)
            ]
            for r in cells[srow - 1 : erow]
        ]
        body = [
            [(r[c] if c < len(r) else None) for c in range(scol, ecol + 1)]
            for r in cells[erow:]
        ]
        if collapse_header:
            names = [
                " ".join(
                    str(h[c]).strip().replace("\n", " ")
                    for h in header_rows
                    if h[c] is not None and str(h[c]).strip() != ""
                )
                for c in range(len(header_rows[0]))
            ]
        else:
            names = [
                tuple(h[c] for h in header_rows)
                for c in range(len(header_rows[0]))
            ]
        df = pd.DataFrame(body, columns=names)
    else:
        if not cells:
            return pd.DataFrame()
        names = [
            (str(v).strip().replace("\n", " ") if collapse_header else v)
            if v is not None
            else f"Unnamed: {i}"
            for i, v in enumerate(cells[0])
        ]
        df = pd.DataFrame(cells[1:], columns=names)
    if remove_blank_cols:
        df = df.dropna(axis="columns", how="all")
    if remove_blank_rows:
        df = df.dropna(axis="rows", how="all")
    if is_preview:
        df = df.head(nrows_preview)
    return df


def read_excel_advanced(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """Single-file read_excel_advanced → Spark DataFrame (typed via Arrow)."""
    return spark.createDataFrame(read_excel_advanced_pandas(path, **kwargs))


# ---------------------------------------------------------------------------
# XLSSniffer (reference convert_xls.py:105-209)
# ---------------------------------------------------------------------------


def sniff_xls(paths: list[str]) -> dict:
    """Sheet inventory + consistency predicates across files."""
    if not paths:
        raise ValueError("Filename list should not be empty")
    per_file: dict[str, dict] = {}
    for p in paths:
        names = sheet_names_xlsx(p)
        per_file[p] = {
            "file_name": os.path.basename(p),
            "sheets_names": names,
            "sheets_count": len(names),
            "sheets_idx": list(range(len(names))),
        }
    first = next(iter(per_file.values()))
    return {
        "per_file": per_file,
        "all_same_count": all(
            d["sheets_count"] == first["sheets_count"] for d in per_file.values()
        ),
        "all_same_names": all(
            d["sheets_names"] == first["sheets_names"] for d in per_file.values()
        ),
    }


def all_contain_sheetname(sniff: dict, sheet_name: str) -> bool:
    return all(
        sheet_name in d["sheets_names"] for d in sniff["per_file"].values()
    )


def all_have_idx(sniff: dict, sheet_idx: int) -> bool:
    return all(
        sheet_idx <= d["sheets_count"] - 1 for d in sniff["per_file"].values()
    )


# ---------------------------------------------------------------------------
# distributed multi-file readers / converters
# ---------------------------------------------------------------------------


def read_excel_stacked(
    spark: SparkSession,
    paths: list[str],
    sheet_name: str | int = 0,
    add_filename: bool = True,
    **adv_kwargs,
) -> DataFrame:
    """Many Excel files → one stacked DataFrame with provenance.

    The column superset is resolved from a driver-side header scan (cheap —
    headers only, the reference's preview discipline); the full-sheet parse
    runs DISTRIBUTED: a DataFrame of paths is mapped through ``mapInPandas``
    and each task parses its own files. Values are carried as strings (the
    reference's convert target is CSV text; align types downstream with
    read_csv_stacked / stack)."""
    paths = sorted(paths)
    columns: list[str] = []
    for p in paths:
        hdr = read_excel_advanced_pandas(
            p, sheet_name=sheet_name, is_preview=True, nrows_preview=0,
            **adv_kwargs,
        ).columns
        for c in hdr:
            if c not in columns:
                columns.append(str(c))
    out_cols = list(columns) + (["filename"] if add_filename else [])
    schema = ", ".join(f"`{c}` string" for c in out_cols)
    pdf = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        len(paths), "path"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for p in b["path"]:
                df = read_excel_advanced_pandas(
                    p, sheet_name=sheet_name, **adv_kwargs
                )
                out = pd.DataFrame(
                    {
                        c: df[c].astype("string")
                        if c in df.columns
                        else pd.array([None] * len(df), dtype="string")
                        for c in columns
                    }
                )
                if add_filename:
                    out["filename"] = os.path.basename(p)
                yield out

    return pdf.mapInPandas(parse, schema)


def convert_xlsx_to_csv(
    spark: SparkSession,
    paths: list[str],
    output_dir: str,
    sheet_name: str | int = 0,
    if_exists: str = "skip",
    **adv_kwargs,
) -> DataFrame:
    """XLStoCSVMultiFile (convert_xls.py:216-437), distributed: each task
    converts its own files; existing outputs are skipped (``if_exists=
    'skip'``) or rewritten ('replace') — the reference's idempotent-convert
    discipline, same rule the encode checkpoint generalizes. Returns a
    summary DataFrame (path, fname_out, n_rows, skipped)."""
    if if_exists not in ("skip", "replace"):
        raise ValueError("Possible value of 'if_exists' are 'skip' and 'replace'")
    os.makedirs(output_dir, exist_ok=True)
    paths = sorted(paths)
    pdf = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        len(paths), "path"
    )

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for p in b["path"]:
                base = os.path.basename(p) + "-" + str(sheet_name) + ".csv"
                fname_out = os.path.join(output_dir, base)
                skip = if_exists == "skip" and os.path.isfile(fname_out)
                n = -1
                if not skip:
                    df = read_excel_advanced_pandas(
                        p, sheet_name=sheet_name, **adv_kwargs
                    )
                    df.to_csv(fname_out, index=False)
                    n = len(df)
                rows.append((p, fname_out, n, skip))
            yield pd.DataFrame(
                rows, columns=["path", "fname_out", "n_rows", "skipped"]
            )

    return pdf.mapInPandas(
        convert, "path string, fname_out string, n_rows long, skipped boolean"
    )


# ---------------------------------------------------------------------------
# minimal xlsx writer (test/demo fixture — inline strings, no styles)
# ---------------------------------------------------------------------------


def write_xlsx_minimal(path: str, sheets: dict[str, list[list]]):
    """Write a minimal valid .xlsx (inline strings, bare numbers). Exists so
    the Excel source family is testable in environments without openpyxl;
    the parser above also reads pandas/openpyxl-produced files."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    def col_letter(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        names = list(sheets)
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats'
            '.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            "vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"
            '"/>'
            + "".join(
                f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                'ContentType="application/vnd.openxmlformats-officedocument'
                '.spreadsheetml.worksheet+xml"/>'
                for i in range(len(names))
            )
            + "</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">'
            f'<Relationship Id="rId1" Type="{rns}/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {ns} xmlns:r="{rns}"><sheets>'
            + "".join(
                f'<sheet name="{esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                for i, n in enumerate(names)
            )
            + "</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" Type="{rns}/worksheet" '
                f'Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(len(names))
            )
            + "</Relationships>",
        )
        for i, n in enumerate(names):
            rows_xml = []
            for r, row in enumerate(sheets[n], start=1):
                cells = []
                for c, v in enumerate(row):
                    if v is None:
                        continue
                    ref = f"{col_letter(c)}{r}"
                    if isinstance(v, bool):
                        cells.append(
                            f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
                        )
                    elif isinstance(v, (int, float)):
                        cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
                    else:
                        cells.append(
                            f'<c r="{ref}" t="inlineStr"><is><t>{esc(str(v))}'
                            "</t></is></c>"
                        )
                rows_xml.append(f'<row r="{r}">' + "".join(cells) + "</row>")
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
                + "".join(rows_xml)
                + "</sheetData></worksheet>",
            )
