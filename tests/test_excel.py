"""Excel source family — mirrors the reference's tests/test_xls.py:21-273:
sheet sniffing predicates, read_excel_advanced header-range/blank-drop
semantics, and the distributed XLS→CSV converters with skip/replace."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from d6tstack_spark.sources.excel import (
    all_contain_sheetname,
    all_have_idx,
    convert_xlsx_to_csv,
    read_excel_advanced,
    read_excel_advanced_pandas,
    read_excel_stacked,
    sniff_xls,
    write_xlsx_minimal,
)


@pytest.fixture()
def xlsx_single(tmp_path):
    """Three files, one 'Sheet1' each — reference create_files_xlsx_single."""
    paths = []
    for i in range(3):
        p = str(tmp_path / f"single_{i}.xlsx")
        write_xlsx_minimal(
            p,
            {"Sheet1": [["date", "sales", "cost"],
                        [f"2026-0{i + 1}-01", 100 + i, -80 - i],
                        [f"2026-0{i + 1}-02", 200 + i, -90 - i]]},
        )
        paths.append(p)
    return paths


@pytest.fixture()
def xlsx_multi(tmp_path):
    paths = []
    for i in range(2):
        p = str(tmp_path / f"multi_{i}.xlsx")
        write_xlsx_minimal(
            p,
            {"Sheet1": [["a", "b"], [1, 2]],
             "Sheet2": [["x"], ["y"]]},
        )
        paths.append(p)
    return paths


def test_sniff_sheets_single_and_multi(xlsx_single, xlsx_multi):
    with pytest.raises(ValueError):
        sniff_xls([])
    s = sniff_xls(xlsx_single)
    assert all(
        d["sheets_names"] == ["Sheet1"] and d["sheets_count"] == 1
        for d in s["per_file"].values()
    )
    assert s["all_same_count"] and s["all_same_names"]
    assert all_contain_sheetname(s, "Sheet1")
    assert all_have_idx(s, 0) and not all_have_idx(s, 1)

    m = sniff_xls(xlsx_multi)
    assert all(
        d["sheets_names"] == ["Sheet1", "Sheet2"] for d in m["per_file"].values()
    )


def test_read_excel_adv_header_range(tmp_path):
    """The reference's synthetic fixture: a 2-col table written at
    startrow=1/startcol=1, recovered via header_xls_range B2:C2 — plus
    blank-row/col removal both on and off (test_xls.py:72-96)."""
    fname = str(tmp_path / "test.xlsx")
    # dfc at startrow=1, startcol=1 (row 0 and col 0 blank)
    rows = [[None, None, None], [None, "a", "b"]]
    rows += [[None, i, i] for i in range(10)]
    write_xlsx_minimal(fname, {"Sheet1": rows})

    dfc = pd.DataFrame({"a": range(10), "b": range(10)})
    dfr = read_excel_advanced_pandas(fname, header_xls_start="B2", header_xls_end="C2")
    assert dfr.astype(int).reset_index(drop=True).equals(dfc)
    dfr = read_excel_advanced_pandas(fname, header_xls_range="B2:C2")
    assert dfr.astype(int).reset_index(drop=True).equals(dfc)
    with pytest.raises(ValueError, match="conflict"):
        read_excel_advanced_pandas(
            fname, header_xls_range="B2:C2", header_xls_start="B2"
        )

    # blank middle column: dropped by default, kept with remove_blank_cols=False
    rows = [[None, None, None, None], [None, "a", "c", "b"]]
    rows += [[None, i, None, i] for i in range(10)]
    write_xlsx_minimal(fname, {"Sheet1": rows})
    dfr = read_excel_advanced_pandas(fname, header_xls_range="B2:D2")
    assert list(dfr.columns) == ["a", "b"]
    dfr2 = read_excel_advanced_pandas(
        fname, header_xls_range="B2:D2", remove_blank_cols=False,
        remove_blank_rows=False,
    )
    assert list(dfr2.columns) == ["a", "c", "b"]
    assert dfr2["c"].isna().all()

    # multi-row header collapses to single strings
    rows = [["Billing\nType", "Balance"], ["2019", "USD"], ["x", 1], ["y", 2]]
    write_xlsx_minimal(fname, {"Sheet1": rows})
    dfr = read_excel_advanced_pandas(fname, header_xls_range="A1:B2")
    assert list(dfr.columns) == ["Billing Type 2019", "Balance USD"]

    # preview
    dfr = read_excel_advanced_pandas(
        fname, header_xls_range="A1:B2", is_preview=True, nrows_preview=1
    )
    assert len(dfr) == 1


def test_read_excel_advanced_spark(spark, xlsx_single):
    df = read_excel_advanced(spark, xlsx_single[0])
    p = df.toPandas()
    assert set(p.columns) == {"date", "sales", "cost"}
    assert len(p) == 2 and int(p["sales"].sum()) == 300


def test_read_excel_stacked_distributed(spark, tmp_path, xlsx_single):
    # drifted third file: renamed column
    drift = str(tmp_path / "drift.xlsx")
    write_xlsx_minimal(
        drift, {"Sheet1": [["date", "revenue"], ["2026-04-01", 999]]}
    )
    out = read_excel_stacked(spark, xlsx_single + [drift])
    p = out.toPandas()
    assert set(p.columns) == {"date", "sales", "cost", "revenue", "filename"}
    assert len(p) == 7
    assert p[p["filename"] == "drift.xlsx"]["revenue"].iloc[0] == "999"
    assert p[p["filename"] == "drift.xlsx"]["sales"].isna().all()
    # distributed plumbing: no python row-at-a-time eval, mapInPandas only
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan


def test_convert_xlsx_to_csv_skip_replace(spark, tmp_path, xlsx_single):
    outdir = str(tmp_path / "csvout")
    with pytest.raises(ValueError, match="if_exists"):
        convert_xlsx_to_csv(spark, xlsx_single, outdir, if_exists="invalid")
    s1 = convert_xlsx_to_csv(spark, xlsx_single, outdir).toPandas()
    assert len(s1) == 3 and not s1["skipped"].any()
    for f in s1["fname_out"]:
        assert os.path.isfile(f)
        assert len(pd.read_csv(f)) == 2
    # second run skips everything (reference convert_xls.py:238-245)
    s2 = convert_xlsx_to_csv(spark, xlsx_single, outdir).toPandas()
    assert s2["skipped"].all()
    # replace rewrites
    s3 = convert_xlsx_to_csv(
        spark, xlsx_single, outdir, if_exists="replace"
    ).toPandas()
    assert not s3["skipped"].any()


def test_parser_reads_shared_strings_files(tmp_path):
    """Files written by pandas/openpyxl use the sharedStrings table, not
    inline strings — build one by hand and parse it."""
    import zipfile

    from d6tstack_spark.sources.excel import read_sheet_cells

    p = str(tmp_path / "shared.xlsx")
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats'
            '.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/></Types>',
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
            '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">'
            f'<Relationship Id="rId1" Type="{rns}/worksheet" '
            'Target="worksheets/sheet1.xml"/></Relationships>',
        )
        # rich-text run in entry 1 must concatenate
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst {ns} count="2" uniqueCount="2">'
            "<si><t>name</t></si>"
            "<si><r><t>Al</t></r><r><t>ice</t></r></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>7</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c>'
            '<c r="B2" t="b"><v>1</v></c></row>'
            "</sheetData></worksheet>",
        )
    cells = read_sheet_cells(p, 0)
    assert cells == [["name", 7], ["Alice", True]]


def test_xls_biff_raises_without_xlrd(tmp_path):
    p = tmp_path / "old.xls"
    p.write_bytes(b"\xd0\xcf\x11\xe0fakebiff")
    with pytest.raises(IOError, match="xlrd"):
        read_excel_advanced_pandas(str(p))
