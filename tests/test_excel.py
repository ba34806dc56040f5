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


def test_xls_biff_corrupt_raises(tmp_path):
    p = tmp_path / "old.xls"
    p.write_bytes(b"\xd0\xcf\x11\xe0fakebiff")
    with pytest.raises(ValueError, match="OLE2|magic"):
        read_excel_advanced_pandas(str(p))


# ---------------------------------------------------------------------------
# legacy .xls (BIFF8) — stdlib OLE2 + BIFF reader (reference reads .xls via
# xlrd in convert_xls.py:105+; this is the same surface, zero-dependency)
# ---------------------------------------------------------------------------


def test_xls_biff_roundtrip_both_container_paths(tmp_path):
    import datetime as dt

    from d6tstack_spark.sources.excel import read_sheet_cells, sheet_names_xlsx
    from d6tstack_spark.sources.xls_biff import write_xls_minimal

    rows = [
        ["name", "qty", "ok", "when"],
        ["alpha", 1.5, True, dt.datetime(2026, 3, 1, 12, 30, 15)],
        ["beta", -0.01, False, dt.datetime(1999, 12, 31)],
        [None, 1e18, None, dt.date(2026, 1, 2)],
    ]
    # small workbook -> ministream container path
    p = write_xls_minimal(str(tmp_path / "small.xls"), {"S1": rows, "S2": [["x", 9.0]]})
    assert sheet_names_xlsx(p) == ["S1", "S2"]
    got = read_sheet_cells(p, 0)
    assert got[0] == ["name", "qty", "ok", "when"]
    assert got[1] == ["alpha", 1.5, True, dt.datetime(2026, 3, 1, 12, 30, 15)]
    assert got[3] == [None, 1e18, None, dt.datetime(2026, 1, 2)]
    assert read_sheet_cells(p, "S2") == [["x", 9.0]]

    # >4096-byte workbook -> regular FAT path, with SST CONTINUE spans
    big = [[f"string-{i}-{'x' * 50}", float(i)] for i in range(500)]
    p2 = write_xls_minimal(
        str(tmp_path / "big.xls"), {"S": big}, sst_split_every=7
    )
    g2 = read_sheet_cells(p2, "S")
    assert len(g2) == 500
    assert g2[123] == [f"string-123-{'x' * 50}", 123.0]


def test_xls_biff_rk_mulrk_formula_records(tmp_path):
    """Records the minimal writer doesn't emit (RK, MULRK, FORMULA+STRING,
    LABEL): splice them into a sheet stream and read them back."""
    import struct

    from d6tstack_spark.sources import xls_biff as xb

    # RK variants: int, int/100, float, float/100
    rk_int = (7 << 2) | 2
    rk_cents = (123 << 2) | 3
    rk_float = struct.unpack("<I", struct.pack("<d", 2.5)[4:])[0] & 0xFFFFFFFC
    body = xb._rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    body += xb._rec(0x027E, struct.pack("<HHHI", 0, 0, 0, rk_int))
    body += xb._rec(0x027E, struct.pack("<HHHI", 0, 1, 0, rk_cents))
    mul = struct.pack("<HH", 1, 0) + struct.pack("<HI", 0, rk_float) * 2
    body += xb._rec(0x00BD, mul + struct.pack("<H", 1))
    # FORMULA with cached float, FORMULA with cached string + STRING record
    body += xb._rec(
        0x0006, struct.pack("<HHHd", 2, 0, 0, 42.0) + b"\0\0\0\0\0\0"
    )
    body += xb._rec(
        0x0006,
        struct.pack("<HHH", 2, 1, 0)
        + b"\x00\x00\x00\x00\x00\x00\xff\xff"
        + b"\0\0\0\0\0\0",
    )
    body += xb._rec(0x0207, xb._w_unistr("cached"))
    body += xb._rec(0x0204, struct.pack("<HHH", 3, 0, 0) + xb._w_unistr("inline"))
    body += xb._rec(0x000A, b"")

    g = xb._rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    g += xb._rec(
        0x0085, struct.pack("<IHBB", 0, 0, 1, 0x01) + "Z".encode("utf-16-le")
    )
    g += xb._rec(0x000A, b"")
    wb = g + body
    # patch BOUNDSHEET stream position (the u32 right after the record
    # header; the record is followed by grbit(2)+cch(1)+flags(1)+name(2)+EOF(4))
    pos_off = len(g) - 4 - 2 - 1 - 1 - 2 - 4  # = BOUNDSHEET payload start
    wb = wb[:pos_off] + struct.pack("<I", len(g)) + wb[pos_off + 4 :]
    blob = xb._build_cfb({"Workbook": wb})
    p = tmp_path / "records.xls"
    p.write_bytes(blob)
    cells = xb.read_xls_cells(str(p), "Z")
    assert cells[0] == [7.0, 1.23]
    assert cells[1] == [2.5, 2.5]
    assert cells[2] == [42.0, "cached"]
    assert cells[3] == ["inline", None]


def test_xls_in_excel_family(spark, tmp_path):
    """sniff + advanced read + distributed stacked read over .xls files."""
    from d6tstack_spark.sources.xls_biff import write_xls_minimal

    paths = []
    for i in range(3):
        p = write_xls_minimal(
            str(tmp_path / f"old_{i}.xls"),
            {"Sheet1": [["date", "sales", "cost"],
                        [f"2026-0{i + 1}-01", 100.0 + i, -80.0 - i],
                        [f"2026-0{i + 1}-02", 200.0 + i, -90.0 - i]]},
        )
        paths.append(p)
    sn = sniff_xls(paths)
    assert sn["all_same_names"] and all_contain_sheetname(sn, "Sheet1")
    pdf = read_excel_advanced_pandas(paths[0], sheet_name="Sheet1")
    assert list(pdf.columns) == ["date", "sales", "cost"]
    assert pdf["sales"].tolist() == [100.0, 200.0]
    sdf = read_excel_stacked(spark, paths, sheet_name="Sheet1")
    got = sdf.toPandas()
    assert len(got) == 6 and set(got["filename"]).issuperset({"old_0.xls"})


def test_xls_biff_property_roundtrip():
    """Property test: arbitrary cell grids survive the BIFF8 writer→reader
    round trip (types: str incl. non-latin1 unicode, float, bool, None)."""
    from hypothesis import given, settings, strategies as st

    from d6tstack_spark.sources.xls_biff import read_xls_cells, write_xls_minimal

    cell = st.one_of(
        st.none(),
        st.booleans(),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), max_codepoint=0x10000
            ),
            max_size=40,
        ),
    )
    grids = st.lists(
        st.lists(cell, min_size=1, max_size=6), min_size=1, max_size=8
    )

    @settings(max_examples=25, deadline=None)
    @given(grids)
    def inner(rows):
        import tempfile, os

        width = max(len(r) for r in rows)
        rows = [r + [None] * (width - len(r)) for r in rows]
        with tempfile.TemporaryDirectory() as d:
            p = write_xls_minimal(os.path.join(d, "t.xls"), {"S": rows})
            got = read_xls_cells(p, "S")
        # trailing all-None rows/cols are indistinguishable from absent cells
        n_rows = max(
            (i for i, r in enumerate(rows) if any(v is not None for v in r)),
            default=-1,
        ) + 1
        n_cols = max(
            (c for r in rows for c, v in enumerate(r) if v is not None),
            default=-1,
        ) + 1
        assert len(got) == n_rows
        for r in range(n_rows):
            for c in range(n_cols):
                want = rows[r][c]
                have = got[r][c] if c < len(got[r]) else None
                if isinstance(want, float):
                    assert have == want, (r, c, want, have)
                else:
                    assert have == want, (r, c, want, have)

    inner()


def test_convert_xls_to_csv(spark, tmp_path):
    """The reference's XLStoCSV handles legacy .xls via xlrd; same surface
    here through the BIFF8 parser — distributed convert with skip."""
    from d6tstack_spark.sources.xls_biff import write_xls_minimal

    paths = [
        write_xls_minimal(
            str(tmp_path / f"legacy_{i}.xls"),
            {"Sheet1": [["a", "b"], [f"r{i}", float(i)], [f"s{i}", float(i) + 0.5]]},
        )
        for i in range(2)
    ]
    outdir = str(tmp_path / "csvout")
    s1 = convert_xlsx_to_csv(spark, paths, outdir).toPandas()
    assert len(s1) == 2 and not s1["skipped"].any()
    for f in s1["fname_out"]:
        assert len(pd.read_csv(f)) == 2
    s2 = convert_xlsx_to_csv(spark, paths, outdir).toPandas()
    assert s2["skipped"].all()
