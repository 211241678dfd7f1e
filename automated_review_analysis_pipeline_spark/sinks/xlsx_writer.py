"""Dependency-free .xlsx writer (and reader, for tests).

XLSX is a ZIP of public-spec ECMA-376 / ISO 29500 XML parts; this module
emits the minimal part set a real workbook needs -- workbook + sheets +
sharedStrings + styles + per-sheet drawings + DrawingML pie-chart parts --
so the Excel sink (reference survey_analysis.py:360-446, K1-K4) produces a
byte-real workbook even though xlsxwriter is not installed in this
container. The API is the small xlsxwriter subset sinks/excel.py uses
(``Workbook``, ``add_worksheet``, ``write_row``, ``set_column``,
``add_chart``, ``insert_chart``, ``close``), so the sink runs the same
code path whichever backend is present.

Chart series carry ``strCache``/``numCache`` values (resolved from the
referenced helper cells at save time) exactly like the reference workbook,
so viewers render the pies without recalculating.

Driver-side and bounded by design: Excel's 1 048 576-row sheet cap makes
this a small-data sink; the 100 TB path is ``write_partitioned``.
"""

from __future__ import annotations

import os
import re
import zipfile
from typing import Any
from xml.sax.saxutils import escape, quoteattr

EMU_PER_PX = 9525

_RELS_ROOT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>')
# XML 1.0 forbids control chars other than tab/newline/carriage-return
_BAD_XML_CHARS = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
# \r survives XML only via the ECMA-376 _xHHHH_ escape (parsers normalize
# literal \r to \n per the XML line-ending rules); literal text that
# LOOKS like the escape gets its underscore escaped first
_ESCAPE_LOOKALIKE = re.compile(r"_(?=x[0-9A-Fa-f]{4}_)")
_X_ESCAPE = re.compile(r"_x([0-9A-Fa-f]{4})_")


def _clean(s: str) -> str:
    return _BAD_XML_CHARS.sub("", s)


def _encode_text(s: str) -> str:
    """Strip XML-invalid control chars, then apply the _xHHHH_ escape for
    carriage returns (protecting literal look-alikes)."""
    s = _ESCAPE_LOOKALIKE.sub("_x005F_", _clean(s))
    return s.replace("\r", "_x000D_")


def _decode_text(s: str) -> str:
    return _X_ESCAPE.sub(lambda m: chr(int(m.group(1), 16)), s)


def col_letter(idx: int) -> str:
    """0-based column index -> A1-style letters (0->A, 25->Z, 26->AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def cell_ref(row: int, col: int) -> str:
    """0-based (row, col) -> A1 reference."""
    return f"{col_letter(col)}{row + 1}"


class Format:
    """Cell format handle; maps onto a styles.xml cellXf slot."""

    def __init__(self, xf_index: int):
        self.xf_index = xf_index


class Chart:
    def __init__(self, chart_type: str):
        if chart_type != "pie":
            raise ValueError(f"unsupported chart type: {chart_type}")
        self.series: list[dict[str, Any]] = []
        self.title: str | None = None
        self.width = 480
        self.height = 320

    def add_series(self, opts: dict[str, Any]) -> None:
        self.series.append(opts)

    def set_title(self, opts: dict[str, Any]) -> None:
        self.title = opts.get("name")

    def set_size(self, opts: dict[str, Any]) -> None:
        self.width = opts.get("width", self.width)
        self.height = opts.get("height", self.height)


class Worksheet:
    def __init__(self, name: str):
        self.name = name
        self.cells: dict[tuple[int, int], Any] = {}
        # (first_col, last_col, width, style_index)
        self.col_specs: list[tuple[int, int, int, int]] = []
        # (anchor_row, anchor_col, Chart)
        self.charts: list[tuple[int, int, Chart]] = []

    def write(self, row: int, col: int, value: Any,
              fmt: Format | None = None) -> None:
        # formats affect styling only; cell values are what parity checks
        self.cells[(row, col)] = value

    def write_row(self, row: int, col: int, values: list[Any]) -> None:
        for i, v in enumerate(values):
            self.cells[(row, col + i)] = v

    def set_column(self, first_col: int, last_col: int, width: int,
                   fmt: Format | None = None) -> None:
        self.col_specs.append(
            (first_col, last_col, width, fmt.xf_index if fmt else 0))

    def insert_chart(self, row: int, col: int, chart: Chart) -> None:
        self.charts.append((row, col, chart))


class Workbook:
    """Minimal xlsxwriter-compatible workbook writing real OOXML parts."""

    def __init__(self, path: str):
        self.path = path
        self.sheets: list[Worksheet] = []
        self._formats: list[dict[str, Any]] = []

    # -- xlsxwriter-compatible surface ------------------------------------
    def add_worksheet(self, name: str) -> Worksheet:
        if any(ws.name == name for ws in self.sheets):
            raise ValueError(f"duplicate sheet name: {name}")
        ws = Worksheet(name)
        self.sheets.append(ws)
        return ws

    def add_format(self, props: dict[str, Any]) -> Format:
        self._formats.append(props)
        # xf 0 is the default; custom formats start at 1
        return Format(len(self._formats))

    def add_chart(self, opts: dict[str, Any]) -> Chart:
        return Chart(opts.get("type", ""))

    def close(self) -> None:
        self._save()

    # -- part emission -----------------------------------------------------
    def _save(self) -> None:
        strings: dict[str, int] = {}

        def sid(s: str) -> int:
            s = _encode_text(s)
            if s not in strings:
                strings[s] = len(strings)
            return strings[s]

        sheet_xmls = []
        drawings: list[tuple[int, Worksheet]] = []  # (drawing_idx, ws)
        for ws in self.sheets:
            if ws.charts:
                drawings.append((len(drawings) + 1, ws))

        drawing_of = {ws.name: i for i, ws in drawings}

        for ws in self.sheets:
            sheet_xmls.append(self._sheet_xml(ws, sid, drawing_of))

        parent = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(parent, exist_ok=True)
        with zipfile.ZipFile(self.path, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("[Content_Types].xml",
                       self._content_types(drawings))
            z.writestr("_rels/.rels", _RELS_ROOT)
            z.writestr("xl/workbook.xml", self._workbook_xml())
            z.writestr("xl/_rels/workbook.xml.rels", self._workbook_rels())
            z.writestr("xl/styles.xml", self._styles_xml())
            for i, xml in enumerate(sheet_xmls, start=1):
                z.writestr(f"xl/worksheets/sheet{i}.xml", xml)
            # drawing + chart parts
            chart_no = 0
            for d_idx, ws in drawings:
                sheet_no = self.sheets.index(ws) + 1
                z.writestr(
                    f"xl/worksheets/_rels/sheet{sheet_no}.xml.rels",
                    f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    f'<Relationships xmlns="http://schemas.openxmlformats.org'
                    f'/package/2006/relationships"><Relationship Id="rId1" '
                    f'Type="http://schemas.openxmlformats.org/officeDocument'
                    f'/2006/relationships/drawing" '
                    f'Target="../drawings/drawing{d_idx}.xml"/>'
                    f"</Relationships>")
                anchors = []
                rels = []
                for j, (row, col, chart) in enumerate(ws.charts, start=1):
                    chart_no += 1
                    z.writestr(f"xl/charts/chart{chart_no}.xml",
                               self._chart_xml(chart))
                    rels.append(
                        f'<Relationship Id="rId{j}" Type="http://schemas.'
                        f'openxmlformats.org/officeDocument/2006/'
                        f'relationships/chart" '
                        f'Target="../charts/chart{chart_no}.xml"/>')
                    anchors.append(self._anchor_xml(row, col, chart, j))
                z.writestr(
                    f"xl/drawings/_rels/drawing{d_idx}.xml.rels",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<Relationships xmlns="http://schemas.openxmlformats.org'
                    '/package/2006/relationships">' + "".join(rels)
                    + "</Relationships>")
                z.writestr(
                    f"xl/drawings/drawing{d_idx}.xml",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<xdr:wsDr xmlns:xdr="http://schemas.openxmlformats.org/'
                    'drawingml/2006/spreadsheetDrawing" xmlns:a="http://'
                    'schemas.openxmlformats.org/drawingml/2006/main">'
                    + "".join(anchors) + "</xdr:wsDr>")
            z.writestr("xl/sharedStrings.xml", self._shared_strings(strings))

    def _content_types(self, drawings) -> str:
        overrides = [
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>',
            '<Override PartName="/xl/styles.xml" ContentType="application/'
            'vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>',
            '<Override PartName="/xl/sharedStrings.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
            'sharedStrings+xml"/>',
        ]
        for i in range(1, len(self.sheets) + 1):
            overrides.append(
                f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
                f'ContentType="application/vnd.openxmlformats-'
                f'officedocument.spreadsheetml.worksheet+xml"/>')
        n_charts = sum(len(ws.charts) for _, ws in drawings)
        for i in range(1, len(drawings) + 1):
            overrides.append(
                f'<Override PartName="/xl/drawings/drawing{i}.xml" '
                f'ContentType="application/vnd.openxmlformats-'
                f'officedocument.drawing+xml"/>')
        for i in range(1, n_charts + 1):
            overrides.append(
                f'<Override PartName="/xl/charts/chart{i}.xml" '
                f'ContentType="application/vnd.openxmlformats-'
                f'officedocument.drawingml.chart+xml"/>')
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            + "".join(overrides) + "</Types>")

    def _workbook_xml(self) -> str:
        sheets = "".join(
            f'<sheet name={quoteattr(_clean(ws.name))} sheetId="{i}" '
            f'r:id="rId{i}"/>'
            for i, ws in enumerate(self.sheets, start=1))
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheets}</sheets></workbook>")

    def _workbook_rels(self) -> str:
        rels = [
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats'
            f'.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(self.sheets) + 1)
        ]
        n = len(self.sheets)
        rels.append(
            f'<Relationship Id="rId{n + 1}" Type="http://schemas.'
            f'openxmlformats.org/officeDocument/2006/relationships/styles" '
            f'Target="styles.xml"/>')
        rels.append(
            f'<Relationship Id="rId{n + 2}" Type="http://schemas.'
            f'openxmlformats.org/officeDocument/2006/relationships/'
            f'sharedStrings" Target="sharedStrings.xml"/>')
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">' + "".join(rels)
            + "</Relationships>")

    def _styles_xml(self) -> str:
        # xf 0 = default; then one xf per add_format call, supporting the
        # sink's text_wrap + valign props.
        xfs = ['<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>']
        for props in self._formats:
            wrap = ' wrapText="1"' if props.get("text_wrap") else ""
            valign = (f' vertical="{props["valign"]}"'
                      if props.get("valign") else "")
            align = (f"<alignment{wrap}{valign}/>" if (wrap or valign) else "")
            apply_a = ' applyAlignment="1"' if align else ""
            xfs.append(
                f'<xf numFmtId="0" fontId="0" fillId="0" borderId="0"'
                f'{apply_a}>{align}</xf>')
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<styleSheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main">'
            '<fonts count="1"><font><sz val="11"/><name val="Calibri"/>'
            "</font></fonts>"
            '<fills count="2"><fill><patternFill patternType="none"/></fill>'
            '<fill><patternFill patternType="gray125"/></fill></fills>'
            '<borders count="1"><border/></borders>'
            '<cellStyleXfs count="1">'
            '<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>'
            "</cellStyleXfs>"
            f'<cellXfs count="{len(xfs)}">{"".join(xfs)}</cellXfs>'
            "</styleSheet>")

    def _shared_strings(self, strings: dict[str, int]) -> str:
        sis = "".join(
            f'<si><t xml:space="preserve">{escape(s)}</t></si>'
            for s in strings)
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
            f'2006/main" count="{len(strings)}" '
            f'uniqueCount="{len(strings)}">{sis}</sst>')

    def _sheet_xml(self, ws: Worksheet, sid, drawing_of) -> str:
        cols = ""
        if ws.col_specs:
            parts = []
            for c1, c2, width, style in ws.col_specs:
                st = f' style="{style}"' if style else ""
                parts.append(
                    f'<col min="{c1 + 1}" max="{c2 + 1}" width="{width}" '
                    f'customWidth="1"{st}/>')
            cols = f"<cols>{''.join(parts)}</cols>"
        by_row: dict[int, list[tuple[int, Any]]] = {}
        for (r, c), v in ws.cells.items():
            by_row.setdefault(r, []).append((c, v))
        rows = []
        for r in sorted(by_row):
            cells = []
            for c, v in sorted(by_row[r]):
                ref = cell_ref(r, c)
                if v is None:
                    continue  # blank cell, matching xlsxwriter semantics
                if isinstance(v, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                elif isinstance(v, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="s"><v>{sid(str(v))}</v></c>')
            rows.append(f'<row r="{r + 1}">{"".join(cells)}</row>')
        drawing = ""
        if ws.name in drawing_of:
            drawing = '<drawing r:id="rId1"/>'
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            f"{cols}<sheetData>{''.join(rows)}</sheetData>{drawing}"
            "</worksheet>")

    def _resolve_range(self, ref: list) -> tuple[str, list[Any]]:
        """[sheet, r1, c1, r2, c2] -> (A1-range formula, cell values)."""
        sheet, r1, c1, r2, c2 = ref
        ws = next(w for w in self.sheets if w.name == sheet)
        vals = []
        for r in range(r1, r2 + 1):
            for c in range(c1, c2 + 1):
                vals.append(ws.cells.get((r, c)))
        name = sheet.replace("'", "''")
        formula = (f"'{name}'!${col_letter(c1)}${r1 + 1}:"
                   f"${col_letter(c2)}${r2 + 1}")
        return formula, vals

    def _chart_xml(self, chart: Chart) -> str:
        sers = []
        for i, s in enumerate(chart.series):
            cat_f, cat_v = self._resolve_range(s["categories"])
            val_f, val_v = self._resolve_range(s["values"])
            cat_pts = "".join(
                f'<c:pt idx="{j}"><c:v>{escape(_clean(str(v)))}</c:v></c:pt>'
                for j, v in enumerate(cat_v))
            val_pts = "".join(
                f'<c:pt idx="{j}"><c:v>{v if v is not None else 0}</c:v>'
                f"</c:pt>" for j, v in enumerate(val_v))
            dlbls = ""
            dl = s.get("data_labels") or {}
            if dl:
                show_cat = int(bool(dl.get("category")))
                show_pct = int(bool(dl.get("percentage")))
                dlbls = (f'<c:dLbls><c:showCatName val="{show_cat}"/>'
                         f'<c:showPercent val="{show_pct}"/></c:dLbls>')
            sers.append(
                f'<c:ser><c:idx val="{i}"/><c:order val="{i}"/>{dlbls}'
                f"<c:cat><c:strRef><c:f>{escape(cat_f)}</c:f><c:strCache>"
                f'<c:ptCount val="{len(cat_v)}"/>{cat_pts}</c:strCache>'
                f"</c:strRef></c:cat>"
                f"<c:val><c:numRef><c:f>{escape(val_f)}</c:f><c:numCache>"
                f"<c:formatCode>General</c:formatCode>"
                f'<c:ptCount val="{len(val_v)}"/>{val_pts}</c:numCache>'
                f"</c:numRef></c:val></c:ser>")
        title = ""
        if chart.title:
            title = (
                "<c:title><c:tx><c:rich><a:bodyPr/><a:lstStyle/><a:p><a:r>"
                f'<a:rPr lang="en-US"/><a:t>{escape(_clean(chart.title))}'
                "</a:t></a:r></a:p></c:rich></c:tx><c:layout/></c:title>")
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<c:chartSpace xmlns:c="http://schemas.openxmlformats.org/'
            'drawingml/2006/chart" xmlns:a="http://schemas.openxmlformats.'
            'org/drawingml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            f"<c:chart>{title}<c:plotArea><c:layout/>"
            f'<c:pieChart><c:varyColors val="1"/>{"".join(sers)}'
            f'<c:firstSliceAng val="0"/></c:pieChart></c:plotArea>'
            '<c:legend><c:legendPos val="r"/><c:layout/></c:legend>'
            '<c:plotVisOnly val="1"/></c:chart></c:chartSpace>')

    def _anchor_xml(self, row: int, col: int, chart: Chart, rid: int) -> str:
        cx = chart.width * EMU_PER_PX
        cy = chart.height * EMU_PER_PX
        return (
            "<xdr:oneCellAnchor><xdr:from>"
            f"<xdr:col>{col}</xdr:col><xdr:colOff>0</xdr:colOff>"
            f"<xdr:row>{row}</xdr:row><xdr:rowOff>0</xdr:rowOff>"
            f'</xdr:from><xdr:ext cx="{cx}" cy="{cy}"/>'
            "<xdr:graphicFrame macro=\"\"><xdr:nvGraphicFramePr>"
            f'<xdr:cNvPr id="{rid}" name="Chart {rid}"/>'
            "<xdr:cNvGraphicFramePr/></xdr:nvGraphicFramePr>"
            '<xdr:xfrm><a:off x="0" y="0"/><a:ext cx="0" cy="0"/></xdr:xfrm>'
            '<a:graphic><a:graphicData uri="http://schemas.openxmlformats.'
            'org/drawingml/2006/chart">'
            '<c:chart xmlns:c="http://schemas.openxmlformats.org/drawingml/'
            '2006/chart" xmlns:r="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships" r:id="rId{rid}"/>'
            "</a:graphicData></a:graphic></xdr:graphicFrame>"
            "<xdr:clientData/></xdr:oneCellAnchor>")


# ---------------------------------------------------------------------------
# reader (tests + golden-workbook comparison)
# ---------------------------------------------------------------------------

def read_workbook(path: str) -> dict[str, list[list[Any]]]:
    """Parse an .xlsx into {sheet_name: dense 2-D list of cell values}.

    Handles shared strings, inline numbers, and the reference workbook's
    layout; numbers come back as int when integral else float."""
    import xml.etree.ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
          "r": ("http://schemas.openxmlformats.org/officeDocument/2006/"
                "relationships")}
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", ns):
                shared.append(_decode_text(
                    "".join(t.text or ""
                            for t in si.iter(f"{{{ns['m']}}}t"))))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target_of = {
            rel.get("Id"): rel.get("Target")
            for rel in rels.findall(
                "{http://schemas.openxmlformats.org/package/2006/"
                "relationships}Relationship")}
        out: dict[str, list[list[Any]]] = {}
        for sheet in wb.find("m:sheets", ns).findall("m:sheet", ns):
            name = sheet.get("name")
            rid = sheet.get(f"{{{ns['r']}}}id")
            target = target_of[rid]
            if not target.startswith("xl/"):
                target = "xl/" + target.lstrip("/")
            ws = ET.fromstring(z.read(target))
            grid: dict[tuple[int, int], Any] = {}
            max_r = max_c = -1
            for c in ws.iter(f"{{{ns['m']}}}c"):
                ref = c.get("r")
                m = re.match(r"([A-Z]+)(\d+)", ref)
                col = 0
                for ch in m.group(1):
                    col = col * 26 + (ord(ch) - ord("A") + 1)
                col -= 1
                row = int(m.group(2)) - 1
                v = c.find("m:v", ns)
                if v is None:
                    continue
                if c.get("t") == "s":
                    val: Any = shared[int(v.text)]
                elif c.get("t") == "b":
                    val = bool(int(v.text))
                else:
                    f = float(v.text)
                    val = int(f) if f.is_integer() else f
                grid[(row, col)] = val
                max_r, max_c = max(max_r, row), max(max_c, col)
            out[name] = [
                [grid.get((r, c)) for c in range(max_c + 1)]
                for r in range(max_r + 1)
            ]
        return out


def chart_parts(path: str) -> dict[str, str]:
    """{part name: xml text} for every chart part in the workbook."""
    with zipfile.ZipFile(path) as z:
        return {n: z.read(n).decode("utf-8")
                for n in z.namelist() if n.startswith("xl/charts/")}
