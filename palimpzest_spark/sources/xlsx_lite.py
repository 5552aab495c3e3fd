"""Stdlib-only .xlsx reader/writer (no openpyxl in this container).

An .xlsx file is a zip of ECMA-376 SpreadsheetML parts; the subset needed to
reproduce the reference's XLS semantics (``core/data/iter_dataset.py:425-469``
sheet enumeration + ``utils/udfs.py:34-56`` per-sheet table extraction) is
small and stable:

- ``xl/workbook.xml``        — sheet names + relationship ids, in order
- ``xl/_rels/workbook.xml.rels`` — relationship id → worksheet part path
- ``xl/sharedStrings.xml``   — the shared-string table (``t="s"`` cells)
- ``xl/worksheets/sheetN.xml`` — rows of cells ``<c r="B2" t="s"><v>3</v></c>``

Reader handles shared strings, inline strings (``t="inlineStr"``), formula
strings (``t="str"``), booleans and numbers, and sparse cells (the ``r=``
cell reference drives column placement). Writer emits the same subset — used
by tests and fixture generation so the round-trip is against the real format,
not a private encoding. Both are pure functions over ``bytes``; the engine
calls them inside Arrow-batched ``mapInPandas`` (``sources/files.py``), never
per-row driver Python.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKG = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'B7' -> 1, 'AA3' -> 26."""
    n = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _col_name(idx: int) -> str:
    name = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


def _cell_text(cell: ET.Element, shared: list[str]) -> str | None:
    t = cell.get("t", "n")
    if t == "s":
        v = cell.find(f"{_NS}v")
        return shared[int(v.text)] if v is not None and v.text is not None else None
    if t == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(e.text or "" for e in is_el.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "b":
        return "True" if v.text.strip() == "1" else "False"
    return v.text  # numbers / formula strings: raw text


def read_xlsx(data: bytes) -> list[dict]:
    """Parse .xlsx bytes → ``[{"name", "header": [str], "rows": [[str|None]]}]``
    in workbook sheet order. Header = first row (pandas ``read_excel``
    convention the reference relies on); remaining rows are stringified the
    way ``utils/udfs.py:47-49`` does (``str(x)`` per cell)."""
    zf = zipfile.ZipFile(io.BytesIO(data))

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.iter(f"{_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

    rels: dict[str, str] = {}
    if "xl/_rels/workbook.xml.rels" in zf.namelist():
        root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in root.iter(f"{_NS_PKG}Relationship"):
            target = rel.get("Target", "").lstrip("/")
            if target.startswith("worksheets/"):
                target = "xl/" + target
            rels[rel.get("Id", "")] = target

    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    out: list[dict] = []
    fallback_n = 0
    for sheet in wb.iter(f"{_NS}sheet"):
        name = sheet.get("name", f"Sheet{fallback_n + 1}")
        rid = sheet.get(f"{_NS_R}id")
        part = rels.get(rid or "", f"xl/worksheets/sheet{fallback_n + 1}.xml")
        fallback_n += 1
        if part not in zf.namelist():
            continue
        ws = ET.fromstring(zf.read(part))
        grid: list[list[str | None]] = []
        width = 0
        for row in ws.iter(f"{_NS}row"):
            cells: list[str | None] = []
            next_col = 0
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r")
                col = _col_index(ref) if ref else next_col
                while len(cells) < col:
                    cells.append(None)
                cells.append(_cell_text(c, shared))
                next_col = col + 1
            width = max(width, len(cells))
            grid.append(cells)
        grid = [r + [None] * (width - len(r)) for r in grid]
        header = ["" if v is None else str(v) for v in grid[0]] if grid else []
        rows = [
            [None if v is None else str(v) for v in r] for r in grid[1:]
        ]
        out.append({"name": name, "header": header, "rows": rows})
    return out


def sheet_names(data: bytes) -> list[str]:
    """Just the ordered sheet names (``pd.ExcelFile(...).sheet_names``)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    return [s.get("name", "") for s in wb.iter(f"{_NS}sheet")]


_XML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]


def _esc(s: str) -> str:
    for a, b in _XML_ESCAPES:
        s = s.replace(a, b)
    return s


def write_xlsx(sheets: dict[str, list[list]]) -> bytes:
    """Minimal standards-shaped .xlsx writer: ``{sheet name: rows}`` where
    ``rows[0]`` is the header. Strings go inline (``t="inlineStr"``); ints
    and floats as numbers. Used for test fixtures so the reader is exercised
    against real SpreadsheetML, and by users as a tiny sink."""
    parts: dict[str, str] = {}
    names = list(sheets)

    sheet_xml_tpl = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>{rows}</sheetData></worksheet>"
    )
    for i, name in enumerate(names, start=1):
        rows_xml = []
        for ri, row in enumerate(sheets[name], start=1):
            cells = []
            for ci, v in enumerate(row):
                ref = f"{_col_name(ci)}{ri}"
                if v is None:
                    continue
                if isinstance(v, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
                elif isinstance(v, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t>{_esc(str(v))}</t></is></c>'
                    )
            rows_xml.append(f'<row r="{ri}">{"".join(cells)}</row>')
        parts[f"xl/worksheets/sheet{i}.xml"] = sheet_xml_tpl.format(rows="".join(rows_xml))

    sheets_xml = "".join(
        f'<sheet name="{_esc(n)}" sheetId="{i}" r:id="rId{i}"/>'
        for i, n in enumerate(names, start=1)
    )
    parts["xl/workbook.xml"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheets_xml}</sheets></workbook>"
    )
    rels_xml = "".join(
        f'<Relationship Id="rId{i}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i}.xml"/>'
        for i in range(1, len(names) + 1)
    )
    parts["xl/_rels/workbook.xml.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{rels_xml}</Relationships>"
    )
    parts["_rels/.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(1, len(names) + 1)
    )
    parts["[Content_Types].xml"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        f"{overrides}</Types>"
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for path, content in parts.items():
            zf.writestr(path, content)
    return buf.getvalue()
