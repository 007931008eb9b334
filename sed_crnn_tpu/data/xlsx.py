"""Minimal XLSX reader — enough to load the reference's hit-assignments
workbook (`decorte_data_loader.py:60` reads hit_assignments.xlsx) without
pandas/openpyxl (not present in this image). XLSX is a zip of XML: parse
sharedStrings + the first worksheet into a list of row dicts keyed by the
header row. Supports inline/shared strings and numeric cells."""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from typing import Dict, List, Optional

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _column_index(cell_ref: str) -> int:
    """'B7' -> 1 (zero-based column)."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_xlsx_rows(path: str, sheet: Optional[str] = None) -> List[Dict[str, str]]:
    """Rows of the (first) worksheet as dicts keyed by the header row.
    Numbers come back as strings (callers convert, matching csv.DictReader)."""
    with zipfile.ZipFile(path) as zf:
        shared: List[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))

        sheet_names = sorted(
            n for n in zf.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheet_names:
            raise ValueError(f"{path}: no worksheets found")
        target = f"xl/worksheets/{sheet}.xml" if sheet else sheet_names[0]
        root = ET.fromstring(zf.read(target))

    grid: List[List[str]] = []
    for row in root.iter(f"{{{_NS['m']}}}row"):
        cells: Dict[int, str] = {}
        for c in row.findall("m:c", _NS):
            ref = c.get("r", "")
            col = _column_index(ref) if ref else len(cells)
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                is_el = c.find("m:is", _NS)
                val = "".join(t.text or "" for t in is_el.iter(f"{{{_NS['m']}}}t")) if is_el is not None else ""
            else:
                v = c.find("m:v", _NS)
                raw = v.text if v is not None and v.text is not None else ""
                val = shared[int(raw)] if ctype == "s" and raw else raw
            cells[col] = val
        width = max(cells) + 1 if cells else 0
        grid.append([cells.get(i, "") for i in range(width)])

    grid = [r for r in grid if any(v != "" for v in r)]
    if not grid:
        return []
    header = [h or f"col{i}" for i, h in enumerate(grid[0])]
    out = []
    for r in grid[1:]:
        r = r + [""] * (len(header) - len(r))
        out.append(dict(zip(header, r)))
    return out
