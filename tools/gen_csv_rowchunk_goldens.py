#!/usr/bin/env python3
"""Generate goldens for the parsers_csv.py variant by EXECUTING the
reference parser.

Dev-side only: runs the reference worker HTTP path's second CSV parser
(`worker/app/services/parsers_csv.py:parse_csv` — plain csv.reader, no
sniffing, 50-col/2000-char caps, per-row " | " chunks) over curated +
seeded-random fixtures and writes (content, expected rows) pairs to
src/test/resources/csv_rowchunk_goldens.json. CsvSpec asserts graft's
CsvText.csvRowChunks reproduces every pair byte-for-byte.

Usage: python3 tools/gen_csv_rowchunk_goldens.py
"""
import json
import os
import random
import sys
import tempfile

sys.path.insert(0, "/root/reference/worker/app/services")
from parsers_csv import parse_csv  # noqa: E402

CURATED = {
    "simple": "name,age\nalice,30\nbob,41\n",
    "quoted": 'a,b\n"x, y",2\n"say ""hi""",3\n',
    "strip_cells": "  a  , \tb\t ,c\nd,  e,f  \n",
    "blank_rows": "\na,b\n\n\nc,d\n",
    "all_empty_cells": ",,\na,b\n",
    "single_empty_cell": "\"\"\na\n",
    "wide_row_55_cols": "h" + ",x" * 54 + "\nnarrow,row\n",
    "long_row_2100": "  pad  ," + "w" * 2100 + "\nshort,row\n",
    "exactly_2000": "a," + "y" * 1996 + "\n",  # "a | " + 1996 = 2000
    "over_2000_by_one": "a," + "y" * 1997 + "\n",
    "multiline_quoted": 'a,"line1\nline2",c\n',
    "crlf": "a,b\r\nc,d\r\n",
    "no_trailing_newline": "a,b\nc,d",
    "semicolons_not_sniffed": "x;y;z\n1;2;3\n",  # ONE cell per row: no sniffing
    "tabs_not_sniffed": "a\tb\nc\td\n",
    "unicode": "naïve,café\nüber,żółć\n",
}


def main() -> None:
    rng = random.Random(20260813)
    fixtures = dict(CURATED)
    alphabet = list("abc xyz,\"'\n\t|;:0123456789")
    for i in range(60):
        n = rng.randint(1, 120)
        fixtures[f"rand_{i}"] = "".join(rng.choice(alphabet) for _ in range(n))
    out = []
    for name, content in fixtures.items():
        with tempfile.NamedTemporaryFile(
                "w", suffix=".csv", delete=False, encoding="utf-8") as f:
            f.write(content)
            path = f.name
        try:
            expected = parse_csv(path)
        finally:
            os.unlink(path)
        out.append({"name": name, "content": content, "expected": expected})
    dst = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "csv_rowchunk_goldens.json")
    with open(dst, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(out)} goldens to {dst}")


if __name__ == "__main__":
    main()
