#!/usr/bin/env python3
"""Generate CSV-parity goldens by EXECUTING the reference parser.

Dev-side only (never shipped in the library): runs the reference's
`extract_text_from_csv` (worker/app/services/parse_csv.py — stdlib-only,
Sniffer + csv.reader) over curated + seeded-random fixtures and writes
(content, expected) pairs to src/test/resources/csv_goldens.json. CsvSpec
asserts graft's CsvText.csvToLines reproduces every pair byte-for-byte,
so the Scala port of the stdlib Sniffer/reader semantics is pinned to the
reference's actual behavior, quirks included.

Usage: python3 tools/gen_csv_goldens.py
"""
import json
import os
import random
import sys
import tempfile

sys.path.insert(0, "/root/reference/worker/app/services")
from parse_csv import extract_text_from_csv  # noqa: E402

CURATED = {
    "simple": "name,age\nalice,30\nbob,41\n",
    "quoted_commas": 'name,qty,note\n"Smith, John",7,"say ""hi"" now"\n padded , x ,"multi\nline"\n',
    "quoted_clean": 'name,qty,note\n"Smith, John",7,"loud ""ok"" bay"\n"x",8,"plain"\n',
    "tsv": 'a\tb\tc\n5\t"x\ty"\tz\n',
    "tsv_plain": "id\tlang\tword\n7\ten\tzebra\n8\tfr\tyak\n",
    "semicolon": "x;y;z\n1;en;end\n2;fr;stop\n",
    "pipe": "p|q|r\n1|2|3\n",
    "colon": "k:v:w\n1:2:3\n4:5:6\n",
    "space_delim": "a b c\n1 2 3\n",
    "blank_mid": "a,b\n\n1,2\n",
    "nonstrict_quote": '"a"b,c\nplain,"q"\n',
    "single_col": "hello\nworld\n",
    "crlf": 'a,b\r\n"1\r\n2",3\r\n',
    "cr_only": "a,b\r1,2\r",
    "trailing_delim": "a,b,\n1,2,\n",
    "no_trailing_nl": "a,b\n1,2",
    "empty": "",
    "only_newlines": "\n\n\n",
    "one_quoted_cell": '"all of it, on\nthree\nlines"\n',
    "sis": 'a, b, c\n"x", "y, y2", "z"\n',
    "unicode": "naïve,café\n“smart”,‘quotes’\n",
    "nbsp_pad": "a,b\n x , y\n",
    "quote_at_eol": 'a,"b"\nc,"d"\n',
    "ragged": "a,b,c\n1\n2,3\n4,5,6,7\n",
    "semicolon_quoted": 'x;y\n"a;b";c\n"d""e";f\n',
    "tab_in_comma": "a,b\tc\n1,2\t3\n",
    "many_rows": "h1,h2\n" + "".join(f"r{i},v{i}\n" for i in range(6000)),
}


def rand_cases(rng):
    delims = [",", "\t", ";", "|", " ", ":"]
    words = ["alpha", "beta", "gamma", "x", "data", "q7", "north", "req",
             "Smith, John", 'say "hi"', "multi\nline", " padded ", "", "5",
             "a;b", "p|q", "tab\there", "end."]
    cases = {}
    for n in range(170):
        d = rng.choice(delims)
        quote_mode = rng.choice(["none", "some", "all"])
        ncols = rng.randint(1, 5)
        nrows = rng.randint(1, 8)
        rows = []
        for r in range(nrows):
            cells = []
            for c in range(ncols):
                w = rng.choice(words)
                if quote_mode == "all" or (quote_mode == "some" and rng.random() < 0.4):
                    cells.append('"' + w.replace('"', '""') + '"')
                else:
                    # unquoted cell must not contain the delimiter/newline
                    cells.append(w.replace(d, "_").replace("\n", "_").replace('"', "'"))
            rows.append(d.join(cells))
        eol = rng.choice(["\n", "\n", "\r\n"])
        content = eol.join(rows) + (eol if rng.random() < 0.8 else "")
        if rng.random() < 0.1:
            content = content.replace(eol, eol + eol, 1)  # a blank line
        cases[f"rand{n:03d}"] = content
    return cases


def main():
    rng = random.Random(20260812)
    cases = dict(CURATED)
    cases.update(rand_cases(rng))
    out = []
    td = tempfile.mkdtemp()
    for name, content in cases.items():
        ext = ".tsv" if name.startswith("tsv") else ".csv"
        p = os.path.join(td, name + ext)
        with open(p, "w", newline="", encoding="utf-8") as f:
            f.write(content)
        out.append({"name": name, "content": content,
                    "expected": extract_text_from_csv(p)})
    dst = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "csv_goldens.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=0, ensure_ascii=True)
    print(f"{len(out)} goldens -> {dst}")


if __name__ == "__main__":
    main()
