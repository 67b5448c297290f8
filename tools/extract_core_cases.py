"""Extract the reference's integration-test corpus into a JSON fixture.

Mechanically parses /root/reference/core_test.go (Test_HtmlDate) for
(input, expected, options) triples and mock_test.go's URL→file map.
This extracts test *data* (HTML snippets + golden dates), which is the
conformance oracle for the engine; no reference code is copied.

Run: python tools/extract_core_cases.py  (writes tests/data/*.json)
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "tests" / "data"


def parse_go_string(src: str, start: int) -> tuple[str, int]:
    """Parse a Go string literal starting at src[start] ('`' or '\"')."""
    q = src[start]
    if q == "`":
        end = src.index("`", start + 1)
        return src[start + 1 : end], end + 1
    assert q == '"'
    out = []
    i = start + 1
    while True:
        ch = src[i]
        if ch == "\\":
            nxt = src[i + 1]
            mapping = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "'": "'"}
            if nxt in mapping:
                out.append(mapping[nxt])
                i += 2
            elif nxt == "u":
                out.append(chr(int(src[i + 2 : i + 6], 16)))
                i += 6
            elif nxt == "x":
                out.append(chr(int(src[i + 2 : i + 4], 16)))
                i += 4
            else:
                out.append(nxt)
                i += 2
        elif ch == '"':
            return "".join(out), i + 1
        else:
            out.append(ch)
            i += 1


def extract_func(src: str, name: str) -> str:
    m = re.search(rf"^func {name}\(", src, re.M)
    assert m, name
    rest = src[m.start():]
    nxt = re.search(r"^func ", rest[1:], re.M)
    return rest[: nxt.start() + 1] if nxt else rest


def opts_from_arg(arg: str) -> dict:
    arg = arg.strip()
    if not arg:
        return {}
    if arg == "useOriginalDate":
        return {"use_original_date": True}
    if arg == "skipExtensiveSearch":
        return {"skip_extensive_search": True}
    m = re.match(r"Options\{MinDate: time\.Date\((\d+), (\d+), (\d+),", arg)
    if m:
        return {"min_date": f"{int(m.group(1)):04d}-{int(m.group(2)):02d}-{int(m.group(3)):02d}"}
    raise ValueError(f"unhandled opts arg: {arg}")


def main() -> None:
    src = (REF / "core_test.go").read_text()
    body = extract_func(src, "Test_HtmlDate")

    cases = []
    cur = {"str": "", "url": ""}
    i = 0
    n = len(body)
    while i < n:
        line_end = body.find("\n", i)
        if line_end == -1:
            line_end = n
        line = body[i:line_end]
        stripped = line.strip()

        m = re.match(r"(str|url)\s*=\s*$", stripped)
        m2 = re.match(r"(str|url)\s*=\s*([`\"])", stripped)
        if m2:
            var = m2.group(1)
            qpos = i + line.index(m2.group(2))
            value, after = parse_go_string(body, qpos)
            cur[var] = value
            i = after
            continue

        m3 = re.match(r"check(String|MockFile|URL)\((str|url), ", stripped)
        if m3:
            kind = {"String": "str", "MockFile": "mock", "URL": "url"}[m3.group(1)]
            argstart = i + line.index(", ") + 2
            expected, after = parse_go_string(body, argstart)
            rest = body[after : body.index(")", after)]
            opts = opts_from_arg(rest.lstrip(", ").strip())
            cases.append(
                {
                    "kind": kind,
                    "input": cur[m3.group(2)],
                    "expected": expected,
                    "opts": opts,
                }
            )
            i = body.index(")", after) + 1
            continue

        i = line_end + 1

    mock_src = (REF / "mock_test.go").read_text()
    map_body = mock_src.split("var mapMockFiles = map[string]string{", 1)[1]
    mock_map = dict(re.findall(r'"([^"]+)":\s*"([^"]+)"', map_body))

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "core_cases.json").write_text(json.dumps(cases, indent=1, ensure_ascii=False))
    (OUT / "mock_files.json").write_text(json.dumps(mock_map, indent=1, ensure_ascii=False))
    kinds = {}
    for c in cases:
        kinds[c["kind"]] = kinds.get(c["kind"], 0) + 1
    print(f"extracted {len(cases)} cases: {kinds}; {len(mock_map)} mock files")




def extract_comparison() -> None:
    """Extract the 1000-entry golden corpus (URL, file, golden date, and the
    reference's own fast/extensive outputs) from scripts/comparison/data-*.go."""
    entries = []
    for fname, source in (
        ("data-mediacloud.go", "mediacloud"),
        ("data-default.go", "default"),
    ):
        src = (REF / "scripts" / "comparison" / fname).read_text()
        for m in re.finditer(
            r'URL:\s*"([^"]*)",\s*File:\s*"([^"]*)",\s*Date:\s*"([^"]*)",'
            r'\s*Fast:\s*"([^"]*)",\s*Extensive:\s*"([^"]*)",',
            src,
        ):
            entries.append(
                {
                    "url": m.group(1),
                    "file": m.group(2),
                    "date": m.group(3),
                    "fast": m.group(4),
                    "extensive": m.group(5),
                    "source": source,
                }
            )
    (OUT / "comparison_corpus.json").write_text(json.dumps(entries, indent=0))
    print(f"extracted {len(entries)} comparison entries")




def extract_re2go_cases() -> None:
    """Extract the per-pattern success/fail tables from
    internal/re2go/re2go_test.go into a JSON fixture."""
    src = (REF / "internal" / "re2go" / "re2go_test.go").read_text()
    funcs = {}
    for m in re.finditer(r"^func (Test_\w+)\(t \*testing\.T\) \{", src, re.M):
        start = m.end()
        nxt = re.search(r"^func ", src[start:], re.M)
        end = start + (nxt.start() if nxt else len(src[start:]))
        funcs[m.group(1)] = src[start:end]

    def parse_calls(body, name):
        out = []
        for cm in re.finditer(rf"{name}\(", body):
            args = []
            i = cm.end()
            while src is not None:
                while body[i] in " \n\t,":
                    i += 1
                if body[i] == ")":
                    break
                if body[i] in "`\"":
                    val, i = parse_go_string(body, i)
                    args.append(val)
                elif body[i] == "s" and body[i : i + 3] == "str":
                    args.append(("VAR", "str"))
                    i += 3
                else:  # number
                    j = i
                    while body[j] not in ",)":
                        j += 1
                    args.append(int(body[i:j].strip()))
                    i = j
            out.append((cm.start(), args))
        return out

    data = {}
    for fname, body in funcs.items():
        # resolve `str = ...` assignments positionally
        assigns = [
            (m.start(), parse_go_string(body, body.index('"', m.start())
             if body[m.end()] == '"' else body.index("`", m.start()))[0])
            for m in re.finditer(r"\bstr = (?=[\"`])", body)
        ]

        def resolve(pos, arg):
            if arg == ("VAR", "str"):
                prior = [v for p, v in assigns if p < pos]
                return prior[-1]
            return arg

        cases = {"success": [], "fail": []}
        for kind, fn_names in (
            ("success", ("assertSuccess", "success")),
            ("fail", ("assertFail", "fail")),
        ):
            for fn_name in fn_names:
                for pos, args in parse_calls(body, fn_name):
                    cases[kind].append([resolve(pos, a) for a in args])
        if cases["success"] or cases["fail"]:
            data[fname] = cases
    (OUT / "re2go_cases.json").write_text(json.dumps(data, indent=0, ensure_ascii=False))
    print(
        "re2go cases:",
        {k: (len(v["success"]), len(v["fail"])) for k, v in data.items()},
    )


if __name__ == "__main__":
    extract_comparison()
    extract_re2go_cases()
    main()
