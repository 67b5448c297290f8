"""Pattern-scanner conformance against the reference's re2go test tables
(internal/re2go/re2go_test.go), mechanically extracted to
tests/data/re2go_cases.json.  Pins exact match spans, capture groups and
scan-start offsets (byte offsets in Go, converted to char offsets here)."""

import json
from pathlib import Path

import pytest

from go_htmldate_ray.functions import patterns as P

CASES = json.loads((Path(__file__).parent / "data" / "re2go_cases.json").read_text())


def byte_to_char(s: str, byte_off: int) -> int:
    return len(s.encode("utf-8")[:byte_off].decode("utf-8"))


# --- idiosyncrasies ----------------------------------------------------------

@pytest.mark.parametrize(
    "args", CASES["Test_IdiosyncracyPatternSubmatch"]["success"],
    ids=lambda a: a[0][:40],
)
def test_idiosyncrasy_success(args):
    s, start, *expected_parts = args
    parts, got_start = P.idiosyncrasy_pattern_submatch(s)
    assert parts == expected_parts
    assert got_start == byte_to_char(s, start)


@pytest.mark.parametrize(
    "args", CASES["Test_IdiosyncracyPatternSubmatch"]["fail"],
    ids=lambda a: a[0][:40],
)
def test_idiosyncrasy_fail(args):
    parts, _ = P.idiosyncrasy_pattern_submatch(args[0])
    assert parts == []


# --- finditer-style scanners -------------------------------------------------

_FULL_MATCH_FUNCS = {
    "Test_SelectYmdPattern": (P.SELECT_YMD_PATTERN, 0),
    "Test_SlashesPattern": (P.SLASHES_PATTERN, 0),
    "Test_MmYyyyPattern": (P.MM_YYYY_PATTERN, 0),
    "Test_ThreePattern": (P.THREE_PATTERN, 1),
    "Test_ThreeLoosePattern": (P.THREE_LOOSE_PATTERN, 1),
    "Test_DateStringsPattern": (P.DATE_STRINGS_PATTERN, 1),
    "Test_YyyyMmPattern": (P.YYYY_MM_PATTERN, 1),
    "Test_SimplePattern": (P.SIMPLE_PATTERN, 1),
}

_SCANNER_CASES = [
    (fname, kind, args)
    for fname in _FULL_MATCH_FUNCS
    for kind in ("success", "fail")
    for args in CASES[fname][kind]
]


@pytest.mark.parametrize(
    "fname,kind,args", _SCANNER_CASES, ids=lambda v: str(v)[:50]
)
def test_scanner(fname, kind, args):
    pattern, group = _FULL_MATCH_FUNCS[fname]
    matches = list(pattern.finditer(args[0]))
    if kind == "fail":
        assert matches == []
    else:
        assert len(matches) == 1, args[0]
        assert matches[0].group(group) == args[1]


# --- copyright (full match + year group) -------------------------------------

@pytest.mark.parametrize(
    "args", CASES["Test_CopyrightPattern"]["success"], ids=lambda a: a[0][:40]
)
def test_copyright_success(args):
    s, full, year = args
    matches = list(P.COPYRIGHT_PATTERN.finditer(s))
    assert len(matches) == 1
    assert matches[0].group(0) == full
    assert matches[0].group(1) == year


@pytest.mark.parametrize(
    "args", CASES["Test_CopyrightPattern"]["fail"], ids=lambda a: a[0][:40]
)
def test_copyright_fail(args):
    assert list(P.COPYRIGHT_PATTERN.finditer(args[0])) == []


# --- long-text + timestamp ---------------------------------------------------

@pytest.mark.parametrize(
    "args", CASES["Test_FindLongTextPattern"]["success"], ids=lambda a: a[0][:40]
)
def test_long_text_success(args):
    s, year, month, day = args
    got = P.find_long_text_pattern(s)
    assert got == (year, month, day)


@pytest.mark.parametrize(
    "args", CASES["Test_FindLongTextPattern"]["fail"], ids=lambda a: a[0][:40]
)
def test_long_text_fail(args):
    assert P.find_long_text_pattern(args[0]) is None


@pytest.mark.parametrize(
    "args", CASES["Test_TimestampPatternSubmatch"]["success"], ids=lambda a: a[0][:40]
)
def test_timestamp_success(args):
    s, expected = args
    parts, _ = P.timestamp_pattern_submatch(s)
    assert len(parts) == 2
    assert parts[1] == expected


@pytest.mark.parametrize(
    "args", CASES["Test_TimestampPatternSubmatch"]["fail"], ids=lambda a: a[0][:40]
)
def test_timestamp_fail(args):
    parts, _ = P.timestamp_pattern_submatch(args[0])
    assert parts == []
