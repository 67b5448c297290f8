"""Unit tests for mojibake repair (cleaning.repair_mojibake)."""

import pyarrow as pa

from go_htmldate_ray.stages.cleaning import (
    MOJIBAKE_CASES,
    mojibake_batch,
    plant_mojibake,
    repair_mojibake,
)


def test_round_trip_repairs_mojibake():
    # every UTF-8 byte of these chars is cp1252-mappable (U+201D is
    # not: its trailing 0x9D is undefined in cp1252, so that mojibake
    # can never arise from a cp1252 decode in the first place)
    clean = "Café Münchén — “quote – dash"
    moji = clean.encode("utf-8").decode("cp1252")
    fixed, changed = repair_mojibake(moji)
    assert changed and fixed == clean


def test_pass_through_paths():
    # ASCII: round trip is identity -> unchanged
    assert repair_mojibake("plain ascii text") == ("plain ascii text", False)
    # correct accents: cp1252 bytes are not valid UTF-8 -> unchanged
    assert repair_mojibake("naïve café") == ("naïve café", False)
    # non-cp1252 codepoints: encode fails -> unchanged
    assert repair_mojibake("emoji \U0001f600") == ("emoji \U0001f600", False)
    # cyrillic: not encodable as cp1252 -> unchanged
    assert repair_mojibake("русский текст") == ("русский текст", False)


def test_planted_cases_match_expectations():
    for _cls, (inp, want) in MOJIBAKE_CASES.items():
        got, changed = repair_mojibake(inp)
        assert got == want
        assert changed == (inp != want)


def test_batch_columns():
    ids = list(range(10))
    t = pa.table({"doc_id": ids, "text": ["plain words"] * 10})
    out = mojibake_batch(plant_mojibake(t)).to_pydict()
    for i in ids:
        case = MOJIBAKE_CASES.get(i % 5)
        if case:
            assert out["changed"][i] == int(case[0] != case[1])
            assert out["n_chars_fixed"][i] == len(case[1])
        else:
            assert out["changed"][i] == 0
            assert out["n_chars_fixed"][i] == len("plain words")
