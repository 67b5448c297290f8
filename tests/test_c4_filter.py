"""Unit tests for the C4-style line/document filter (cleaning.c4_rules_batch)."""

import hashlib

import pyarrow as pa

from go_htmldate_ray.stages.cleaning import (
    _C4_CLASS_LINES,
    _c4_keep_line,
    c4_rules_batch,
    plant_c4_lines,
)


def _run(texts):
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    return c4_rules_batch(t).to_pydict()


def test_line_rules():
    assert _c4_keep_line("This sentence is long enough.")
    assert _c4_keep_line('He said "stop"? Quite so!')
    assert not _c4_keep_line("no terminal punctuation here")
    assert not _c4_keep_line("Too short.")
    assert not _c4_keep_line("Enable JavaScript to continue please.")
    assert not _c4_keep_line("Read our Privacy Policy before continuing.")
    assert not _c4_keep_line("See the Terms of Use for details.")
    assert not _c4_keep_line("Our Cookie Policy explains the tracking.")
    assert not _c4_keep_line("")
    assert not _c4_keep_line("...")  # punctuation-only: 1 word < 3


def test_doc_rules_and_md5():
    good = "One good line right here.\nAnother fine line ends well.\nA. B. C."
    out = _run([good])
    assert out["n_lines"] == [3]
    assert out["n_kept_lines"] == [3]
    assert out["n_sentences"] == [5]
    assert out["keep_doc"] == [1]
    kept = "\n".join(good.split("\n"))
    assert out["kept_md5"] == [hashlib.md5(kept.encode()).hexdigest()]


def test_doc_drops():
    lorem = "Lorem Ipsum is just filler.\nGood line with five words here. A. B. C. D."
    brace = "This has a { brace inside it.\nOther good text ends properly. A. B. C. D."
    short = "Only one kept line here.\nno terminal"
    out = _run([lorem, brace, short])
    assert out["has_lorem"] == [1, 0, 0]
    assert out["has_brace"] == [0, 1, 0]
    assert out["keep_doc"] == [0, 0, 0]  # lorem, brace, <5 sentences


def test_lines_trimmed_before_rules():
    out = _run(["   padded line ends fine.   \n\t\tshort one.\t"])
    assert out["n_kept_lines"] == [1]
    kept_md5 = hashlib.md5(b"padded line ends fine.").hexdigest()
    assert out["kept_md5"] == [kept_md5]


def test_null_and_empty():
    t = pa.table({"doc_id": [0, 1], "text": pa.array([None, ""], pa.string())})
    out = c4_rules_batch(t).to_pydict()
    assert out["n_lines"] == [1, 1]
    assert out["n_kept_lines"] == [0, 0]
    assert out["keep_doc"] == [0, 0]


def test_plant_c4_lines_classes():
    base = "w" * 80
    t = pa.table({"doc_id": list(range(15)), "text": [base] * 15})
    out = plant_c4_lines(t).to_pydict()
    for i, txt in enumerate(out["text"]):
        lines = txt.split("\n")
        assert lines[0] == base[:40] + " one."
        assert lines[1] == "too short."
        assert lines[2] == base[40:70] + " no terminal"
        cls = i % 5
        if cls in _C4_CLASS_LINES:
            assert lines[3] == _C4_CLASS_LINES[cls]
        assert lines[-1] == ("A. B. C. D. E." if i % 3 == 0 else "A. B.")
