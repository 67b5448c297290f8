"""Unit tests for the Unicode-script language ID (text_stage.script_lang_batch).

Covers every decision branch of _SCRIPT_LANG_RULES, the stopword
fallback, the first-strict-max main_script tie-break, and pins the
vectorized codepoint bucketing to a scalar per-character reference.
"""

import numpy as np
import pyarrow as pa

from go_htmldate_ray.stages.text_stage import (
    SCRIPT_SNIPPETS,
    _SCRIPT_NAMES,
    _SCRIPT_RANGES,
    _script_counts,
    plant_script_snippets,
    script_lang_batch,
)


def _run(texts):
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    return script_lang_batch(t).to_pydict()


def _scalar_counts(text):
    counts = [0] * len(_SCRIPT_NAMES)
    for ch in text or "":
        cp = ord(ch)
        for i, (_n, ranges) in enumerate(_SCRIPT_RANGES):
            if any(lo <= cp <= hi for lo, hi in ranges):
                counts[i] += cp >= 0  # always 1 when matched
                break
    return counts


def test_script_counts_match_scalar_reference():
    texts = [
        "hello мир 汉字 καλά 한글",
        "",
        "ासही हिंदी ไทย עברית عربي",
        "emoji \U0001f600 digits 123 !?",  # astral + non-letters: uncounted
        "ひらがなカタカナ交じり文",
        "\x00\x01 control",
    ]
    got = _script_counts(texts)
    want = np.array([_scalar_counts(t) for t in texts])
    assert got.tolist() == want.tolist()


def test_every_script_rule_branch():
    cases = {
        "これはてすと": "ja",  # hiragana
        "カタカナ": "ja",  # katakana
        "漢字まじりの文章です": "ja",  # kana present, han-heavy
        "汉字文本": "zh",  # han, no kana
        "한국어문장": "ko",
        "نصعربي": "ar",
        "טקסטעברי": "he",
        "ελληνικό": "el",
        "हिंदी": "hi",
        "ไทยไทย": "th",
    }
    out = _run(list(cases))
    assert out["pred_lang"] == list(cases.values())


def test_fallback_paths():
    out = _run(
        [
            "the cat and the dog is in the house",  # latin -> stopwords: en
            "и в не на что это как",  # cyrillic -> stopwords: ru
            "zzz qqq xxx",  # latin, no stopword hits -> und
            "",  # no letters -> none/und
            "word word 汉",  # han below 30% -> fallback en? no 'the' -> und
        ]
    )
    assert out["pred_lang"] == ["en", "ru", "und", "und", "und"]
    assert out["main_script"][0] == "latin"
    assert out["main_script"][1] == "cyrillic"
    assert out["main_script"][3] == "none"
    assert out["total_letters"][3] == 0


def test_main_script_tie_breaks_first_declared():
    # 2 latin vs 2 greek letters: latin is declared first -> wins the tie
    out = _run(["abαβ"])
    assert out["main_script"] == ["latin"]
    assert out["script_chars"] == [2]
    assert out["total_letters"] == [4]


def test_threshold_boundary_integer_exact():
    # exactly 30%: 3 han out of 10 letters -> 10*3 >= 3*10 holds -> zh
    out = _run(["abcdefg汉字字"])
    assert out["pred_lang"] == ["zh"]
    # just under: 2 han out of 10 -> falls back
    out = _run(["abcdefgh汉字"])
    assert out["pred_lang"] == ["und"]


def test_plant_script_snippets_classes():
    ids = list(range(12))
    t = pa.table({"doc_id": ids, "text": ["lorem ipsum"] * 12})
    out = plant_script_snippets(t).to_pydict()
    assert out["text"][0] == "lorem ipsum"
    assert out["text"][11] == "lorem ipsum 汉"
    for cls, snippet in SCRIPT_SNIPPETS.items():
        assert out["text"][cls] == snippet


def test_null_text_treated_as_empty():
    t = pa.table(
        {"doc_id": [0, 1], "text": pa.array([None, "汉字汉字"], pa.string())}
    )
    out = script_lang_batch(t).to_pydict()
    assert out["pred_lang"] == ["und", "zh"]
    assert out["main_script"][0] == "none"
