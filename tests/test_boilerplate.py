"""Unit tests for jusText-style boilerplate classification
(text_extract.extract_blocks / boilerplate_batch)."""

import hashlib

import pyarrow as pa

from go_htmldate_ray import dom
from go_htmldate_ray.stages.text_extract import (
    boilerplate_batch,
    extract_blocks,
)


def _blocks(html: str):
    return extract_blocks(dom.parse_html(html.encode()))


def test_blocks_with_link_words():
    html = (
        "<html><body><h1>Title Here</h1>"
        "<p>one two three four five six seven eight nine ten eleven.</p>"
        '<footer><a href="/x">nav one</a> <a href="/y">nav two</a></footer>'
        "</body></html>"
    )
    out = _blocks(html)
    assert out[0] == ("Title Here", 2, 0)
    assert out[1][1] == 11 and out[1][2] == 0
    assert out[2] == ("nav one nav two", 4, 4)


def test_nested_anchor_and_inline():
    # anchor inside inline <span>, mixed link/plain words in one block
    html = (
        "<body><p>plain <span><a href='/'>linked words</a></span> tail"
        "</p></body>"
    )
    out = _blocks(html)
    assert out == [("plain linked words tail", 4, 2)]


def test_skip_script_and_head():
    html = (
        "<head><title>skipped head</title></head>"
        "<body><script>var x = 1;</script><p>kept body text</p></body>"
    )
    out = _blocks(html)
    assert out == [("kept body text", 3, 0)]


def test_boilerplate_batch_classification():
    good_p = " ".join(f"w{i}" for i in range(12)) + "."
    linky = (
        "<p>" + " ".join(f'<a href="/{i}">l{i} x{i}</a>' for i in range(6))
        + "</p>"
    )  # 12 words, 12 link words -> density 1 -> boilerplate despite length
    html = f"<body><h1>T</h1><p>{good_p}</p>{linky}</body>".encode()
    t = pa.table({"doc_id": [0], "html": [html]})
    out = boilerplate_batch(t).to_pydict()
    assert out["n_blocks"] == [3]
    assert out["n_good"] == [1]
    assert out["good_words"] == [12]
    assert out["boiler_words"] == [1 + 12]
    assert out["good_md5"] == [hashlib.md5(good_p.encode()).hexdigest()]


def test_half_link_density_boundary():
    # 12 words, 6 linked: 2*6 < 12 is False -> boilerplate (density == 1/2)
    words = " ".join(f"w{i}" for i in range(6))
    html = f'<body><p>{words} <a href="/">{words}</a></p></body>'.encode()
    out = boilerplate_batch(
        pa.table({"doc_id": [0], "html": [html]})
    ).to_pydict()
    assert out["n_good"] == [0]
    # one word fewer linked: 2*5 < 11 -> good
    html2 = (
        f'<body><p>{words} w6 <a href="/">w7 w8 w9 w10 w11</a></p></body>'
    ).encode()
    out2 = boilerplate_batch(
        pa.table({"doc_id": [0], "html": [html2]})
    ).to_pydict()
    assert out2["n_good"] == [1]


def test_empty_and_hostile_inputs():
    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "html": pa.array([None, b"", b"<div><p>unclosed"], pa.binary()),
        }
    )
    out = boilerplate_batch(t).to_pydict()
    assert out["n_blocks"][0] == 0 and out["n_blocks"][1] == 0
    assert out["good_md5"][0] == hashlib.md5(b"").hexdigest()
