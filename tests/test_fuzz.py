"""Totality fuzzing: the parser and the full extraction cascade must never
raise, whatever bytes arrive (a crawler sees every malformation the web
can produce; a poisoned block would kill a 100 TB run)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_htmldate_ray import Options, from_html
from go_htmldate_ray.dom import parse_html

_SETTINGS = dict(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

TAGGY = st.text(
    alphabet='<>/="\' abcdefmetahtml!-?0123456789\n\t&;#',
    max_size=400,
)


@given(st.binary(max_size=1024))
@settings(**_SETTINGS)
def test_parse_arbitrary_bytes(data):
    parse_html(data)


@given(TAGGY)
@settings(**_SETTINGS)
def test_extract_markup_soup(text):
    res = from_html(text, Options(skip_extensive_search=True))
    assert res is not None


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_extract_unicode_extensive(text):
    html = f"<html><body><p class='date'>{text}</p></body></html>"
    res = from_html(html, Options(use_original_date=True))
    assert res is not None
