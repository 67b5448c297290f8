"""robots.txt rules cache.

A named cache actor maps host → parsed rule list; the crawl driver
fetches rules once per newly-seen host and broadcasts the accumulated
rule table (``ray.put``) into each wave's filter stage — a small-side
lookup, never a shuffle join (SURVEY.md §2.6).

The parser implements the User-agent/Allow/Disallow prefix subset; in
this sandbox the "fetch" of robots.txt is a deterministic synthetic
policy over the synthetic host space (hosts whose index % 13 == 0
disallow /article/).
"""

from __future__ import annotations

import re
from typing import Optional

import ray


def parse_robots(text: str) -> list[tuple[str, str]]:
    """Parse robots.txt → [(verb, path_prefix)] for User-agent: *."""
    rules: list[tuple[str, str]] = []
    applies = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            applies = value == "*"
        elif applies and key in ("allow", "disallow") and value:
            rules.append((key, value))
    return rules


def allowed(path: str, rules: list[tuple[str, str]]) -> bool:
    """Longest-prefix-match wins; allow on tie/no-match (Google semantics)."""
    best_len = -1
    best_verb = "allow"
    for verb, prefix in rules:
        if path.startswith(prefix) and len(prefix) > best_len:
            best_len = len(prefix)
            best_verb = verb
    return best_verb == "allow"


_SYNTH_HOST = re.compile(r"site(\d+)\.example\.org")


def synthetic_robots_txt(host: str) -> str:
    """Deterministic robots policy for the synthetic corpus."""
    m = _SYNTH_HOST.fullmatch(host)
    if m and int(m.group(1)) % 13 == 0:
        return "User-agent: *\nDisallow: /article/\n"
    return "User-agent: *\nAllow: /\n"


@ray.remote
class RobotsCache:
    """host → rules, fetched once per host."""

    def __init__(self):
        self.rules: dict[str, list[tuple[str, str]]] = {}

    def get_rules(self, hosts: list[str]) -> dict[str, list[tuple[str, str]]]:
        for host in hosts:
            if host not in self.rules:
                self.rules[host] = parse_robots(synthetic_robots_txt(host))
        return {h: self.rules[h] for h in hosts}

    def all_rules(self) -> dict[str, list[tuple[str, str]]]:
        return dict(self.rules)

    def load(self, rules: dict[str, list[tuple[str, str]]]) -> None:
        self.rules.update(rules)
