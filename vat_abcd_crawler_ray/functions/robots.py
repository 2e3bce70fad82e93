"""robots.txt parsing and matching (RFC 9309, public spec) — the
piece that turns fetched ``/robots.txt`` bodies into the per-host
rules the crawl's admission gate consumes
(``pipelines/crawl.py::_robots_denied`` applies a simplified
host → denied-prefix table; this parser is how a production run
builds it from the live files).

Semantics implemented per the RFC:
- group selection: the most specific matching ``User-agent`` line
  (longest token match; ``*`` only when nothing else matches), with
  adjacent UA lines sharing one group;
- rule matching: ``Allow``/``Disallow`` by LONGEST matched pattern,
  ``Allow`` winning exact-length ties;
- wildcards: ``*`` matches any span, ``$`` anchors the pattern end;
- an empty ``Disallow:`` means allow-all (the classic idiom).

Matching compiles each pattern to a regex ONCE per ruleset (build in
the actor's ``__init__`` / once per host, not per URL) and evaluates
paths vectorized via ``pandas.str.match`` per rule — rulesets are
small (tens of rules), paths are many.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _pattern_to_regex(pat: str) -> re.Pattern:
    """robots pattern → anchored regex: ``*`` → ``.*``, trailing
    ``$`` → end anchor, everything else literal, prefix semantics."""
    anchored = pat.endswith("$")
    if anchored:
        pat = pat[:-1]
    parts = [re.escape(p) for p in pat.split("*")]
    return re.compile("^" + ".*".join(parts) + ("$" if anchored else ""))


class RobotsRules:
    """Parsed rules for one (robots.txt, user-agent) pair."""

    def __init__(self, rules: list[tuple[str, bool]], crawl_delay: float | None):
        # sort once: longest pattern first; Allow before Disallow at
        # equal length (RFC tie-break)
        self.rules = sorted(
            rules, key=lambda r: (len(r[0]), r[1]), reverse=True
        )
        self.crawl_delay = crawl_delay
        self._compiled = [
            (_pattern_to_regex(p), allow) for p, allow in self.rules
        ]

    def allowed(self, path: str) -> bool:
        for rx, allow in self._compiled:
            if rx.match(path):
                return allow
        return True  # no matching rule → allowed

    def allowed_batch(self, paths: pd.Series) -> np.ndarray:
        """Vectorized longest-match over many paths: evaluate each
        rule's regex across the whole series (rules are few, paths are
        many); the first rule (longest) that matches decides."""
        paths = paths.fillna("")
        out = np.ones(len(paths), dtype=bool)
        undecided = np.ones(len(paths), dtype=bool)
        for rx, allow in self._compiled:
            if not undecided.any():
                break
            m = paths.str.match(rx).to_numpy(dtype=bool)
            hit = m & undecided
            out[hit] = allow
            undecided &= ~m
        return out


def parse_robots(text: str, user_agent: str = "*") -> RobotsRules:
    """robots.txt body → :class:`RobotsRules` for ``user_agent``.

    Group selection per RFC 9309: the group whose User-agent token is
    the LONGEST case-insensitive substring match of ``user_agent``
    wins; ``*`` groups apply only when no named group matches. Records
    separated by UA lines; Allow/Disallow/Crawl-delay collected;
    unknown directives ignored."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        name, _, val = line.partition(":")
        name = name.strip().lower()
        val = val.strip()
        if name == "user-agent":
            if in_rules:  # a UA line after rules starts a new group
                flush()
                in_rules = False
            cur_agents.append(val.lower())
        elif name in ("allow", "disallow"):
            in_rules = True
            if val:  # empty Disallow: = allow all (no rule)
                cur_rules.append((val, name == "allow"))
        elif name == "crawl-delay":
            in_rules = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        # sitemap/unknown: ignored (RFC: non-group records)
    flush()

    best: tuple[int, list, float | None] | None = None
    star: tuple[list, float | None] | None = None
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = (rules, delay)
            elif a in ua:
                if best is None or len(a) > best[0]:
                    best = (len(a), rules, delay)
    if best is not None:
        return RobotsRules(best[1], best[2])
    if star is not None:
        return RobotsRules(star[0], star[1])
    return RobotsRules([], None)


def robots_denied_paths(
    bodies: pd.Series, paths: pd.Series, user_agent: str = "*"
) -> np.ndarray:
    """Aligned (robots_body, path) rows → denied mask. Per-row parse
    is cached by body identity (a host's robots.txt repeats across its
    rows), so N rows with H distinct hosts parse H times."""
    cache: dict[str, RobotsRules] = {}
    out = np.zeros(len(paths), dtype=bool)
    bodies = bodies.fillna("")
    for body in bodies.unique():
        rules = cache.setdefault(body, parse_robots(body, user_agent))
        sel = (bodies == body).to_numpy(dtype=bool)
        out[sel] = ~rules.allowed_batch(paths[sel])
    return out
