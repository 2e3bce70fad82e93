"""functions/robots — RFC 9309 robots.txt parsing and matching."""

import numpy as np
import pandas as pd
import pytest

from vat_abcd_crawler_ray.functions.robots import (
    parse_robots,
    robots_denied_paths,
)

BASIC = """
# comment line
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2.5

User-agent: special-bot
Disallow: /
Allow: /public/
"""


class TestGroups:
    def test_star_group(self):
        r = parse_robots(BASIC, "anybot/1.0")
        assert not r.allowed("/private/x")
        assert r.allowed("/private/ok/page")  # longer Allow wins
        assert r.allowed("/open/page")
        assert r.crawl_delay == 2.5

    def test_named_group_most_specific(self):
        r = parse_robots(BASIC, "Special-Bot/2.0 (crawler)")
        assert not r.allowed("/anything")
        assert r.allowed("/public/page")

    def test_adjacent_ua_lines_share_group(self):
        txt = "User-agent: alphabot\nUser-agent: betabot\nDisallow: /x/"
        assert not parse_robots(txt, "betabot/1.0").allowed("/x/1")
        assert parse_robots(txt, "gammabot/1.0").allowed("/x/1")

    def test_longest_ua_token_wins(self):
        txt = ("User-agent: bot\nDisallow: /short/\n\n"
               "User-agent: botzilla\nDisallow: /long/")
        r = parse_robots(txt, "my-botzilla/9")
        assert r.allowed("/short/x") and not r.allowed("/long/x")

    def test_empty_disallow_is_allow_all(self):
        r = parse_robots("User-agent: *\nDisallow:", "x")
        assert r.allowed("/anything")

    def test_no_rules_at_all(self):
        assert parse_robots("", "x").allowed("/a")


class TestPatterns:
    def test_wildcard_star(self):
        r = parse_robots("User-agent: *\nDisallow: /*/print", "x")
        assert not r.allowed("/a/print")
        assert not r.allowed("/deep/nested/print")  # * spans slashes
        assert r.allowed("/print")

    def test_dollar_anchor(self):
        r = parse_robots("User-agent: *\nDisallow: /*.pdf$", "x")
        assert not r.allowed("/doc.pdf")
        assert r.allowed("/doc.pdf.html")

    def test_longest_match_precedence(self):
        txt = ("User-agent: *\nDisallow: /a/\nAllow: /a/b/\n"
               "Disallow: /a/b/c/")
        r = parse_robots(txt, "x")
        assert not r.allowed("/a/z")
        assert r.allowed("/a/b/z")
        assert not r.allowed("/a/b/c/z")

    def test_allow_wins_equal_length_tie(self):
        # RFC tie-break: same matched-pattern length → Allow
        r = parse_robots("User-agent: *\nDisallow: /pg\nAllow: /pg", "x")
        assert r.allowed("/pg1")

    def test_regex_metachars_are_literal(self):
        r = parse_robots("User-agent: *\nDisallow: /a+b?.c/", "x")
        assert not r.allowed("/a+b?.c/x")
        assert r.allowed("/aab.c/x")


class TestVectorized:
    def test_allowed_batch_matches_scalar(self):
        r = parse_robots(BASIC, "anybot")
        paths = pd.Series([
            "/private/x", "/private/ok/y", "/open", "/private/okay", None,
        ])
        got = r.allowed_batch(paths)
        want = np.array([r.allowed(p or "") for p in paths])
        assert (got == want).all()

    def test_denied_paths_per_host_cache(self):
        bodies = pd.Series(
            ["User-agent: *\nDisallow: /no/"] * 3
            + ["User-agent: *\nDisallow: /"] * 2
        )
        paths = pd.Series(["/no/1", "/yes/1", "/no/2", "/a", "/b"])
        denied = robots_denied_paths(bodies, paths)
        assert list(denied) == [True, False, True, True, True]
