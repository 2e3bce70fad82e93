"""Layered settings (S7) — reference oracle settings.rs:94-107:
defaults ← file ← explicit path, later layers win per key."""

from __future__ import annotations

from vat_abcd_crawler_ray.config import Settings, load_settings


def test_defaults():
    s = Settings()
    assert s.abcd.landing_page_field.endswith("/Representation/URI")
    assert s.crawl.default_host_budget == 8
    assert not s.debug


def test_overlay_chain(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "settings.toml").write_text(
        "[crawl]\ndefault_host_budget = 99\nmax_rounds = 5\n"
    )
    override = tmp_path / "override.toml"
    override.write_text(
        "debug = true\n[crawl]\nmax_rounds = 7\n[abcd]\nlandingpage_url = 'http://x'\n"
    )
    s = load_settings(str(override))
    # local file layer applied
    assert s.crawl.default_host_budget == 99
    # explicit path wins over local file
    assert s.crawl.max_rounds == 7
    assert s.debug is True
    assert s.abcd.landingpage_url == "http://x"
    # untouched keys keep defaults
    assert s.crawl.salt_buckets == 16


def test_unknown_keys_ignored(tmp_path):
    p = tmp_path / "s.toml"
    p.write_text("[crawl]\nnot_a_key = 1\n[nope]\nx = 2\n")
    s = load_settings(str(p))
    assert s.crawl.default_host_budget == 8
