"""C1 debug window (main.rs:154-169): skip(start).take(limit) on seeds,
only active when debug is set."""

from __future__ import annotations

import pandas as pd
import pytest

from vat_abcd_crawler_ray.config import Settings
from vat_abcd_crawler_ray.pipelines.crawl import CrawlRun
from vat_abcd_crawler_ray.sources.synthetic import corpus_dir


@pytest.mark.usefixtures("ray_session")
def test_debug_window_limits_seeds(tmp_path):
    corpus = corpus_dir("/root/testdata/sf0.001")
    s = Settings()
    s.debug = True
    s.dataset_start = 0
    s.dataset_limit = 3
    s.crawl.max_rounds = 1
    run = CrawlRun(
        f"{corpus}/pages.parquet",
        f"{corpus}/seeds.parquet",
        f"{corpus}/politeness.parquet",
        str(tmp_path / "run"),
        settings=s,
    )
    m = run.run()
    # only the first 3 seeds enter the frontier
    assert m.per_round[0]["frontier"] <= 3
    assert m.fetched + m.fetch_misses <= 3
