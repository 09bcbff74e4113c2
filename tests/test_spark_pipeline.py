"""Spark pipeline integration: the distributed extraction must produce
exactly what the local reference-semantics oracle (scrape_local) produces
over the same synthetic pages — including subpage joins, error counting,
and guessYear — independent of parallelism."""

import pytest
from datetime import datetime, timezone

from goskyr_spark.kernels.scrape import scrape_local
from goskyr_spark.spark.pipeline import extract_items, metrics_df
from goskyr_spark.synth import SynthSpec, event_scraper, host_name, synth_pages_df


@pytest.fixture(scope="session")
def spark():
    from goskyr_spark.spark.session import get_spark

    s = get_spark(app="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def spec():
    return SynthSpec(n_hosts=4, pages_per_host=3, items_per_page=3,
                     hot_hosts=1, hot_factor=2)


@pytest.fixture(scope="session")
def pages(spark, spec):
    df = synth_pages_df(spark, spec).cache()
    df.count()
    return df


NOW = datetime(2026, 3, 1, tzinfo=timezone.utc)


def _local_oracle(spec, scraper, page_filter=None):
    """Run the pure-python reference-parity scraper over the same pages."""
    lookup = {}
    for rid in range(spec.total_rows):
        r = spec.row(rid)
        lookup[r["url"]] = r["html"].decode()
    items, stats = scrape_local(scraper, lookup.get, now=NOW)
    return items, stats


def test_stage1_matches_local(spark, spec, pages):
    host = host_name(1)
    scraper = event_scraper(host)
    items_df, raw = extract_items(
        pages.filter(pages.url.startswith(f"https://{host}/list/")),
        scraper, now=NOW)
    got = [r.asDict() for r in items_df.collect()]

    expected, stats = _local_oracle(spec, scraper)
    assert len(got) == len(expected) == stats["nrItems"]
    for g, e in zip(sorted(got, key=lambda r: (r["page_url"], r["item_idx"])),
                    expected):
        assert g["title"] == e["title"]
        assert g["genre"] == e["genre"]
        assert g["url"] == e["url"]
        assert g["host"] == host
        assert g["date"].replace(tzinfo=timezone.utc) == e["date"]


def test_subpage_join_matches_local(spark, spec, pages):
    host = host_name(2)
    scraper = event_scraper(host, subpage=True)
    # stage-1 input restricted to this host's list pages; the full pages
    # table backs the subpage join
    items_df, raw = extract_items_with_full_pages(pages, host, scraper)
    got = sorted([r.asDict() for r in items_df.collect()],
                 key=lambda r: (r["page_url"], r["item_idx"]))
    expected, stats = _local_oracle(spec, scraper)
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g["title"] == e["title"]
        assert g["desc"] == e["desc"]


def extract_items_with_full_pages(pages, host, scraper):
    from goskyr_spark.spark.pipeline import (
        extract_stage1, extract_stage2_subpages, finalize_items_df,
    )

    stage1 = extract_stage1(
        pages.filter(pages.url.startswith(f"https://{host}/list/")),
        scraper, now=NOW)
    stage2 = extract_stage2_subpages(stage1, pages, scraper, now=NOW)
    return finalize_items_df(stage2, scraper, now=NOW), stage2


def test_metrics_error_counting(spark, pages):
    # a scraper whose date never parses → every item errors out
    from goskyr_spark.config import loads_config

    host = host_name(0)
    bad = loads_config(f"""
scrapers:
  - name: bad
    url: "https://{host}/list/1"
    item: div.event
    fields:
      - name: date
        type: date
        components:
          - covers: {{day: true, month: true, year: true, time: true}}
            location: {{selector: .title}}
            layout: ["2.1.2006 15:04"]
""").scrapers[0]
    items_df, raw = extract_items(
        pages.filter(pages.url.startswith(f"https://{host}/list/")),
        bad, now=NOW)
    m = metrics_df(raw).collect()[0]
    assert items_df.count() == 0
    assert m["nr_errors"] > 0


def test_parallelism_invariance(spark, spec, pages):
    """Same items regardless of partitioning (crawl-ordering invariant)."""
    host = host_name(1)
    scraper = event_scraper(host)
    base = pages.filter(pages.url.startswith(f"https://{host}/list/"))
    a, _ = extract_items(base.repartition(1), scraper, now=NOW)
    b, _ = extract_items(base.repartition(7), scraper, now=NOW)
    ra = [tuple(sorted(r.asDict().items())) for r in a.collect()]
    rb = [tuple(sorted(r.asDict().items())) for r in b.collect()]
    assert ra == rb


def test_mock_page_via_spark(spark, pages):
    """The reference's own config-mock.yaml through the Spark pipeline."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_mock_e2e import MOCK_CONFIG, EXPECTED, STATIC
    from goskyr_spark.config import loads_config
    from goskyr_spark.kernels.gocompat import go_rfc3339
    from zoneinfo import ZoneInfo

    scraper = loads_config(MOCK_CONFIG).scrapers[0]
    items_df, _ = extract_items(
        pages.filter(pages.url == "https://mock.url"), scraper, now=NOW)
    got = sorted([r.asDict() for r in items_df.collect()],
                 key=lambda r: r["item_idx"])
    assert len(got) == 3
    for g, (title, rfc) in zip(got, EXPECTED):
        assert g["title"] == title
        # spark stores UTC; mock config has no date_location → UTC already
        assert go_rfc3339(g["date"].replace(tzinfo=timezone.utc)) == rfc
        for k, v in STATIC.items():
            assert g[k] == v
