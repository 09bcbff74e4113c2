"""WARC container format (io/warc.py): byte-level round trip,
malformed-record resilience, and the Spark binaryFile source feeding
the extraction pipeline end to end."""

import pytest

from goskyr_spark.io.warc import (build_http_response, parse_warc,
                                  read_warc_pages, write_warc)


@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="warc-tests", master="local[2]",
                     shuffle_partitions=2)


def test_roundtrip_bytes():
    recs = [("https://a.test/x", build_http_response(b"<html>A</html>")),
            ("https://b.test/y", build_http_response(b"B", status=404))]
    parsed = list(parse_warc(write_warc(recs)))
    assert parsed == [("https://a.test/x", 200, b"<html>A</html>"),
                      ("https://b.test/y", 404, b"B")]


def test_non_response_records_ignored():
    data = write_warc([("https://a.test/", build_http_response(b"ok"))])
    warcinfo = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Length: 4\r\n\r\ninfo\r\n\r\n")
    parsed = list(parse_warc(warcinfo + data))
    assert [u for u, *_ in parsed] == ["https://a.test/"]


def test_malformed_record_skipped_not_fatal():
    good = write_warc([("https://a.test/", build_http_response(b"A")),
                       ("https://b.test/", build_http_response(b"B"))])
    # corrupt garbage between two valid records: the parser resyncs on
    # the next record marker instead of dying
    first_end = good.find(b"\r\n\r\nWARC/") + 4
    corrupted = good[:first_end] + b"GARBAGE NO HEADERS" + \
        b"\r\n\r\n" + good[first_end:]
    parsed = list(parse_warc(corrupted))
    assert [u for u, *_ in parsed] == ["https://a.test/",
                                       "https://b.test/"]


def test_bad_content_length_skipped():
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://x.test/\r\n"
           b"Content-Length: notanumber\r\n\r\n")
    good = write_warc([("https://a.test/", build_http_response(b"A"))])
    parsed = list(parse_warc(bad + good))
    assert [u for u, *_ in parsed] == ["https://a.test/"]


def test_http_without_status_line():
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://r.test/\r\n"
           b"Content-Length: 8\r\n\r\nrawbytes\r\n\r\n")
    assert list(parse_warc(raw)) == [("https://r.test/", 0, b"rawbytes")]


def test_spark_source_to_extraction(spark, tmp_path):
    """A .warc file on disk → read_warc_pages → extract_stage1 with the
    event scraper: items come out exactly as from a plain pages table."""
    from goskyr_spark.spark.pipeline import extract_stage1
    from goskyr_spark.synth import SynthSpec, event_scraper, host_name

    spec = SynthSpec(n_hosts=1, pages_per_host=1, items_per_page=3,
                     hot_hosts=0)
    recs = []
    for rid in range(spec.total_rows):
        r = spec.row(rid)
        if "/list/" in r["url"]:
            recs.append((r["url"], build_http_response(r["html"])))
    wpath = tmp_path / "pages.warc"
    wpath.write_bytes(write_warc(recs))

    pages = read_warc_pages(spark, str(wpath))
    rows = pages.collect()
    assert len(rows) == len(recs)
    assert all(r["http_status"] == 200 for r in rows)

    scraper = event_scraper(host_name(0))
    items = (extract_stage1(pages.select("url", "html"), scraper)
             .filter("item_idx >= 0"))
    assert items.count() == 3


def test_gzip_members_roundtrip():
    from goskyr_spark.io.warc import gunzip_members, write_warc_gz

    recs = [("https://a.test/", build_http_response(b"AAA")),
            ("https://b.test/", build_http_response(b"BBB"))]
    gz = write_warc_gz(recs)
    assert gz[:2] == b"\x1f\x8b"
    parsed = list(parse_warc(gunzip_members(gz)))
    assert [u for u, *_ in parsed] == ["https://a.test/",
                                       "https://b.test/"]


def test_gzip_truncated_member_not_fatal():
    from goskyr_spark.io.warc import gunzip_members, write_warc_gz

    recs = [("https://a.test/", build_http_response(b"AAA")),
            ("https://b.test/", build_http_response(b"BBB"))]
    gz = write_warc_gz(recs)
    # cut inside the SECOND member: first record survives
    first_len = len(write_warc_gz(recs[:1]))
    parsed = list(parse_warc(gunzip_members(gz[:first_len + 10])))
    assert [u for u, *_ in parsed] == ["https://a.test/"]


def test_spark_source_reads_warc_gz(spark, tmp_path):
    from goskyr_spark.io.warc import write_warc_gz

    recs = [(f"https://h.test/p{i}", build_http_response(
        f"<html>{i}</html>".encode())) for i in range(5)]
    (tmp_path / "a.warc.gz").write_bytes(write_warc_gz(recs))
    rows = read_warc_pages(spark, str(tmp_path / "a.warc.gz")).collect()
    assert sorted(r["url"] for r in rows) == sorted(u for u, _ in recs)
    assert all(r["html"].startswith("<html>") for r in rows)


def test_crawl_engine_from_warc_source(spark, tmp_path):
    """Full circle: a .warc.gz archive is the crawl's page source —
    read_warc_pages feeds CrawlEngine exactly like a parquet pages
    table (the scripts/crawl_job.py --warc path)."""
    from datetime import datetime, timezone

    from goskyr_spark.io.warc import write_warc_gz
    from goskyr_spark.spark.crawl import CrawlEngine
    from goskyr_spark.synth import SynthSpec, event_scraper, host_name

    spec = SynthSpec(n_hosts=1, pages_per_host=2, items_per_page=2,
                     hot_hosts=0)
    recs = []
    for rid in range(spec.total_rows):
        r = spec.row(rid)
        recs.append((r["url"], build_http_response(r["html"])))
    (tmp_path / "web.warc.gz").write_bytes(write_warc_gz(recs))

    pages = read_warc_pages(spark, str(tmp_path / "web.warc.gz")) \
        .select("url", "html")
    eng = CrawlEngine(spark, str(tmp_path / "wd"), pages, event_scraper,
                      [f"https://{host_name(0)}/list/1"],
                      now=datetime(2026, 3, 1, tzinfo=timezone.utc),
                      fetch_partitions=2)
    eng.run(max_rounds=10)
    fetched = eng.t_fetched.read(spark).collect()
    assert sum(r["status"] == "ok" for r in fetched) >= 2   # both lists
    assert sum(r["n_items"] for r in fetched) == 4


def test_gzip_corrupt_middle_member_resync():
    """A corrupt member in the MIDDLE of a .warc.gz loses only itself:
    the decompressor scans forward to the next gzip magic and resumes,
    instead of silently dropping the whole rest of the archive."""
    from goskyr_spark.io.warc import gunzip_members, write_warc_gz

    recs = [("https://a.test/", build_http_response(b"AAA")),
            ("https://b.test/", build_http_response(b"BBB")),
            ("https://c.test/", build_http_response(b"CCC"))]
    g = [write_warc_gz(recs[i:i + 1]) for i in range(3)]
    corrupt = (g[1][:10] + bytes(b ^ 0xFF for b in g[1][10:20])
               + g[1][20:])
    parsed = list(parse_warc(gunzip_members(g[0] + corrupt + g[2])))
    assert [u for u, *_ in parsed] == ["https://a.test/",
                                       "https://c.test/"]


def test_streaming_parse_chunk_boundaries():
    """iter_warc_stream / iter_gunzip_stream are boundary-insensitive:
    pathological 7- and 5-byte chunks parse identically to one blob."""
    from goskyr_spark.io.warc import (iter_gunzip_stream,
                                      iter_warc_stream, write_warc_gz)

    recs = [("https://a.test/x", build_http_response(b"<html>A</html>")),
            ("https://b.test/y", build_http_response(b"B", status=404))]
    blob = write_warc(recs)
    out = list(iter_warc_stream(
        blob[i:i + 7] for i in range(0, len(blob), 7)))
    assert out == list(parse_warc(blob))
    gz = write_warc_gz(recs)
    out = list(iter_warc_stream(iter_gunzip_stream(
        gz[i:i + 5] for i in range(0, len(gz), 5))))
    assert out == list(parse_warc(blob))


def test_streaming_memory_bounded():
    """Peak parser memory is O(largest record), NOT O(archive): a
    64 MiB stream of 1 MiB records parses in < 16 MiB traced peak
    through both the plain and the gzip-member paths (the design point
    is a multi-GB Common Crawl file in a fixed-size task)."""
    import gzip
    import tracemalloc

    from goskyr_spark.io.warc import iter_gunzip_stream, iter_warc_stream

    n_rec, body = 64, 1 << 20

    def rec(i):
        return write_warc([(f"https://h.test/p{i}", build_http_response(
            bytes([i % 251]) * body))])

    tracemalloc.start()
    seen = sum(1 for _ in iter_warc_stream(
        rec(i) for i in range(n_rec)))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert seen == n_rec
    assert peak < 16 * 2 ** 20, f"plain peak {peak/2**20:.1f} MiB"

    tracemalloc.start()
    seen = sum(1 for _ in iter_warc_stream(iter_gunzip_stream(
        gzip.compress(rec(i), mtime=0) for i in range(n_rec))))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert seen == n_rec
    assert peak < 16 * 2 ** 20, f"gz peak {peak/2**20:.1f} MiB"


def test_spark_source_batches_and_corrupt_member(spark, tmp_path):
    """read_warc_pages streams: batch_rows smaller than the record
    count exercises the multi-batch yield path, and a corrupt middle
    gzip member drops only its own record."""
    from goskyr_spark.io.warc import write_warc_gz

    recs = [(f"https://h.test/p{i}", build_http_response(
        f"<html>{i}</html>".encode())) for i in range(9)]
    g = [write_warc_gz(recs[i:i + 1]) for i in range(9)]
    g[4] = g[4][:10] + bytes(b ^ 0xFF for b in g[4][10:20]) + g[4][20:]
    (tmp_path / "c.warc.gz").write_bytes(b"".join(g))
    rows = read_warc_pages(spark, str(tmp_path / "c.warc.gz"),
                           batch_rows=3).collect()
    assert sorted(r["url"] for r in rows) == sorted(
        u for i, (u, _) in enumerate(recs) if i != 4)
