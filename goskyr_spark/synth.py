"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

Schema per input_hint (BASELINE.json:15): url string, warc_ts timestamp,
html binary, text string, lang string. Everything is a pure function of
(seed, row id) — no wall clock, no process-seeded hashing — so the same
parameters produce byte-identical tables at any parallelism. Generation
itself is distributed (mapInArrow over spark.range): only the per-host
offset table lives on the driver, so the synthesizer's shape survives a
10^10-row scale-up.

The synthetic web models what the reference scrapes (event-list sites,
/root/reference/config-mock.yaml) plus what the crawl machinery needs:
per-host robots.txt, pagination chains (a page links its successor),
detail subpages, Zipf-skewed "large news domain" hot hosts for salting
tests, and the 11 reference HTML fixtures under https://fixtures.test/.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timedelta, timezone

import pyarrow as pa

LANGS = ["en", "de", "fr", "nl", "sk"]
GENRES = ["Metal", "Jazz", "Pop", "Klassik", "Rock", "Folk", "Electro"]
WORDS = ("signal harbor velvet orbit cinder maple quartz ember willow "
         "lantern copper meadow drift anchor tide").split()

WARC_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)
EVENT_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

PAGES_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
    pa.field("html", pa.binary()),
    pa.field("text", pa.string()),
    pa.field("lang", pa.string()),
])


def _h(*parts) -> int:
    """Stable 32-bit hash (crc32 — process-independent, unlike hash())."""
    return zlib.crc32("|".join(str(p) for p in parts).encode()) & 0xFFFFFFFF


def host_name(i: int) -> str:
    return f"host{i:04d}.test"


class SynthSpec:
    """Layout of the synthetic web; all derived quantities precomputed
    driver-side (O(n_hosts)) and broadcast via closure capture."""

    def __init__(self, n_hosts=10, pages_per_host=4, items_per_page=3,
                 hot_hosts=2, hot_factor=5, seed=42, crawl_delay_hosts=3,
                 include_details=True):
        self.n_hosts = n_hosts
        self.pages_per_host = pages_per_host
        self.items_per_page = items_per_page
        self.hot_hosts = hot_hosts
        self.hot_factor = hot_factor
        self.seed = seed
        self.crawl_delay_hosts = crawl_delay_hosts
        self.include_details = include_details
        self.list_pages = [
            pages_per_host * (hot_factor if i < hot_hosts else 1)
            for i in range(n_hosts)
        ]
        # per host: 1 robots + LP list pages (+ LP*I detail pages)
        per_detail = items_per_page if include_details else 0
        self.block = [1 + lp + lp * per_detail for lp in self.list_pages]
        self.offsets = [0]
        for b in self.block:
            self.offsets.append(self.offsets[-1] + b)
        self.total_rows = self.offsets[-1]

    # --- row id → page ------------------------------------------------------

    def locate(self, rid: int):
        """(host_idx, kind, page_no, item_no); kind ∈ robots|list|detail."""
        import bisect

        h = bisect.bisect_right(self.offsets, rid) - 1
        local = rid - self.offsets[h]
        lp = self.list_pages[h]
        if local == 0:
            return h, "robots", 0, 0
        local -= 1
        if local < lp:
            return h, "list", local + 1, 0
        local -= lp
        return h, "detail", local // self.items_per_page + 1, \
            local % self.items_per_page + 1

    def url_for(self, h, kind, p, i):
        host = host_name(h)
        if kind == "robots":
            return f"https://{host}/robots.txt"
        if kind == "list":
            return f"https://{host}/list/{p}"
        return f"https://{host}/event/{p}/{i}"

    # --- page content ---------------------------------------------------------

    def event_fields(self, h, p, i):
        hv = _h(self.seed, h, p, i)
        dt = EVENT_EPOCH + timedelta(days=hv % 365,
                                     hours=18 + hv % 4,
                                     minutes=(hv >> 4) % 2 * 30)
        title = (f"{WORDS[hv % len(WORDS)].title()} "
                 f"{WORDS[(hv >> 8) % len(WORDS)].title()} {h}-{p}-{i}")
        genre = GENRES[hv % len(GENRES)]
        when = f"{dt.day}.{dt.month}.{dt.year} {dt.hour:02d}:{dt.minute:02d}"
        return title, genre, when, dt

    def render(self, h, kind, p, i):
        """→ (html, text, lang)."""
        host = host_name(h)
        lang = LANGS[h % len(LANGS)]
        if kind == "robots":
            lines = ["User-agent: *"]
            if h % 7 == 5:
                lines.append("Disallow: /private/")
            if h % 11 == 6:
                lines.append("Disallow: /event/")
            if h < self.crawl_delay_hosts:
                lines.append(f"Crawl-delay: {1 + h}")
            body = "\n".join(lines) + "\n"
            return body, body, lang
        if kind == "list":
            items = []
            texts = []
            for it in range(1, self.items_per_page + 1):
                title, genre, when, _dt = self.event_fields(h, p, it)
                items.append(
                    f'<div class="event">\n'
                    f'  <div class="title">{title}</div>\n'
                    f'  <a class="more" href="/event/{p}/{it}">more</a>\n'
                    f'  <div class="when">{when}</div>\n'
                    f'  <div class="tag">{genre}</div>\n'
                    f"</div>")
                texts.append(f"{title} {when} {genre}")
            nxt = ""
            if p < self.list_pages[h]:
                nxt = f'<a class="next" href="/list/{p + 1}">next</a>'
            html = (f"<html><head><title>{host} events p{p}</title></head>"
                    f'<body>\n<div class="listing">\n' + "\n".join(items) +
                    f"\n</div>\n{nxt}\n</body></html>")
            return html, "\n".join(texts), lang
        # detail page
        title, genre, when, _dt = self.event_fields(h, p, i)
        hv = _h(self.seed, "desc", h, p, i)
        desc = " ".join(WORDS[(hv >> (k * 3)) % len(WORDS)] for k in range(8))
        html = (f"<html><body>\n"
                f'<h1 class="event-title">{title}</h1>\n'
                f'<div class="desc">{desc}</div>\n'
                f'<div class="venue">Venue {host} {p}</div>\n'
                f"</body></html>")
        return html, f"{title}\n{desc}", lang

    def row(self, rid: int):
        h, kind, p, i = self.locate(rid)
        html, text, lang = self.render(h, kind, p, i)
        return {
            "url": self.url_for(h, kind, p, i),
            "warc_ts": WARC_EPOCH + timedelta(seconds=rid),
            "html": html.encode("utf-8"),
            "text": text,
            "lang": lang,
        }


def synth_pages_df(spark, spec: SynthSpec = None, include_fixtures=True,
                   num_partitions=None):
    """Distributed deterministic pages table."""
    spec = spec or SynthSpec()
    n = spec.total_rows
    num_partitions = num_partitions or max(
        4, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for batch in batches:
            ids = batch.column(0).to_pylist()
            cols = {k: [] for k in PAGES_SCHEMA.names}
            for rid in ids:
                r = spec.row(rid)
                for k in cols:
                    cols[k].append(r[k])
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[f.name], type=f.type) for f in PAGES_SCHEMA],
                schema=PAGES_SCHEMA)

    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    sschema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])
    df = spark.range(0, n, 1, num_partitions).mapInArrow(gen, sschema)
    if include_fixtures:
        df = df.unionByName(fixture_pages_df(spark))
    return df


def fixture_pages_df(spark):
    """The 11 reference HTML fixtures + the mock page as pages rows."""
    from . import fixtures_html as fx

    rows = []
    for i in range(1, 12):
        html = getattr(fx, f"HTML{i}")
        rows.append((f"https://fixtures.test/html{i}",
                     WARC_EPOCH, html.encode(), html, "en"))
    rows.append(("https://mock.url", WARC_EPOCH,
                 fx.MOCK_PAGE.encode(), fx.MOCK_PAGE, "de"))
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    sschema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])
    return spark.createDataFrame(rows, sschema)


# The goskyr-dialect config for the synthetic event sites. One scraper per
# host is how the reference would model it; the engine templates the host.
EVENT_SCRAPER_YAML = """
scrapers:
  - name: events-{host}
    url: "https://{host}/list/1"
    item: div.event
    fields:
      - name: host
        value: "{host}"
      - name: title
        location:
          selector: .title
      - name: url
        type: url
        location:
          selector: a.more
      - name: genre
        location:
          selector: .tag
      - name: date
        type: date
        components:
          - covers: {{day: true, month: true, year: true, time: true}}
            location: {{selector: .when}}
            layout: ["2.1.2006 15:04"]
    paginator:
      location: {{selector: a.next}}
"""

EVENT_SCRAPER_SUBPAGE_YAML = EVENT_SCRAPER_YAML.replace(
    "    paginator:",
    """      - name: desc
        on_subpage: url
        location:
          selector: .desc
    paginator:""")


def event_scraper(host, subpage=False):
    from .config import loads_config

    yaml_text = (EVENT_SCRAPER_SUBPAGE_YAML if subpage
                 else EVENT_SCRAPER_YAML).format(host=host)
    return loads_config(yaml_text).scrapers[0]


NO_MATCH_SCRAPER_YAML = """
scrapers:
  - name: junk
    url: https://{host}
    item: div.does-not-exist
    fields:
      - name: title
        location:
          selector: h2
    paginator:
      location: {{selector: a.next}}
"""


def no_match_scraper(host):
    """A scraper whose item selector matches nothing — fetches succeed
    and pagination still chains, but zero items come out (exercises
    adaptive-priority scheduling)."""
    from .config import loads_config

    return loads_config(NO_MATCH_SCRAPER_YAML.format(host=host)).scrapers[0]


def mixed_yield_factory(host, junk_hosts=frozenset()):
    """event_scraper everywhere except junk_hosts (zero-yield). Use via
    functools.partial so executors unpickle it by module reference."""
    return (no_match_scraper(host) if host in junk_hosts
            else event_scraper(host))


def charrich_docs_df(spark, n_docs=20_000, words_per_doc=60,
                     pool=120_000):
    """Deterministic char-diverse corpus for PRODUCTION-vocab BPE
    demonstrations (round-6): the sf documents tables have a ~40-word
    vocabulary, so their BPE training saturates near 126 merges; a
    32k+ merge table needs a corpus whose pretoken vocabulary is
    itself ~100k+. Word j of doc d is the 5-9-char hex prefix of
    md5(word_id), word_id = crc32(d_j) mod pool — fully deterministic
    and generated as pure column expressions over spark.range (map-only,
    no shuffle, no driver-side corpus); ~119k distinct words at the
    default pool."""
    from pyspark.sql import functions as F

    d = F.col("id")

    def word(j):
        wid = F.pmod(
            F.crc32(F.concat(d.cast("string"), F.lit("_"),
                             j.cast("string")).cast("binary")),
            F.lit(pool))
        h = F.md5(wid.cast("string").cast("binary"))
        return h.substr(F.lit(1),
                        (F.lit(5) + F.pmod(wid, F.lit(5))).cast("int"))

    text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(0), F.lit(words_per_doc - 1)), word))
    return spark.range(n_docs).select(d.alias("doc_id"),
                                      text.alias("text"))
