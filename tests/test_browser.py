"""REAL browser execution of the dynamic fetcher (S3) — the one test
leg that needs Playwright + chromium, absent in the build container.

Run wherever a browser exists with ONE command:

    make test-browser        # == pytest tests/test_browser.py -v

(after `pip install playwright && playwright install chromium`).
Everything around the browser hop — Interaction parsing, the chromedp
action-plan compiler, the backend-agnostic interpreter — is covered
browser-free in tests/test_round3_fixes.py.
"""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

pytest.importorskip("playwright.sync_api")

# a page whose item list only exists after a click — static fetch can
# never see it, so extraction success proves real browser execution
PAGE = b"""<!doctype html><html><body>
<button id="more" onclick="document.getElementById('out').innerHTML=
  '<div class=e><span class=t>dynamic item</span></div>'">more</button>
<div id="out"></div>
</body></html>"""


@pytest.fixture()
def server():
    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(PAGE)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/"
    srv.shutdown()


def test_dynamic_fetch_renders_click(server):
    from goskyr_spark.config import Interaction
    from goskyr_spark.spark.fetchers import DynamicFetcher, FetchOpts

    f = DynamicFetcher(page_load_wait_ms=100)
    opts = FetchOpts(interaction=[
        Interaction(type="click", selector="#more", count=1, delay=100)])
    html = f.fetch(server, opts)
    assert "dynamic item" in html

    # and the full scrape path over the rendered DOM
    from goskyr_spark.config import loads_config
    from goskyr_spark.kernels.scrape import scrape_page

    scraper = loads_config("""
scrapers:
  - name: dyn
    url: "%s"
    item: div.e
    fields:
      - name: t
        location: {selector: span.t}
""" % server).scrapers[0]
    pr = scrape_page(scraper, html, server)
    assert [i["t"] for i in pr.items] == ["dynamic item"]


def test_dynamic_fetch_missing_selector_is_skipped(server):
    from goskyr_spark.config import Interaction
    from goskyr_spark.spark.fetchers import DynamicFetcher, FetchOpts

    f = DynamicFetcher(page_load_wait_ms=100)
    opts = FetchOpts(interaction=[
        Interaction(type="click", selector="#absent", count=2, delay=50)])
    html = f.fetch(server, opts)  # must not raise (click-if-present)
    assert "dynamic item" not in html
