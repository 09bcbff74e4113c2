"""Fetcher strategies — parity with /root/reference/internal/fetch/.

The crawl engine's contract is "urls in → (url, html) out"; in the
distributed plan that is a join against a pages table (mock mode, the
test/bench path). These classes provide the same strategy surface as the
reference factory (fetcher.go:17-78) for live use:

- StaticFetcher: HTTP GET with the default goskyr User-Agent and
  ``Accept: */*``; non-200 → error (staticfetcher.go:24-54).
- DynamicFetcher: headless-browser fetcher — NOT implementable in this
  container (no Chrome); the class preserves the interface and raises.
- MockFetcher: url→content map from config mock_pages
  (mockfetcher.go:15-35).

``fetch_partition`` is the executor-side hook: given an iterator of
(url, host, delay) within ONE host-partition, it enforces the per-host
crawl-delay with real sleeps (live mode) — the virtual-clock politeness
used by the mock path becomes wall-clock here.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field as dc_field

logger = logging.getLogger("goskyr_spark.fetchers")

DEFAULT_USER_AGENT = "goskyr web scraper (github.com/jakopako/goskyr)"
DEFAULT_PAGE_LOAD_WAIT_MS = 2000   # dynamicfetcher.go:44-46
DEFAULT_INTERACTION_DELAY_MS = 500  # dynamicfetcher.go:91-93


class FetchError(Exception):
    """Fetch failure. ``status`` carries the HTTP status code when the
    failure was a non-200 response (None for network-level errors) so
    callers can apply status-dependent policy — e.g. RFC 9309 robots
    handling: 4xx robots.txt ⇒ allow-all, 5xx ⇒ disallow."""

    def __init__(self, message, status=None):
        super().__init__(message)
        self.status = status


@dataclass
class FetchOpts:
    """Per-fetch options — parity with fetch.FetchOpts (fetcher.go:43):
    the interaction list the dynamic fetcher replays after navigation."""
    interaction: list = dc_field(default_factory=list)


def write_html_debug(url: str, html: str, debug_dir: str) -> str:
    """S8 debug dump — writeHTMLToFile parity (fetcher.go:80-111): mkdir
    -p the debug dir and write the fetched html as <host>-<suffix>.html.
    The reference suffixes a RANDOM string; this uses the first 8 hex of
    md5(url) so reruns are deterministic (test- and diff-friendly) —
    content bytes are identical either way."""
    import hashlib
    import os
    from urllib.parse import urlsplit

    if debug_dir:
        os.makedirs(debug_dir, exist_ok=True)
    host = urlsplit(url).hostname or "page"
    name = f"{host}-{hashlib.md5(url.encode()).hexdigest()[:8]}.html"
    path = os.path.join(debug_dir, name)
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
    return path


class StaticFetcher:
    """HTTP fetch with connection KEEP-ALIVE: one ``requests.Session``
    per fetcher instance. The fetcher lives for the whole host-aligned
    partition (fetch_partition), so consecutive requests to the same
    host reuse the TCP (+TLS) connection instead of paying a handshake
    per URL — on hosts with small/zero crawl-delay the handshake, not
    politeness, is otherwise the throughput floor. Headers and non-200
    behavior are unchanged (staticfetcher.go:24-54)."""

    def __init__(self, user_agent: str = "", timeout: float = 30.0,
                 debug_dir: str = ""):
        self.user_agent = user_agent or DEFAULT_USER_AGENT
        self.timeout = timeout
        self.debug_dir = debug_dir
        self._session = None

    def _get_session(self):
        if self._session is None:
            import requests

            self._session = requests.Session()
        return self._session

    def fetch(self, url: str, opts: FetchOpts = None) -> str:
        resp = self._get_session().get(
            url,
            headers={"User-Agent": self.user_agent, "Accept": "*/*"},
            timeout=self.timeout)
        if resp.status_code != 200:
            # reference: fmt.Errorf("status code error: %d %s", ...)
            raise FetchError(
                f"status code error: {resp.status_code} {resp.reason}",
                status=resp.status_code)
        if self.debug_dir:  # staticfetcher.go:49-51
            write_html_debug(url, resp.text, self.debug_dir)
        return resp.text


class DynamicFetcher:
    """Browser-rendered fetch (reference: chromedp,
    dynamicfetcher.go:29-177). ``build_actions`` compiles a FetchOpts
    into the same deterministic action plan the reference appends
    (navigate, page-load sleep, then per interaction: click xN with
    delay / scroll+delay; unknown types warned and skipped).
    ``fetch`` executes the plan with Playwright chromium when the
    ``playwright`` package is importable (optional backend — absent in
    this container, so it raises NotImplementedError here);
    ``execute_actions`` is the backend-agnostic interpreter, driven
    directly by tests with a fake page object."""

    def __init__(self, user_agent: str = "", page_load_wait_ms: int = 0):
        self.user_agent = user_agent or DEFAULT_USER_AGENT
        self.page_load_wait_ms = page_load_wait_ms or \
            DEFAULT_PAGE_LOAD_WAIT_MS

    def build_actions(self, url: str, opts: FetchOpts = None):
        """[(action, params...)] — the chromedp action list analog."""
        actions = [("navigate", url),
                   ("sleep_ms", self.page_load_wait_ms)]
        for ia in (opts.interaction if opts else []):
            delay = ia.delay if ia.delay > 0 else DEFAULT_INTERACTION_DELAY_MS
            if ia.type == "click":
                count = ia.count if ia.count > 0 else 1
                for _ in range(count):
                    # click only if the node exists (dynamicfetcher.go:103-110)
                    actions.append(("click_if_present", ia.selector))
                    actions.append(("sleep_ms", delay))
            elif ia.type == "scroll":
                actions.append(("scroll_bottom",))
                actions.append(("sleep_ms", delay))
            else:
                logger.warning("unknown interaction type %s", ia.type)
        actions.append(("outer_html",))
        return actions

    @staticmethod
    def execute_actions(page, actions) -> str:
        """Run a compiled action plan against a Playwright-shaped page
        object (goto / wait_for_timeout / query_selector+click /
        evaluate / content). Split out so the plan interpreter is
        testable without a browser."""
        html = ""
        for act in actions:
            if act[0] == "navigate":
                page.goto(act[1])
            elif act[0] == "sleep_ms":
                page.wait_for_timeout(act[1])
            elif act[0] == "click_if_present":
                # click only if the node exists (dynamicfetcher.go:103-110)
                el = page.query_selector(act[1])
                if el is not None:
                    el.click()
            elif act[0] == "scroll_bottom":
                page.evaluate(
                    "window.scrollTo(0, document.body.scrollHeight)")
            elif act[0] == "outer_html":
                html = page.content()
        return html

    def fetch(self, url: str, opts: FetchOpts = None) -> str:
        actions = self.build_actions(url, opts)  # validate the plan
        try:
            from playwright.sync_api import sync_playwright
        except ImportError:
            raise NotImplementedError(
                "dynamic (browser) fetching requires a headless browser "
                "(pip install playwright); not available in this "
                "environment")
        with sync_playwright() as p:
            browser = p.chromium.launch(headless=True)
            try:
                page = browser.new_page(user_agent=self.user_agent)
                return self.execute_actions(page, actions)
            finally:
                browser.close()


class MockFetcher:
    def __init__(self, mock_pages, debug_dir: str = ""):
        # list of {'url':..., 'content':...} like config mock_pages
        self.pages = {p["url"]: p["content"] for p in mock_pages}
        self.debug_dir = debug_dir

    def fetch(self, url: str, opts: FetchOpts = None) -> str:
        if url not in self.pages:
            raise FetchError(f"page {url} not found in mock pages")
        if self.debug_dir:  # -d parity: dump fetched HTML like static
            write_html_debug(url, self.pages[url], self.debug_dir)
        return self.pages[url]


def new_fetcher(fetcher_config):
    """Factory with the reference's defaults (fetcher.go:17-78)."""
    ftype = fetcher_config.type or "static"
    if ftype == "static":
        return StaticFetcher(fetcher_config.user_agent,
                             debug_dir=fetcher_config.debug_dir)
    if ftype == "dynamic":
        return DynamicFetcher(fetcher_config.user_agent)
    if ftype == "mock":
        return MockFetcher(fetcher_config.mock_pages,
                           debug_dir=fetcher_config.debug_dir)
    raise ValueError(f"fetcher type '{ftype}' does not exist")


def fetch_partition(rows, fetcher, default_delay: float = 0.0):
    """Live-mode partition fetch loop: rows of (url, host, crawl_delay);
    sleeps enforce politeness because host-hash partitioning guarantees
    a host lives in exactly one partition. Yields (url, html|None, error)."""
    last_at = {}
    for url, host, delay in rows:
        d = delay if delay is not None else default_delay
        now = time.monotonic()
        wait = last_at.get(host, -1e18) + d - now
        if wait > 0:
            time.sleep(wait)
        last_at[host] = time.monotonic()
        try:
            yield url, fetcher.fetch(url), None
        except Exception as e:  # per-scraper isolation (main.go:198-202)
            yield url, None, str(e)
