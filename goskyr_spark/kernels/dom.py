"""Minimal HTML5-ish DOM on top of the stdlib ``html.parser``.

This container ships no HTML libraries (no lxml / bs4 / selectolax), so we
build our own tree. The node model intentionally mirrors what the
reference relies on from golang.org/x/net/html via goquery
(/root/reference/internal/scraper/scraper.go:912-1015):

- COMMENT nodes are kept as real children (the ``child_index`` walk at
  scraper.go:963-975 counts *all* node types including comments),
- text nodes keep their whitespace verbatim (``entire_subtree`` at
  scraper.go:922-946 concatenates raw text data),
- mismatched end tags implicitly close open elements (fixture html8 in
  scraper_test.go:106-120 has unclosed <span> closed by </h3>),
- character references are unescaped in text and attribute values,
  except inside <script>/<style> (raw text elements).

It is not a full HTML5 tree-construction algorithm; it covers the
behaviors the extraction semantics depend on plus a small implied-close
table (<p>, <li>, table sections) for robustness on real-world pages.
"""

from __future__ import annotations

from html.parser import HTMLParser

ELEMENT = 1
TEXT = 3
COMMENT = 8
DOCUMENT = 9

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# start of tag T implicitly closes an open P when (P, T) applies
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption figure "
    "footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p pre section "
    "table ul".split()
)
_LI_LIKE = {"li": frozenset(["li"]),
            "dt": frozenset(["dt", "dd"]),
            "dd": frozenset(["dt", "dd"]),
            "tr": frozenset(["tr", "td", "th"]),
            "td": frozenset(["td", "th"]),
            "th": frozenset(["td", "th"]),
            "option": frozenset(["option"]),
            "thead": frozenset(["tbody", "tfoot", "thead", "tr", "td", "th"]),
            "tbody": frozenset(["tbody", "tfoot", "thead", "tr", "td", "th"]),
            "tfoot": frozenset(["tbody", "tfoot", "thead", "tr", "td", "th"])}


class Node:
    """One DOM node. ``type`` is ELEMENT/TEXT/COMMENT/DOCUMENT."""

    __slots__ = ("type", "tag", "attrs", "data", "children", "parent",
                 "_cset", "_desc")

    def __init__(self, type_, tag="", attrs=None, data=""):
        self.type = type_
        self.tag = tag
        self.attrs = attrs if attrs is not None else {}
        self.data = data
        self.children = []
        self.parent = None
        self._cset = None
        self._desc = None

    def class_set(self):
        """Cached frozenset of the class attribute (hot path for CSS)."""
        s = self._cset
        if s is None:
            cls = self.attrs.get("class")
            s = frozenset(cls.split()) if cls else frozenset()
            self._cset = s
        return s

    def append(self, child):
        child.parent = self
        self.children.append(child)

    # --- traversal helpers -------------------------------------------------

    def iter_descendants(self):
        """All descendants (not self) in document order."""
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            yield n
            if n.children:
                stack.extend(reversed(n.children))

    def iter_elements(self):
        for n in self.iter_descendants():
            if n.type == ELEMENT:
                yield n

    def desc_elements(self):
        """Cached list of descendant ELEMENT nodes in document order.
        The tree is immutable once parsed (builders only append during
        construction), so selector engines can re-filter this flat list
        instead of re-walking the subtree per selector — scrape_page
        resolves ~4 selectors per item node, so the walk cost amortizes
        4x on the extraction hot path."""
        d = self._desc
        if d is None:
            d = []
            stack = list(reversed(self.children))
            while stack:
                n = stack.pop()
                if n.children:
                    stack.extend(reversed(n.children))
                if n.type == ELEMENT:
                    d.append(n)
            self._desc = d
        return d

    def element_children(self):
        return [c for c in self.children if c.type == ELEMENT]

    def entire_text(self):
        """Concatenate ALL descendant text data verbatim (jQuery .text()
        semantics; whitespace/newlines preserved) — parity with the
        reference's entire_subtree walk (scraper.go:924-936)."""
        parts = []
        stack = list(reversed(self.children))
        if self.type == TEXT:
            parts.append(self.data)
        while stack:
            n = stack.pop()
            if n.type == TEXT:
                parts.append(n.data)
            if n.children:
                stack.extend(reversed(n.children))
        return "".join(parts)

    def attr(self, name, default=""):
        return self.attrs.get(name, default)

    def __repr__(self):  # pragma: no cover - debug aid
        if self.type == ELEMENT:
            return f"<{self.tag} {self.attrs}>"
        if self.type == TEXT:
            return f"#text{self.data!r}"
        if self.type == COMMENT:
            return f"<!--{self.data}-->"
        return "#document"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node(DOCUMENT)
        self.stack = [self.root]

    # -- helpers --
    def _top(self):
        return self.stack[-1]

    def _implied_close(self, tag):
        # close <p> when a block-level start tag arrives
        while len(self.stack) > 1:
            cur = self._top().tag
            if cur == "p" and tag in _P_CLOSERS:
                self.stack.pop()
                continue
            closers = _LI_LIKE.get(tag)
            if closers and cur in closers and cur != "table":
                # td/th do not close a tr; tr does not close tbody
                if tag in ("td", "th") and cur == "tr":
                    break
                if tag == "tr" and cur in ("tbody", "thead", "tfoot"):
                    break
                self.stack.pop()
                continue
            break

    def handle_starttag(self, tag, attrs):
        self._implied_close(tag)
        # x/net/html-style tbody synthesis: <tr> directly under <table>
        if tag == "tr" and self._top().tag == "table":
            tbody = Node(ELEMENT, "tbody")
            self._top().append(tbody)
            self.stack.append(tbody)
        d = {}
        for k, v in attrs:
            if k not in d:  # first occurrence wins (HTML5)
                d[k] = v if v is not None else ""
        el = Node(ELEMENT, tag, d)
        self._top().append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        # HTML5 / x/net/html tree construction IGNORES the self-closing
        # slash on non-void elements: <div class="x"/> stays OPEN and the
        # following content becomes its children (goquery sees the same
        # tree). Only void elements produce a childless leaf.
        if tag not in VOID_ELEMENTS:
            self.handle_starttag(tag, attrs)
            return
        d = {}
        for k, v in attrs:
            if k not in d:
                d[k] = v if v is not None else ""
        self._top().append(Node(ELEMENT, tag, d))

    def handle_endtag(self, tag):
        # find nearest matching open element; pop through it, else ignore
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._top().append(Node(TEXT, data=data))

    def handle_comment(self, data):
        self._top().append(Node(COMMENT, data=data))

    def handle_decl(self, decl):
        pass  # doctype: not material to extraction

    def unknown_decl(self, data):
        pass


def parse_html(html):
    """Parse an HTML string (or UTF-8 bytes) into a DOCUMENT Node.

    Uses a regex tokenizer (~4x the stdlib html.parser throughput — the
    parse is the kernel's hot loop); the stdlib-backed builder remains as
    the fallback for anything the tokenizer rejects, and both produce
    identical trees on the parity fixtures (tested)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    try:
        return _fast_parse(html)
    except Exception:
        return _stdlib_parse(html)


def _stdlib_parse(html):
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


import re as _re
from html import unescape as _unescape

_TOK = _re.compile(
    r"<!--(.*?)(?:-->|$)"                                   # 1 comment
    r"|<!([^>]*)>"                                          # 2 decl/doctype
    r"|</([a-zA-Z][-\w:.]*)[^>]*>"                          # 3 end tag
    # disjoint alternatives ([^>"'] excludes the quote chars) — the
    # overlapping version backtracks exponentially on unterminated tags
    r"|<([a-zA-Z][-\w:.]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>",  # 4 tag 5 attrs
    _re.S)

_ATTR = _re.compile(
    r"([^\s=/>]+)(?:\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?")

_RAWTEXT_END = {
    "script": _re.compile(r"</script", _re.I),
    "style": _re.compile(r"</style", _re.I),
}


class _FastBuilder(_TreeBuilder):
    """Reuses the tree-construction rules (implied closes, tbody synth,
    void elements) of _TreeBuilder with a regex tokenizer front end."""

    def parse(self, html):
        pos = 0
        n = len(html)
        while pos < n:
            m = _TOK.search(html, pos)
            if m is None:
                self._text(html[pos:])
                break
            if m.start() > pos:
                self._text(html[pos:m.start()])
            pos = m.end()
            if m.group(1) is not None:
                self.handle_comment(m.group(1))
            elif m.group(2) is not None:
                pass  # doctype / CDATA-ish decl: ignored like the stdlib path
            elif m.group(3) is not None:
                self.handle_endtag(m.group(3).lower())
            else:
                tag = m.group(4).lower()
                raw_attrs = m.group(5)
                attrs = []
                last_end = 0
                if raw_attrs and raw_attrs.strip("/ \t\r\n"):
                    for am in _ATTR.finditer(raw_attrs):
                        last_end = am.end()
                        name = am.group(1).lower()
                        if am.group(2) is None:
                            attrs.append((name, ""))
                        else:
                            v = am.group(3)
                            if v is None:
                                v = am.group(4)
                            if v is None:
                                v = am.group(5) or ""
                            attrs.append((name, _unescape(v)
                                          if "&" in v else v))
                # self-closing only when a bare '/' trails AFTER the last
                # attribute — a '/' inside an unquoted value (href=foo/)
                # is part of the value per HTML5
                self_close = bool(raw_attrs) and \
                    raw_attrs[last_end:].strip() == "/"
                if self_close:
                    self.handle_startendtag(tag, attrs)
                else:
                    self.handle_starttag(tag, attrs)
                    if tag in _RAWTEXT_END:
                        em = _RAWTEXT_END[tag].search(html, pos)
                        end = em.start() if em else n
                        if end > pos:
                            # raw text: entities NOT unescaped (HTML5)
                            self._top().append(Node(TEXT,
                                                    data=html[pos:end]))
                        if em:
                            close = html.find(">", em.start())
                            pos = (close + 1) if close != -1 else n
                            self.handle_endtag(tag)
                        else:
                            pos = n
        return self.root

    def _text(self, data):
        if data:
            self._top().append(Node(
                TEXT, data=_unescape(data) if "&" in data else data))


def _fast_parse(html):
    return _FastBuilder().parse(html)
