"""A small CSS selector engine over :mod:`goskyr_spark.kernels.dom`.

Covers the selector subset the reference configs and tests use
(goquery/cascadia semantics; e.g. ``div > h3.size-xxl``,
``script[type="application/ld+json"]``, ``h2 > a > span``,
``.artist-name``), plus :nth-child and attribute operators so generated
configs (reference ``internal/generate``) remain expressible.

Matching is *absolute* (ancestors above the search root still satisfy
left-hand compounds), and ``find(roots, sel)`` returns strict descendants
of the roots in document order, de-duplicated — exactly goquery's
``Selection.Find`` contract used at scraper.go:918 and :358.
"""

from __future__ import annotations

import re
from functools import lru_cache

from .dom import ELEMENT

_TOKEN = re.compile(
    r"""
    \s*(?P<comb>[>+~,])\s*            # combinator or group comma
  | (?P<ws>\s+)                       # descendant combinator
  | (?P<tag>[A-Za-z][-\w]*|\*)        # type selector
  | \#(?P<id>[-\w]+)                  # id
  | \.(?P<cls>[-\w]+)                 # class
  | \[\s*(?P<aname>[-\w]+)\s*
      (?:(?P<aop>[~^$*|]?=)\s*
         (?P<aval>"[^"]*"|'[^']*'|[^\]\s]+)\s*)?\]   # attribute
  | :(?P<pseudo>[-\w]+)(?:\((?P<parg>[^)]*)\))?      # pseudo-class
    """,
    re.X,
)


class SelectorError(ValueError):
    pass


class Compound:
    __slots__ = ("tag", "ids", "classes", "attrs", "pseudos")

    def __init__(self):
        self.tag = None
        self.ids = []
        self.classes = []
        self.attrs = []  # (name, op, value) — op None means presence test
        self.pseudos = []  # (name, arg)

    def empty(self):
        return (self.tag is None and not self.ids and not self.classes
                and not self.attrs and not self.pseudos)

    def matches(self, el):
        if el.type != ELEMENT:
            return False
        if self.tag is not None and self.tag != "*" and el.tag != self.tag:
            return False
        if self.ids:
            eid = el.attrs.get("id")
            for i in self.ids:
                if eid != i:
                    return False
        if self.classes:
            cset = el.class_set()
            for c in self.classes:
                if c not in cset:
                    return False
        for name, op, val in self.attrs:
            actual = el.attrs.get(name)
            if actual is None:
                return False
            if op is None:
                continue
            if op == "=":
                if actual != val:
                    return False
            elif op == "~=":
                if val not in actual.split():
                    return False
            elif op == "^=":
                if not (val and actual.startswith(val)):
                    return False
            elif op == "$=":
                if not (val and actual.endswith(val)):
                    return False
            elif op == "*=":
                if val not in actual:
                    return False
            elif op == "|=":
                if actual != val and not actual.startswith(val + "-"):
                    return False
        for name, arg in self.pseudos:
            if not _pseudo_matches(el, name, arg):
                return False
        return True


def _element_index(el):
    """1-based index among element siblings."""
    if el.parent is None:
        return 1
    i = 0
    for sib in el.parent.children:
        if sib.type == ELEMENT:
            i += 1
            if sib is el:
                return i
    return 1


_NTH = re.compile(r"^\s*(?:(even)|(odd)|(?:([+-]?\d*)n\s*([+-]\s*\d+)?)|([+-]?\d+))\s*$")


def _parse_nth(arg):
    m = _NTH.match(arg or "")
    if not m:
        raise SelectorError(f"bad :nth-child argument: {arg!r}")
    if m.group(1):
        return 2, 0
    if m.group(2):
        return 2, 1
    if m.group(5) is not None:
        return 0, int(m.group(5))
    a_s = m.group(3)
    a = 1 if a_s in ("", "+") else -1 if a_s == "-" else int(a_s)
    b = int(m.group(4).replace(" ", "")) if m.group(4) else 0
    return a, b


def _nth_matches(idx, a, b):
    if a == 0:
        return idx == b
    k = idx - b
    return k % a == 0 and k // a >= 0


def _pseudo_matches(el, name, arg):
    if name == "nth-child":
        a, b = _parse_nth(arg)
        return _nth_matches(_element_index(el), a, b)
    if name == "first-child":
        return _element_index(el) == 1
    if name == "last-child":
        if el.parent is None:
            return True
        elems = el.parent.element_children()
        return bool(elems) and elems[-1] is el
    if name == "nth-of-type":
        a, b = _parse_nth(arg)
        if el.parent is None:
            return _nth_matches(1, a, b)
        idx = 0
        for sib in el.parent.children:
            if sib.type == ELEMENT and sib.tag == el.tag:
                idx += 1
                if sib is el:
                    break
        return _nth_matches(idx, a, b)
    if name == "not":
        sub = _compile(arg)
        return not any(_complex_matches(el, cx) for cx in sub)
    if name == "empty":
        return not el.children
    raise SelectorError(f"unsupported pseudo-class :{name}")


def _parse_selector(src):
    """Parse into a list of complex selectors; each is a list of
    (combinator, Compound) with combinator in {None, ' ', '>', '+', '~'}
    (None marks the leftmost compound)."""
    groups = []
    cur = [(None, Compound())]
    pending_comb = None
    pos = 0
    had_any = False
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            raise SelectorError(f"cannot parse selector {src!r} at {pos}")
        pos = m.end()
        if m.group("comb"):
            c = m.group("comb")
            if c == ",":
                if not had_any:
                    raise SelectorError(f"empty selector in group: {src!r}")
                groups.append(cur)
                cur = [(None, Compound())]
                pending_comb = None
                had_any = False
            else:
                pending_comb = c
            continue
        if m.group("ws") is not None:
            if had_any and not cur[-1][1].empty():
                pending_comb = pending_comb or " "
            continue
        # a simple-selector token: start a new compound if needed
        if pending_comb is not None:
            cur.append((pending_comb, Compound()))
            pending_comb = None
        comp = cur[-1][1]
        had_any = True
        if m.group("tag"):
            comp.tag = m.group("tag").lower()
        elif m.group("id"):
            comp.ids.append(m.group("id"))
        elif m.group("cls"):
            comp.classes.append(m.group("cls"))
        elif m.group("aname"):
            val = m.group("aval")
            if val is not None and val[:1] in "\"'":
                val = val[1:-1]
            comp.attrs.append((m.group("aname").lower(), m.group("aop"), val))
        elif m.group("pseudo"):
            comp.pseudos.append((m.group("pseudo").lower(), m.group("parg")))
    if not had_any:
        raise SelectorError(f"empty selector: {src!r}")
    groups.append(cur)
    return groups


@lru_cache(maxsize=4096)
def _compile(src):
    return _parse_selector(src)


@lru_cache(maxsize=4096)
def _fast_compound(src):
    """For the overwhelmingly common 'tag.class' / '.class' / 'tag'
    selectors, return (tag|None, classes frozenset) for an inlined match
    loop; None when the selector needs the general engine."""
    groups = _compile(src)
    if len(groups) != 1 or len(groups[0]) != 1:
        return None
    comp = groups[0][0][1]
    if comp.ids or comp.attrs or comp.pseudos:
        return None
    return (None if comp.tag in (None, "*") else comp.tag,
            frozenset(comp.classes))


def _complex_matches(el, cx):
    """Match one complex selector (right-to-left walk up the tree)."""
    comb, comp = cx[-1]
    if not comp.matches(el):
        return False
    return _match_left(el, cx, len(cx) - 1)


def _match_left(el, cx, i):
    if i == 0:
        return True
    comb = cx[i][0]
    target_i = i - 1
    comp = cx[target_i][1]
    if comb == ">":
        p = el.parent
        return p is not None and comp.matches(p) and _match_left(p, cx, target_i)
    if comb == " ":
        p = el.parent
        while p is not None:
            if comp.matches(p) and _match_left(p, cx, target_i):
                return True
            p = p.parent
        return False
    if comb == "+":
        sib = _prev_element(el)
        return sib is not None and comp.matches(sib) and _match_left(sib, cx, target_i)
    if comb == "~":
        sib = _prev_element(el)
        while sib is not None:
            if comp.matches(sib) and _match_left(sib, cx, target_i):
                return True
            sib = _prev_element(sib)
        return False
    raise SelectorError(f"bad combinator {comb!r}")


def _prev_element(el):
    if el.parent is None:
        return None
    prev = None
    for sib in el.parent.children:
        if sib is el:
            return prev
        if sib.type == ELEMENT:
            prev = sib
    return None


def matches(el, selector):
    """Does a single element match the selector (any group member)?"""
    return any(_complex_matches(el, cx) for cx in _compile(selector))


def find(roots, selector):
    """All strict-descendant elements of ``roots`` matching ``selector``,
    in document order, de-duplicated (goquery Selection.Find)."""
    if not isinstance(roots, (list, tuple)):
        roots = [roots]
    fast = _fast_compound(selector)
    out = []
    seen = None if len(roots) == 1 else set()
    if fast is not None:
        tag, classes = fast
        # single-class selectors (the overwhelming case) use a plain
        # `in` membership test; the per-root walk is the cached flat
        # descendant list (dom.Node.desc_elements), so resolving several
        # selectors under the same node walks the subtree once
        cls1 = next(iter(classes)) if len(classes) == 1 else None
        for root in roots:
            for n in root.desc_elements():
                if tag is not None and n.tag != tag:
                    continue
                if cls1 is not None:
                    if cls1 not in n.class_set():
                        continue
                elif classes and not classes <= n.class_set():
                    continue
                if seen is not None:
                    if id(n) in seen:
                        continue
                    seen.add(id(n))
                out.append(n)
        return out
    groups = _compile(selector)
    for root in roots:
        for el in root.desc_elements():
            if any(_complex_matches(el, cx) for cx in groups):
                if seen is not None:
                    if id(el) in seen:
                        continue
                    seen.add(id(el))
                out.append(el)
    return out
