"""Fast-tokenizer vs stdlib-builder tree equivalence — the fast path is
the kernel hot loop; any divergence is a parity bug."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import pytest

from goskyr_spark.kernels import dom
from goskyr_spark.synth import SynthSpec

from fixtures_html import (
    HTML1, HTML2, HTML3, HTML4, HTML5, HTML6, HTML7, HTML8, HTML9, HTML10,
    HTML11, MOCK_PAGE,
)

EDGES = [
    "<a href=foo/>x</a>",              # '/' in unquoted value ≠ self-close
    "<br/>",
    '<img src="a.png"/>after',
    "<div data-x=a/b>t</div>",
    '<a title="5 > 3 & 2 < 4">q</a>',  # '>' inside quoted attr
    "<p>one<p>two",                    # implied close
    "<input disabled>",
    "<script>if (a<b && c>d) { x('</div>'); }</script><p>after</p>",
    "<table><tr><td>x</td></tr></table>",  # tbody synthesis
    "<div class='sq'>&amp; &#8211; &uuml;</div>",
    "<!-- c1 --><div><!--[--><span>s</span><!--]--></div>",
    "",
    "plain text only",
]

# malformed-EOF / stray-'<' inputs: the two builders split text nodes
# differently (the fast tokenizer coalesces like x/net/html; the stdlib
# builder emits a lone '<' node) — observable TEXT must still agree
TEXT_ONLY_EDGES = [
    "<div unterminated",
    "<p>5 < 6 and 7 > 2</p>",
]


def sig(n):
    if n.type == dom.TEXT:
        return ("T", n.data)
    if n.type == dom.COMMENT:
        return ("C", n.data)
    return (n.tag, tuple(sorted(n.attrs.items())),
            tuple(sig(c) for c in n.children))


FIXTURES = [HTML1, HTML2, HTML3, HTML4, HTML5, HTML6, HTML7, HTML8, HTML9,
            HTML10, HTML11, MOCK_PAGE]


@pytest.mark.parametrize("i", range(len(FIXTURES)))
def test_fixture_trees_equal(i):
    h = FIXTURES[i]
    assert sig(dom._fast_parse(h)) == sig(dom._stdlib_parse(h))


@pytest.mark.parametrize("h", EDGES, ids=[e[:28] or "empty" for e in EDGES])
def test_edge_trees_equal(h):
    assert sig(dom._fast_parse(h)) == sig(dom._stdlib_parse(h))


@pytest.mark.parametrize("h", TEXT_ONLY_EDGES)
def test_malformed_text_concatenation_equal(h):
    a = dom._fast_parse(h).entire_text()
    b = dom._stdlib_parse(h).entire_text()
    assert a == b


def test_synth_pages_equal():
    spec = SynthSpec(n_hosts=3, pages_per_host=2, items_per_page=4)
    for rid in range(spec.total_rows):
        h = spec.row(rid)["html"].decode()
        assert sig(dom._fast_parse(h)) == sig(dom._stdlib_parse(h))
