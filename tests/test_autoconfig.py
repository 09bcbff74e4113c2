"""Autoconfig generator (G1-G7) tests: field discovery, item-selector
inference, type detection, and the round-trip self-check — on both the
synthetic event page and the reference's own mock page."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

from fixtures_html import MOCK_PAGE

from goskyr_spark.ops.autoconfig import (
    discover_fields,
    generate_and_verify,
    infer_scraper,
)
from goskyr_spark.synth import SynthSpec


def _event_page():
    spec = SynthSpec(n_hosts=2, pages_per_host=2, items_per_page=6)
    row = spec.row(1)
    return row["url"], row["html"].decode()


def test_discover_fields_event_page():
    _, html = _event_page()
    _, cands = discover_fields(html, min_occ=5)
    kinds = {(c["attr"] or "text"): c for c in cands}
    assert "href" in kinds
    assert any(c["count"] == 6 for c in cands)
    assert len(cands) == 4  # href, tag, title, when


def test_generate_and_verify_event_page():
    url, html = _event_page()
    scraper, items = generate_and_verify(html, url, min_occ=5)
    assert scraper is not None
    assert scraper.item.endswith("div.event")
    types = sorted((f.type or "text") for f in scraper.fields)
    assert types == ["date", "text", "text", "url"]
    assert len(items) == 6
    # url fields got absolutized against the page url
    url_field = next(f for f in scraper.fields if f.type == "url")
    assert items[0][url_field.name].startswith("https://host0000.test/")


def test_generate_mock_page():
    """The reference's config-mock page: 3 artists with names and dates
    (min_occ=3 like passing --min 3)."""
    scraper, items = generate_and_verify(MOCK_PAGE, "https://mock.url",
                                         min_occ=3)
    assert scraper is not None
    assert len(items) == 3
    vals = [sorted(str(v) for k, v in it.items() if not k.startswith("_"))
            for it in items]
    flat = " | ".join(v for vs in vals for v in vs)
    assert "Final Story" in flat and "Irony of Fate" in flat


def test_labeler_hook():
    url, html = _event_page()
    scraper = infer_scraper(html, url, min_occ=5,
                            labeler=lambda ex, i: f"col{i}")
    assert [f.name for f in scraper.fields] == [f"col{i}" for i in range(4)]


def test_no_fields():
    scraper, items = generate_and_verify("<html><body><p>once</p></body>",
                                         min_occ=5)
    assert scraper is None and items == []


def test_mixed_content_child_index():
    """Text after element siblings: generated child_index must match the
    extraction walk (counts ALL sibling node kinds)."""
    page = "".join(
        f'<div class="row"><span class="icon">*</span>title {i}<b>x</b>'
        f"price {i}0</div>" for i in range(6))
    scraper, items = generate_and_verify(
        f"<html><body>{page}</body></html>", "https://x/", min_occ=5)
    assert scraper is not None and len(items) == 6
    vals = sorted(v for k, v in items[0].items() if not k.startswith("_"))
    assert vals == ["price 00", "title 0"]


def test_sibling_columns_not_merged():
    """Two same-signature sibling columns stay separate fields with
    :nth-of-type pinning (and don't collapse into the item selector)."""
    page = "".join(
        f'<div class="e"><span class="v">artist {i}</span>'
        f'<span class="v">venue {i}</span></div>' for i in range(6))
    scraper, items = generate_and_verify(
        f"<html><body>{page}</body></html>", "https://x/", min_occ=5)
    assert scraper is not None
    sels = sorted(f.location[0].selector for f in scraper.fields)
    assert sels == ["span.v:nth-of-type(1)", "span.v:nth-of-type(2)"]
    assert len(items) == 6
    vals = sorted(v for k, v in items[0].items() if not k.startswith("_"))
    assert vals == ["artist 0", "venue 0"]


def test_field_discovery_reference_goldens():
    """Observable parity with the reference's own generate-path goldens
    (fieldmanager_test.go:19-250 TestNewElementManagerFromHtml): same
    candidate set — (attr, examples) groups, comment-aware text indices,
    and sibling columns split like nth-child pseudo classes. Path syntax
    differs (we emit :nth-of-type, the reference :nth-child) but both
    select the same nodes."""
    from goskyr_spark.ops.autoconfig import discover_fields

    def cands(html):
        _, cs = discover_fields(html, min_occ=1, only_varying=False)
        return sorted((c["attr"], c["nth"] or 0, tuple(c["examples"]),
                       c["path"][-1]) for c in cs)

    # single element with text
    got = cands('<html><body><div class="container">Hello World</div>'
                '</body></html>')
    assert got == [("", 0, ("Hello World",), "#text0")]

    # single element with attributes
    got = cands('<html><body><img class="image" src="image.jpg"/>'
                '</body></html>')
    assert got == [("src", 0, ("image.jpg",), "img.image")]

    # child elements: text before/after <p> gets its node index
    got = cands('<html><body><div class="container">child0<p>foo</p>'
                'child2</div></body></html>')
    assert ("", 0, ("child0",), "#text0") in got
    assert ("", 0, ("foo",), "#text0") in got  # inside p, index 0
    assert ("", 0, ("child2",), "#text2") in got
    assert len(got) == 3

    # multiple identical siblings -> one column per position
    got = cands('<html><body><ul class="list"><li class="item">item1</li>'
                '<li class="item">item2</li><li class="item">item3</li>'
                '</ul></body></html>')
    assert [(g[1], g[2]) for g in got] == [(1, ("item1",)),
                                           (2, ("item2",)),
                                           (3, ("item3",))]

    # props in non-self-closing tags: href + title + text
    got = cands('<html><body><a href="https://example.com" '
                'title="Example Link">Click Here</a></body></html>')
    assert [(g[0], g[2]) for g in got] == \
        [("", ("Click Here",)), ("href", ("https://example.com",)),
         ("title", ("Example Link",))]

    # overlapping classes are DIFFERENT signatures (no merge, no split):
    # the parent element step differs (div.box vs div.box.highlight)
    _, cs = discover_fields(
        '<html><body><div class="box highlight">Box 1</div>'
        '<div class="box">Box 2</div></body></html>',
        min_occ=1, only_varying=False)
    got = sorted((tuple(c["examples"]), c["path"][-2]) for c in cs)
    assert got == [(("Box 1",), "div.box.highlight"),
                   (("Box 2",), "div.box")]

    # comments COUNT in the text index (reference textIndex=1)
    got = cands('<html><body><div><!-- This is a comment -->Visible Text'
                '<p>Paragraph Text<!-- Another comment --></p></div>'
                '</body></html>')
    assert ("", 0, ("Visible Text",), "#text1") in got
    assert ("", 0, ("Paragraph Text",), "#text0") in got

    # self-closing/void siblings: the two divs stay separate columns
    got = cands('<html><body><br/><img/><meta/><div>Text 1</div>'
                '<input/><link/><div>Text 2</div></body></html>')
    exs = sorted(g[2] for g in got)
    assert exs == [("Text 1",), ("Text 2",)]


def test_remote_llm_labler_prompt_and_labels():
    """G7 remote-llm labler: the reference's exact prompt contract
    (labler.go:104-146) — label set line, field-i example lists, strict
    JSON answer, 'other' fallback for unmapped fields."""
    from goskyr_spark.ops.autoconfig import discover_fields
    from goskyr_spark.ops.labler import (RemoteLLMLabler,
                                         build_label_prompt,
                                         parse_label_answer)

    url, html = _event_page()
    _, candidates = discover_fields(html, min_occ=5)
    prompts = []

    def stub(prompt):
        prompts.append(prompt)
        # answer labels for all but the last field → fallback 'other'
        mapping = {f"field-{i}": lab for i, lab in
                   enumerate(["title", "url", "genre"])}
        import json

        return json.dumps(mapping)

    labler = RemoteLLMLabler(stub, ["title", "date", "url", "genre"],
                             candidates=candidates)
    scraper = infer_scraper(html, url, min_occ=5, labeler=labler)
    names = [f.name for f in scraper.fields]
    assert names[:3] == ["title", "url", "genre"]
    assert names[3:] == ["other"] * (len(names) - 3)

    p = prompts[0]
    assert "The labels should always be one of the following: " \
        "title, date, url, genre." in p
    assert 'field-0: ["' in p and f"field-{len(candidates)-1}: [" in p
    assert "Just return the JSON and nothing else." in p

    # example caps: ≤10 examples, each ≤200 chars
    long_cand = [{"examples": [str(i) + "x" * 300 for i in range(15)]}]
    p2 = build_label_prompt(long_cand, ["a"])
    line = [l for l in p2.splitlines() if l.startswith("field-0")][0]
    assert line.count('", "') == 9  # 10 examples
    assert all(len(e) <= 200 for e in line[len('field-0: ["'):-2]
               .split('", "'))

    # malformed answer → error; non-object → error
    import pytest as _p

    with _p.raises(ValueError):
        parse_label_answer("not json", 2)
    with _p.raises(ValueError):
        parse_label_answer('["a"]', 2)


def test_labler_factory_types():
    from goskyr_spark.ops.labler import new_labler

    basic = new_labler({"type": "basic"})
    assert basic(["x"], 3) == "field-3"

    import numpy as np

    from goskyr_spark.ops.mlfeatures import KNNClassifier, features_row

    X = [features_row("20.8.2025 19:00"), features_row("21.8.2025 20:00"),
         features_row("Concert Hall"), features_row("Blue Note")]
    knn = KNNClassifier(k=1).fit(np.asarray(X, dtype=float),
                                 np.array(["date", "date", "loc", "loc"]))
    ml = new_labler({"type": "local-ml"}, knn_model=knn)
    assert ml(["22.8.2025 21:00"], 0) == "date"
    assert ml(["Jazz Cellar"], 1) == "loc"

    import pytest as _p

    with _p.raises(ValueError):
        new_labler({"type": "nope"})


# --- field selection (fieldSelection, fieldmanager.go:356-430) -------------

def test_select_hook_keeps_subset_and_names():
    url, html = _event_page()
    full = infer_scraper(html, url, min_occ=5)
    names = [f.name for f in full.fields]

    def pick_last_two(cands, nms):
        assert nms == names  # names assigned BEFORE selection
        return [len(cands) - 2, len(cands) - 1]

    sub = infer_scraper(html, url, min_occ=5, select=pick_last_two)
    assert [f.name for f in sub.fields] == names[-2:]
    # the subset still round-trips through the real kernels
    from goskyr_spark.kernels.scrape import scrape_page
    pr = scrape_page(sub, url, html)
    assert len(pr.items) == 6


def test_select_hook_empty_selection_is_none():
    url, html = _event_page()
    assert infer_scraper(html, url, min_occ=5,
                         select=lambda c, n: []) is None


def test_select_hook_out_of_range_ignored():
    url, html = _event_page()
    full = infer_scraper(html, url, min_occ=5)
    sub = infer_scraper(html, url, min_occ=5,
                        select=lambda c, n: [0, 99, -7])
    assert [f.name for f in sub.fields] == [full.fields[0].name]


def test_cli_generate_interactive(tmp_path, monkeypatch, capsys):
    import io

    from goskyr_spark.cli import main as cli_main

    url, html = _event_page()
    f = tmp_path / "page.html"
    f.write_text(html)

    # keep fields 0 and 2-3 via the prompt
    monkeypatch.setattr("sys.stdin", io.StringIO("0 2-3\n"))
    assert cli_main(["generate", "--file", str(f), "--url", url,
                     "--interactive"]) == 0
    out, err = capsys.readouterr()
    assert "fields to keep" in err and "examples" in err
    import yaml
    cfg = yaml.safe_load(out)
    assert len(cfg["scrapers"][0]["fields"]) == 3

    # 'none' aborts
    monkeypatch.setattr("sys.stdin", io.StringIO("none\n"))
    assert cli_main(["generate", "--file", str(f), "--url", url,
                     "--interactive"]) == 1

    # empty input = keep all (4 fields)
    monkeypatch.setattr("sys.stdin", io.StringIO("\n"))
    assert cli_main(["generate", "--file", str(f), "--url", url,
                     "--interactive"]) == 0
    out, _ = capsys.readouterr()
    cfg = yaml.safe_load(out)
    assert len(cfg["scrapers"][0]["fields"]) == 4
