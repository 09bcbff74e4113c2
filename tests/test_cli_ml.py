"""CLI `extract` + `train` (reference cmd/goskyr/main.go:300-332,
internal/ml/ml.go:55-137,221-258): mock-config raw scrape → feature CSV
→ KNN train → goskyr.model + goskyr.class file contract."""

import numpy as np

from goskyr_spark.cli import main as cli_main
from goskyr_spark.ops.mlfeatures import (KNNClassifier, features_row,
                                         read_features_csv)
from goskyr_spark.ops.wordlist import default_words

ML_YAML = """
writer:
  type: stdout
scrapers:
  - name: alpha
    url: "https://a.test/"
    fetcher:
      type: mock
      mock_pages:
        - url: "https://a.test/"
          content: '<div class="e"><span class="t">Concert Night</span>\
<a class="u" href="/x/1">link</a></div>\
<div class="e"><span class="t">Jazz Evening</span>\
<a class="u" href="/x/2">link</a></div>\
<div class="e"><span class="t">Rock Show</span>\
<a class="u" href="/x/3">link</a></div>\
<div class="e"><span class="t">Folk Hour</span>\
<a class="u" href="/x/4">link</a></div>'
    item: div.e
    fields:
      - name: title
        location: {selector: span.t}
      - name: url
        type: url
        location: {selector: a.u, attr: href}
"""


def test_extract_then_train(tmp_path, monkeypatch, capsys):
    cfg = tmp_path / "config.yml"
    cfg.write_text(ML_YAML)
    out_csv = tmp_path / "features.csv"

    assert cli_main(["extract", "-c", str(cfg), "-o", str(out_csv)]) == 0

    lines = out_csv.read_text().splitlines()
    # header byte-parity with writeFeaturesToFile (ml.go:115-116)
    assert lines[0] == (
        "a, b, c, d, e, f, g, h, i, j, k, l, m, n, o, p, q, r, s, t, u, "
        "v, w, x, y, z, digit-count, rune-count, dict-words-count, "
        "slash-count, colon-count, dash-count, dot-count, "
        "whitespace-count, class")
    # 4 items x 2 fields; raw mode keeps the RAW url attr (no base join)
    assert len(lines) == 1 + 8
    X, y = read_features_csv(out_csv)
    assert X.shape == (8, 34)
    assert sorted(set(y)) == ["title", "url"]
    # row values match the pure-Python kernel on the known first value
    want = features_row("Concert Night", default_words())
    got = next(X[i] for i in range(len(y)) if y[i] == "title"
               and X[i][26 + 1] == len("Concert Night"))
    assert list(map(int, got)) == want

    # train in tmp_path (goskyr.model/goskyr.class land in CWD,
    # ml.go:241-242 literal filenames)
    monkeypatch.chdir(tmp_path)
    assert cli_main(["train", "-f", str(out_csv)]) == 0
    summary = capsys.readouterr().out
    assert "overall accuracy" in summary

    classes = (tmp_path / "goskyr.class").read_text().split()
    assert set(classes) <= {"title", "url"}
    model = KNNClassifier.load(tmp_path / "goskyr.model")
    assert model.k == 2 and model.X.shape[1] == 34
    # the model separates the two field classes it trained on
    preds = model.predict(np.asarray(
        [features_row("Some Concert Title", default_words()),
         features_row("/x/9", default_words())], dtype=float))
    assert preds[1] == "url"


def test_extract_missing_wordlists_falls_back(tmp_path, capsys):
    cfg = tmp_path / "config.yml"
    cfg.write_text(ML_YAML)
    out_csv = tmp_path / "f.csv"
    rc = cli_main(["extract", "-c", str(cfg), "-o", str(out_csv),
                   "-w", str(tmp_path / "nope")])
    assert rc == 0
    assert "built-in dictionary" in capsys.readouterr().err


def test_extract_wordlists_dir(tmp_path):
    cfg = tmp_path / "config.yml"
    cfg.write_text(ML_YAML)
    wl = tmp_path / "word-lists"
    wl.mkdir()
    (wl / "en.txt").write_text("concert\nnight\n")
    out_csv = tmp_path / "f.csv"
    assert cli_main(["extract", "-c", str(cfg), "-o", str(out_csv),
                     "-w", str(wl)]) == 0
    X, y = read_features_csv(out_csv)
    # dict-words-count (col 28) sees both words of "Concert Night"
    titles = X[[i for i in range(len(y)) if y[i] == "title"]]
    assert 2.0 in titles[:, 28]


def test_cli_version_and_debug_flags(tmp_path, monkeypatch, capsys):
    import pytest as _pytest

    # -v prints the package version and exits 0 (main.go:33-44 parity)
    from goskyr_spark import __version__

    with _pytest.raises(SystemExit) as exc:
        cli_main(["--version"])
    assert exc.value.code == 0
    assert capsys.readouterr().out.strip() == __version__

    # -d dumps every fetched page under ./debug (DebugDirDefault)
    cfg = tmp_path / "config.yml"
    cfg.write_text(ML_YAML)
    monkeypatch.chdir(tmp_path)
    assert cli_main(["-d", "scrape", "-c", str(cfg)]) == 0
    dumps = list((tmp_path / "debug").glob("*.html"))
    assert len(dumps) == 1 and dumps[0].name.startswith("a.test-")
    assert "Concert Night" in dumps[0].read_text()
