"""ML feature extraction (G9) + KNN (G10) tests — feature semantics per
/root/reference/internal/ml/ml.go:156-215 (bytes for rune_count,
space-split dict words, char counts)."""

import numpy as np
import pytest

from goskyr_spark.ops.mlfeatures import (
    FEATURE_NAMES,
    KNNClassifier,
    features_row,
    train_model,
)


def test_features_row_semantics():
    words = {"final", "story"}
    row = features_row("Final Story: 20.8/2025 - ok", words)
    named = dict(zip(FEATURE_NAMES, row))
    assert named["letter_o"] == 2  # stOry, Ok
    assert named["digit_count"] == 7
    assert named["rune_count"] == len("Final Story: 20.8/2025 - ok")
    # dict words: split(' ') → ['final','story:','20.8/2025','-','ok']
    # 'story:' does NOT match (exact membership, like the reference)
    assert named["dict_words_count"] == 1
    assert named["slash_count"] == 1
    assert named["colon_count"] == 1
    assert named["dash_count"] == 1
    assert named["dot_count"] == 1
    assert named["whitespace_count"] == 4
    assert len(row) == 34


def test_rune_count_is_bytes():
    row = features_row("Über", set())
    named = dict(zip(FEATURE_NAMES, row))
    assert named["rune_count"] == 5  # Ü is 2 bytes (Go len())


def test_knn_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    X = np.vstack([rng.normal(0, 1, (50, 4)), rng.normal(8, 1, (50, 4))])
    y = np.array(["a"] * 50 + ["b"] * 50)
    model, acc = train_model(X, y)
    assert acc > 0.9
    p = str(tmp_path / "m.npz")
    model.save(p)
    m2 = KNNClassifier.load(p)
    assert (m2.predict([[0, 0, 0, 0], [8, 8, 8, 8]]) == ["a", "b"]).all()


@pytest.mark.parametrize("use_spark", [True])
def test_features_df_matches_kernel(use_spark):
    from goskyr_spark.spark.session import get_spark
    from goskyr_spark.ops.mlfeatures import features_df

    spark = get_spark(app="ml-tests", master="local[2]",
                      shuffle_partitions=2)
    words = ["final", "story", "ok"]
    vals = ["Final Story: 20.8/2025 - ok", "plain text", "Über 12:30",
            "a/b/c . . -"]
    df = spark.createDataFrame([(v, "title") for v in vals],
                               "value string, class string")
    got = features_df(df, word_list=words).collect()
    for r, v in zip(got, vals):
        want = features_row(v, set(words))
        have = [r[n] for n in FEATURE_NAMES]
        assert have == want, (v, list(zip(FEATURE_NAMES, have, want)))


def test_default_word_list_end_to_end():
    """dict_words_count with the built-in deterministic dictionary
    (no word_list argument) — exercised end-to-end, not constant 0."""
    from goskyr_spark.ops.mlfeatures import FEATURE_NAMES, features_row
    from goskyr_spark.ops.wordlist import default_words, load_words

    idx = FEATURE_NAMES.index("dict_words_count")
    row = features_row("the concert starts today at the venue")
    assert row[idx] >= 5  # the/concert/today/the/venue all in the list
    assert features_row("zzqq xkcdw")[idx] == 0
    assert len(default_words()) > 1000

    # loadWords parity: lowercased lines, recursive dir walk
    import os, tempfile

    d = tempfile.mkdtemp()
    os.makedirs(os.path.join(d, "sub"))
    with open(os.path.join(d, "a.txt"), "w") as f:
        f.write("Alpha\nBETA\n\n")
    with open(os.path.join(d, "sub", "b.txt"), "w") as f:
        f.write("gamma\n")
    assert load_words(d) == frozenset({"alpha", "beta", "gamma"})


def test_features_df_default_word_list():
    from goskyr_spark.spark.session import get_spark
    from goskyr_spark.ops.mlfeatures import FEATURE_NAMES, features_df, features_row

    spark = get_spark(app="ml-tests", master="local[2]",
                      shuffle_partitions=2)
    vals = ["the concert starts today", "zzqq 123"]
    df = spark.createDataFrame([(v, "t") for v in vals],
                               "value string, class string")
    got = {r["rune_count"]: r for r in features_df(df).collect()}
    for v in vals:
        want = features_row(v)
        r = got[want[FEATURE_NAMES.index("rune_count")]]
        assert [r[n] for n in FEATURE_NAMES] == want
