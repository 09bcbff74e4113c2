"""ML field-classification features + KNN labeling (authoring-time tool).

Parity with /root/reference/internal/ml/ml.go: per extracted field value,
34 features — 26 lowercase-letter frequencies + digit count + byte count
(Go len(string) counts BYTES) + dictionary-word count (space-split,
lowercased, exact membership) + slash/colon/dash/dot/whitespace counts —
labeled with the field name (ml.go:139-215, 26-55).

Spark-side, the features are pure column expressions over the raw-mode
items table (rawDyn extraction = kernels.scrape raw_dyn=True), so feature
extraction runs JVM-side at corpus scale; the tiny KNN (golearn euclidean
linear k=2, ml.go:221-258) is replaced by a numpy brute-force classifier
— authoring-time, model sizes are thousands of rows.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

FEATURE_NAMES = ([f"letter_{chr(97 + i)}" for i in range(26)] +
                 ["digit_count", "rune_count", "dict_words_count",
                  "slash_count", "colon_count", "dash_count", "dot_count",
                  "whitespace_count"])


def features_row(value: str, word_set=None) -> list:
    """Pure-Python kernel (parity with calculateFeatures). word_set=None
    uses the built-in deterministic dictionary (ops.wordlist)."""
    if word_set is None:
        from .wordlist import default_words

        word_set = default_words()
    freqs = [0] * 26
    digits = 0
    for ch in value:
        lo = ch.lower()
        if "a" <= lo <= "z":
            freqs[ord(lo) - 97] += 1
        if ch.isdigit():
            digits += 1
    words = value.lower().split(" ")
    dict_words = sum(1 for w in words if w in word_set)
    return freqs + [
        digits,
        len(value.encode("utf-8")),  # Go len() = bytes
        dict_words,
        value.count("/"), value.count(":"), value.count("-"),
        value.count("."), value.count(" "),
    ]


def features_df(values_df, value_col="value", class_col="class",
                word_list=None):
    """Distributed feature extraction as column expressions (no UDF).

    word_list=None uses the built-in deterministic dictionary; pass
    frozenset() to disable dict_words_count, or ops.wordlist.load_words
    output for a reference-style word-lists directory."""
    if word_list is None:
        from .wordlist import default_words

        word_list = default_words()
    v = F.col(value_col)
    cols = []
    for i in range(26):
        c = chr(97 + i)
        cols.append(F.regexp_count(F.lower(v), F.lit(c)).alias(f"letter_{c}"))
    cols.append(F.regexp_count(v, F.lit(r"[0-9]")).alias("digit_count"))
    cols.append(F.octet_length(v).alias("rune_count"))
    if word_list:
        wl = F.array(*[F.lit(w) for w in sorted(word_list)])
        words = F.split(F.lower(v), " ")
        cols.append(F.size(F.array_intersect(words, wl))
                    .alias("dict_words_count_distinct"))
        # exact parity (multiset count) via filter+size
        cols.append(F.size(F.filter(words, lambda w: F.array_contains(wl, w)))
                    .alias("dict_words_count"))
    else:
        cols.append(F.lit(0).alias("dict_words_count"))
    for name, ch in [("slash_count", "/"), ("colon_count", ":"),
                     ("dash_count", "-"), ("dot_count", r"\."),
                     ("whitespace_count", " ")]:
        cols.append(F.regexp_count(v, F.lit(ch)).alias(name))
    out = values_df.select(*cols, F.col(class_col).alias("class"))
    if word_list:
        out = out.drop("dict_words_count_distinct")
    return out


class KNNClassifier:
    """Brute-force euclidean KNN (k=2 default like the reference)."""

    def __init__(self, k=2):
        self.k = k
        self.X = None
        self.y = None

    def fit(self, X, y):
        self.X = np.asarray(X, dtype=np.float64)
        self.y = np.asarray(y)
        return self

    def predict(self, X):
        X = np.asarray(X, dtype=np.float64)
        out = []
        for row in X:
            d = np.sum((self.X - row) ** 2, axis=1)
            idx = np.argsort(d, kind="stable")[: self.k]
            labels, counts = np.unique(self.y[idx], return_counts=True)
            out.append(labels[np.argmax(counts)])
        return np.array(out)

    def save(self, path):
        # np.savez appends ".npz" to bare string paths; writing through
        # a file object preserves the exact name so the CLI can honor
        # the reference's literal "goskyr.model" contract (ml.go:242)
        with open(path, "wb") as fh:
            np.savez(fh, X=self.X, y=self.y, k=self.k)

    @classmethod
    def load(cls, path):
        d = np.load(path, allow_pickle=True)
        m = cls(int(d["k"]))
        m.X, m.y = d["X"], d["y"]
        return m


def train_model(features, labels, split=0.75, k=2, seed=42,
                return_test=False):
    """TrainModel analog: split, fit, return (model, accuracy).

    With return_test=True also returns (y_true, y_pred) for the
    held-out quarter so the CLI can print a confusion summary
    (the reference prints golearn's GetSummary, ml.go:239)."""
    rng = np.random.default_rng(seed)
    X = np.asarray(features, dtype=np.float64)
    y = np.asarray(labels)
    idx = rng.permutation(len(X))
    cut = int(len(X) * split)
    tr, te = idx[:cut], idx[cut:]
    model = KNNClassifier(k).fit(X[tr], y[tr])
    if len(te):
        y_pred = model.predict(X[te])
        acc = float((y_pred == y[te]).mean())
    else:
        y_pred = np.array([])
        acc = float("nan")
    if return_test:
        return model, acc, (y[te], y_pred)
    return model, acc


def confusion_summary(y_true, y_pred):
    """Per-class TP/FP/FN + precision/recall/F1 table (GetSummary
    analog, ml.go:236-239). Returns a printable string."""
    classes = sorted(set(map(str, y_true)) | set(map(str, y_pred)))
    lines = ["class\ttp\tfp\tfn\tprecision\trecall\tf1"]
    yt = np.asarray([str(v) for v in y_true])
    yp = np.asarray([str(v) for v in y_pred])
    for c in classes:
        tp = int(np.sum((yt == c) & (yp == c)))
        fp = int(np.sum((yt != c) & (yp == c)))
        fn = int(np.sum((yt == c) & (yp != c)))
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        lines.append(f"{c}\t{tp}\t{fp}\t{fn}\t{prec:.4f}\t{rec:.4f}"
                     f"\t{f1:.4f}")
    acc = float(np.mean(yt == yp)) if len(yt) else float("nan")
    lines.append(f"overall accuracy: {acc:.4f} ({len(yt)} test rows)")
    return "\n".join(lines)


# CSV feature-file contract (writeFeaturesToFile, ml.go:99-137):
# header "a, b, ..., z, digit-count, rune-count, ..., class", rows
# joined with ", " — dashes in the header, underscores in the column
# constants above.
CSV_HEADER = ([chr(97 + i) for i in range(26)] +
              [n.replace("_", "-") for n in FEATURE_NAMES[26:]] +
              ["class"])


def write_features_csv(rows, path):
    """Write (features:list[int], class:str) rows in the reference's
    exact CSV shape (ml.go:117-136: ", "-joined, trailing class col)."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(", ".join(CSV_HEADER) + "\n")
        for feats, cls in rows:
            fh.write(", ".join(str(int(v)) for v in feats)
                     + f", {cls}\n")


def read_features_csv(path):
    """Parse a feature CSV back to (X, y). Tolerates plain-comma CSVs
    too (golearn's ParseCSVToInstances trims spaces the same way)."""
    X, y = [], []
    with open(path, encoding="utf-8") as fh:
        header = fh.readline()
        ncols = len(header.split(","))
        for line in fh:
            parts = [p.strip() for p in line.rstrip("\n").split(",")]
            if len(parts) != ncols or not line.strip():
                continue
            X.append([float(v) for v in parts[:-1]])
            y.append(parts[-1])
    return np.asarray(X, dtype=np.float64), np.asarray(y)
