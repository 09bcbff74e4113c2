"""True BPE token counting: the Spark column-expression encoder
(symbol-stream + chained replaces) must match a pure-Python reference
that applies the merges table the classic way (leftmost-greedy pass per
merge over a symbol list), on adversarial inputs and real corpus text."""

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from goskyr_spark.ops.text import BPE_MERGES, BPE_PATTERN


def ref_bpe_count(text, merges=BPE_MERGES):
    """Reference merges-table BPE (replay semantics): symbols start as
    characters; each merge does ONE leftmost-greedy non-overlapping
    pass, in rank order."""
    t = text.lower().strip(" ").replace("|", " ").replace("\x02", " ")
    total = 0
    for tok in re.findall(BPE_PATTERN, t):
        syms = list(tok)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        total += len(syms)
    return total


@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="bpe-tests", master="local[2]",
                     shuffle_partitions=2)


ADVERSARIAL = [
    "the theory of things",
    "ttttt hhhh thththth",            # overlapping merge candidates
    "it's the queen's 1900s",         # contractions + digit merges
    "a | b || c ||| d",               # separator char in input
    "tabs\tand\n\nnewlines  spaces",  # whitespace pretokens
    "MiXeD CaSe LoWeRs",
    "punct!!! ...:::;;; (x)",
    "",
    "   ",
    "ação naïve çédille",             # non-ascii letters (punct class)
    "\x02control\x02chars",
    "aaaa bbbb the the the and and",
]


def test_bpe_real_matches_python_reference(spark):
    from goskyr_spark.ops.text import bpe_token_count_real

    rows = list(enumerate(ADVERSARIAL))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_count_real(df).collect()}
    for i, t in rows:
        assert got[i] == ref_bpe_count(t), (i, repr(t), got[i],
                                            ref_bpe_count(t))


def test_bpe_real_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(50)
    from goskyr_spark.ops.text import bpe_token_count_real

    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_count_real(docs).collect()}
    for r in docs.collect():
        assert got[r["doc_id"]] == ref_bpe_count(r["text"])


def test_bpe_hand_computed():
    # 'the' -> [the]; ' theory' -> [' the', 'or', 'y']
    assert ref_bpe_count("the theory") == 4
    # merges actually compress: fewer symbols than characters
    assert ref_bpe_count("the and of to is") < len("the and of to is")


def test_bpe_real_compresses_vs_chars(spark):
    """On English corpus text the merge table must fire: symbol count
    strictly below character count and above pretoken count."""
    from goskyr_spark.ops.text import bpe_token_count, bpe_token_count_real

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(20).cache()
    real = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_token_count_real(docs).collect()}
    pre = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_count(docs).collect()}
    for r in docs.collect():
        n_chars = len(r["text"].strip())
        assert pre[r["doc_id"]] <= real[r["doc_id"]] < n_chars
