"""Semantic pins for q_substring_dup on a hand-built corpus where
every window's duplication status is known by construction.

The sf-scale differential proves cross-engine agreement; these pin
the SEMANTICS — that the score means what the docstring says — on
inputs where a human can count the windows.
"""

from __future__ import annotations

import os

import pytest

from nfl26_bigdatabowl_prediction_spark.plans.registry import QUERIES
from nfl26_bigdatabowl_prediction_spark.scratch import scratch_dir


@pytest.fixture(scope="module")
def tiny_corpus_dir(spark):
    """documents.parquet with known substring-duplication structure:

    doc 1: 6 words, all windows unique in the corpus        -> 0
    doc 2: byte-copy of doc 1                               -> 1e6 (both)
    doc 3: 5 words, unique                                  -> 0
    doc 4: internal repeat — the same 5-word phrase twice   -> 1e6
    doc 5: 4 words (no windows)                             -> 0 windows
    """
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "t", 35),
        (2, "alpha beta gamma delta epsilon zeta", "en", "t", 35),
        (3, "one two three four five", "en", "t", 23),
        (4, "red orange yellow green blue red orange yellow green blue",
         "en", "t", 58),
        (5, "too short for windows", "en", "t", 21),
    ]
    d = scratch_dir("substring_dup_fixture_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_substring_dup_semantics(spark, tiny_corpus_dir):
    out = {
        r["doc_id"]: r
        for r in QUERIES["q_substring_dup"](spark, tiny_corpus_dir).collect()
    }
    assert len(out) == 5
    # doc1/doc2 are byte-copies: every window occurs twice corpus-wide
    for doc in (1, 2):
        assert out[doc]["n_windows"] == 2  # 6 words -> 2 windows
        assert out[doc]["n_dup"] == 2
        assert out[doc]["dup_micros"] == 1_000_000
    # doc3: single unique window
    assert out[3]["n_windows"] == 1
    assert out[3]["n_dup"] == 0
    assert out[3]["dup_micros"] == 0
    # doc4: 10 words -> 6 windows; the repeated phrase makes windows
    # 1 and 6 ("red orange yellow green blue") the same fingerprint —
    # an INTERNAL repeat counts as duplication (boilerplate)
    assert out[4]["n_windows"] == 6
    assert out[4]["n_dup"] == 2
    assert out[4]["dup_micros"] == 333_333  # 2e6 div 6, exact floor
    # doc5: fewer than 5 tokens -> zero windows, zero score (not
    # dropped — the UNION branch)
    assert out[5]["n_windows"] == 0
    assert out[5]["dup_micros"] == 0
