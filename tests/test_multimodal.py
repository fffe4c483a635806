"""Multimodal plumbing: exact pure-Python oracles for the paths the
DuckDB oracle cannot express (blob byte-folds), plus the batch-shape
contract of the mapInPandas kernels.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from nfl26_bigdatabowl_prediction_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    resize_images,
    sample_frames,
)
from nfl26_bigdatabowl_prediction_spark.sources.io import table


def test_resize_matches_python_oracle(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(200)
    got = (
        resize_images(attach_binary_payload(d), width=64, height=64)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    src = d.select("doc_id", "text").toPandas()
    want = {
        int(r.doc_id): sum(r.text.encode("utf-8")) for r in src.itertuples()
    }
    assert (got["out_width"] == 64).all() and (got["out_height"] == 64).all()
    assert {i: int(v) for i, v in got["px_sum"].items()} == want


def test_resize_real_path_is_stubbed(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(1)
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        resize_images(attach_binary_payload(d), 8, 8, real=True).collect()


def test_sample_frames_indices(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 7), (3, 8), (4, 20)], "doc_id int, n_frames int"
    )
    got = {
        (r.doc_id, r.frame_idx)
        for r in sample_frames(df, F.col("n_frames"), stride=7).collect()
    }
    want = {
        (d, i) for d, n in [(1, 1), (2, 7), (3, 8), (4, 20)]
        for i in range(0, n, 7)
    }
    assert got == want


def test_decode_schema_and_determinism(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(50)
    out = decode_features(attach_binary_payload(d))
    pdf = out.toPandas()
    assert list(pdf.columns) == [
        "doc_id", "n_bytes", "fake_width", "fake_height", "feat"
    ]
    assert all(len(v) == 4 for v in pdf["feat"])
    # deterministic: re-running yields identical rows
    pdf2 = decode_features(attach_binary_payload(d)).toPandas()
    a = pdf.sort_values("doc_id").reset_index(drop=True)
    b = pdf2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a.drop(columns="feat"), b.drop(columns="feat"))
