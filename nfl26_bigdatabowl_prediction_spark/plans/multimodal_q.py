"""Multimodal query surface (rows-only driver check: the decode
kernel is a pandas UDF — not SQL-expressible, per the driver
contract's weaker-check clause)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary_payload, decode_features
from ..sources.io import table

QUERIES: dict = {}
ORACLES: dict = {}


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas fake-decode → per-source feature
    stats.  Exercises the full multimodal plumbing chain."""
    d = table(spark, sf_dir, "documents")
    decoded = decode_features(attach_binary_payload(d))
    src = d.select("doc_id", "source")
    return (
        decoded.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("fake_width").alias("max_width"),
            F.sum(F.element_at("feat", 1).cast("double")).alias("feat0_sum"),
        )
    )


QUERIES["q_multimodal_decode"] = q_multimodal_decode
# no oracle: pandas-UDF kernel → rows-only check per driver contract
