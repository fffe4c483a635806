"""Multimodal column plumbing (brief: image/audio/video as opaque
binary + typed metadata; decode/feature-extract via Arrow-batched
pandas UDFs).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernel is a clearly-marked deterministic FAKE — but the
Spark-side contract is real and tested: binary column in, Arrow batch
iterator through ``mapInPandas``, typed struct-ish columns + a float
feature vector out, partition-preserving (no shuffle).

At 100 TB this is the right shape: decode is embarrassingly parallel,
so it must stay scan-side (mapInPandas = per-partition batch iterator,
no exchange), with `spark.sql.files.maxPartitionBytes` sizing batches
and `arrow.maxRecordsPerBatch` bounding peak memory per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, fake_width int, fake_height int, feat array<float>"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model step 0: treat content as an opaque binary column (the
    multimodal storage contract).  Here the bytes come from utf-8 text
    because the testdata has no real media; schema-wise identical."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def _fake_decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic FAKE decoder.

    A real deployment replaces the body with e.g. PIL.Image.open /
    librosa.load per cell — same signature, same schema.  Raising
    NotImplementedError for real codecs is the documented contract;
    the fake keeps the plumbing testable in this container.
    """
    n_bytes = batch["payload"].map(len)
    # pseudo-dimensions derived from content length — stable, testable
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": n_bytes.astype("int32"),
            "fake_width": (n_bytes % 640).astype("int32"),
            "fake_height": (n_bytes % 480).astype("int32"),
            "feat": [
                [float(n % 7), float(n % 11), float(n % 13), float(n % 17)]
                for n in n_bytes
            ],
        }
    )


def decode_features(df_with_payload: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batch iterator in, typed features out.
    Partition-preserving — no shuffle anywhere in this operator."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _fake_decode_batch(b)

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        gen, schema=DECODE_SCHEMA
    )
