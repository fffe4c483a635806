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


RESIZE_SCHEMA = "doc_id bigint, out_width int, out_height int, px_sum bigint"


def resize_images(
    df_with_payload: DataFrame, width: int, height: int, real: bool = False
) -> DataFrame:
    """Image resize plumbing: payload → fixed-size raster summary.

    ``real=True`` is the documented production contract (PIL resize per
    cell) — NotImplementedError here because the codec libraries are
    not in this container.  The fake path is deterministic on the byte
    content (sum of bytes of the payload = the "pixel sum" of the
    resized raster), so the Spark-side batch shape is fully testable.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if real:
                raise NotImplementedError(
                    "real image decode requires PIL; install and replace "
                    "this branch with Image.open(BytesIO(p)).resize(...)"
                )
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "out_width": width,
                    "out_height": height,
                    "px_sum": b["payload"].map(lambda p: int(sum(p))),
                }
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        gen, schema=RESIZE_SCHEMA
    )


def sample_frames(
    df: DataFrame, n_frames_col, stride: int, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame-sampling plumbing: every ``stride``-th frame index
    of a clip with ``n_frames_col`` frames, one output row per sampled
    frame.  Pure native explode (sequence + explode stays in codegen;
    the row fanout happens executor-side with no shuffle) — the real
    deployment feeds these (doc_id, frame_idx) pairs to a decode UDF.
    """
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), n_frames_col - 1, F.lit(stride))
        ).alias("frame_idx"),
    )
