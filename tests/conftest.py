from __future__ import annotations

import os

import duckdb
import pytest

# Default to the DRIVER's verification scale (sf0.01): round 1's
# q_except vacuity slipped through because the local differential ran
# at sf0.001 while the driver checks sf0.01.  Export
# SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 for a faster local
# iteration loop.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from nfl26_bigdatabowl_prediction_spark.session import get_spark

    s = get_spark(app_name="nfl26-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


class _LazyEncoders:
    """Dict-like, trains each encoder on first subscript and caches it
    for the session — a single-file run pays only for the encoders it
    actually uses, while the full suite still trains each exactly once
    (each training is ~40-110 s; per-test retraining dominated the
    suite wall)."""

    def __init__(self, spark):
        self._spark = spark
        self._tables = None
        self._cache: dict[str, object] = {}

    def __getitem__(self, name: str):
        if name not in self._cache:
            if self._tables is None:
                from nfl26_bigdatabowl_prediction_spark.testing import (
                    make_tracking_tables,
                )

                self._tables = make_tracking_tables(self._spark)
            inp, outp = self._tables
            if name == "gru":
                from nfl26_bigdatabowl_prediction_spark.ml.rnn import (
                    GruConfig, train_and_predict_gru,
                )

                self._cache[name] = train_and_predict_gru(
                    inp, outp, k=5, cfg=GruConfig(horizon_decay=0.9)
                )
            elif name == "bilstm":
                from nfl26_bigdatabowl_prediction_spark.ml.bilstm import (
                    BiLstmConfig, train_and_predict_bilstm,
                )

                self._cache[name] = train_and_predict_bilstm(
                    inp, outp, k=5, cfg=BiLstmConfig(horizon_decay=0.9)
                )
            elif name == "transformer":
                from nfl26_bigdatabowl_prediction_spark.ml.transformer import (
                    TransformerConfig, train_and_predict_transformer,
                )

                self._cache[name] = train_and_predict_transformer(
                    inp, outp, k=5, cfg=TransformerConfig(horizon_decay=0.9)
                )
            else:
                raise KeyError(name)
        return self._cache[name]


@pytest.fixture(scope="session")
def trained_encoders(spark):
    """All three M9 encoders (GRU, CNN+BiLSTM, ST-transformer) trained
    at the default fixture configs, shared across beats-baseline and
    ensemble tests; lazy per-encoder (see _LazyEncoders)."""
    return _LazyEncoders(spark)
