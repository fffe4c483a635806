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


@pytest.fixture(scope="session")
def trained_encoders(spark):
    """Train the GRU and CNN+BiLSTM once (default fixture configs) and
    share across the beats-baseline and ensemble tests — each training
    is ~40-60 s, so re-training per test dominated the suite wall."""
    from nfl26_bigdatabowl_prediction_spark.ml.bilstm import (
        BiLstmConfig, train_and_predict_bilstm,
    )
    from nfl26_bigdatabowl_prediction_spark.ml.rnn import (
        GruConfig, train_and_predict_gru,
    )
    from nfl26_bigdatabowl_prediction_spark.testing import make_tracking_tables

    inp, outp = make_tracking_tables(spark)
    gru = train_and_predict_gru(inp, outp, k=5, cfg=GruConfig(horizon_decay=0.9))
    bilstm = train_and_predict_bilstm(
        inp, outp, k=5, cfg=BiLstmConfig(horizon_decay=0.9)
    )
    return {"gru": gru, "bilstm": bilstm}
