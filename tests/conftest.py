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


_ENCODER_CACHE_ROOT = "/tmp/nfl26_encoder_cache"


def _ml_source_key() -> str:
    """Cache key = hash of every ml/ source file + testing.py: any
    change to a trainer, feature builder, or the fixture generator
    invalidates every cached result, so a cache hit is exactly the
    result retraining would produce (training is deterministic — fixed
    seeds, no wall-clock)."""
    import glob as _glob
    import hashlib

    import nfl26_bigdatabowl_prediction_spark as pkg

    root = os.path.dirname(pkg.__file__)
    h = hashlib.sha256()
    for path in sorted(
        _glob.glob(os.path.join(root, "ml", "*.py"))
        + [os.path.join(root, "testing.py")]
    ):
        h.update(path.encode())
        with open(path, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


class _LazyEncoders:
    """Dict-like, trains each encoder on first subscript and caches it
    for the session — a single-file run pays only for the encoders it
    actually uses, while the full suite still trains each exactly once
    (each training is ~40-110 s; per-test retraining dominated the
    suite wall).

    Round-8 (round-6/7 ask #8): results additionally persist to a
    source-keyed DISK cache, so back-to-back suite runs (the
    driver's verify, repeated local iteration) skip retraining
    entirely.  The key covers every ml/ source + the fixture
    generator (_ml_source_key), and SPARK_GRAFT_ENCODER_CACHE=0
    forces retraining."""

    def __init__(self, spark):
        self._spark = spark
        self._tables = None
        self._cache: dict[str, object] = {}

    def _disk_dir(self, name: str) -> str | None:
        if os.environ.get("SPARK_GRAFT_ENCODER_CACHE") == "0":
            return None
        return os.path.join(_ENCODER_CACHE_ROOT, _ml_source_key(), name)

    def _disk_load(self, name: str):
        import importlib
        import json

        d = self._disk_dir(name)
        if d is None or not os.path.exists(os.path.join(d, "meta.json")):
            return None
        with open(os.path.join(d, "meta.json")) as fh:
            meta = json.load(fh)
        cls = getattr(importlib.import_module(meta["module"]), meta["cls"])
        preds = self._spark.read.parquet(os.path.join(d, "preds.parquet"))
        return cls(predictions=preds, **meta["scalars"])

    def _disk_save(self, name: str, result) -> None:
        import dataclasses
        import json
        import tempfile

        d = self._disk_dir(name)
        if d is None:
            return
        os.makedirs(os.path.dirname(d), exist_ok=True)
        scalars = {
            f.name: getattr(result, f.name)
            for f in dataclasses.fields(result)
            if f.name != "predictions"
        }
        # stage + atomic rename so a concurrent/killed run never
        # exposes a half-written cache entry
        stage = tempfile.mkdtemp(
            prefix=f".{name}_stage_", dir=os.path.dirname(d)
        )
        result.predictions.write.mode("overwrite").parquet(
            os.path.join(stage, "preds.parquet")
        )
        with open(os.path.join(stage, "meta.json"), "w") as fh:
            json.dump(
                {
                    "module": type(result).__module__,
                    "cls": type(result).__name__,
                    "scalars": scalars,
                },
                fh,
            )
        try:
            os.rename(stage, d)
        except OSError:  # another run won the race; keep theirs
            import shutil

            shutil.rmtree(stage, ignore_errors=True)

    def __getitem__(self, name: str):
        if name not in self._cache:
            cached = self._disk_load(name)
            if cached is not None:
                self._cache[name] = cached
                return cached
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
            self._disk_save(name, self._cache[name])
        return self._cache[name]


@pytest.fixture(scope="session")
def trained_encoders(spark):
    """All three M9 encoders (GRU, CNN+BiLSTM, ST-transformer) trained
    at the default fixture configs, shared across beats-baseline and
    ensemble tests; lazy per-encoder (see _LazyEncoders)."""
    return _LazyEncoders(spark)
