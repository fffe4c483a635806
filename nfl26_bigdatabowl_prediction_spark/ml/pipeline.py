"""End-to-end training orchestrator — the E1 lifecycle as one call.

Reference: ``NFLPredictor.train_and_predict`` (main_cuda.py:1445-1566)
— scan → feature engineering → as-of label build → grouped folds →
residual GBT ensemble → fold-mean prediction → official metric.  Here
every stage is the already-tested distributed operator; this module
only wires them, exactly as the reference's class wires its pandas
stages.

The feature list is declared-then-intersected with whatever columns
the pipeline produced (schema-tolerant projection, the reference's own
pattern at main_cuda.py:483-486), so callers can pass a superset.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..plans.features import (
    TRAJECTORY_KEY,
    advanced_features,
    build_training_rows,
    full_feature_pipeline,
)
from .folds import with_fold
from .gbt import ResidualGBTConfig, predict_fold_mean, train_residual_gbt
from .scoring import score

DEFAULT_FEATURES = [
    "x", "y", "s", "a",
    "s_roll3_mean", "s_roll5_mean", "speed_change", "momentum",
    "kinetic_energy", "dist_to_ball", "velocity_toward_ball",
    "gnn_d1", "gnn_d2", "gnn_d3", "gnn_ally_cnt", "gnn_opp_cnt",
    "team_x_mean", "team_y_mean", "team_s_mean",
]


@dataclass
class TrainResult:
    predictions: DataFrame  # id, target_*, baseline_*, pred_*
    rmse_baseline: float
    rmse_ensemble: float
    feature_cols: list[str] = field(default_factory=list)


def train_and_predict(
    input_df: DataFrame,
    output_df: DataFrame,
    feature_cols: list[str] | None = None,
    k: int = 5,
    cfg: ResidualGBTConfig | None = None,
) -> TrainResult:
    """Run the full E1 pipeline; returns predictions plus the two
    metric anchors the reference logs after every run
    (main_cuda.py:1389-1401): physics-baseline RMSE and ensemble RMSE.
    """
    feats = full_feature_pipeline(input_df)
    labeled = build_training_rows(advanced_features(input_df), output_df)

    wlast = W.partitionBy(*TRAJECTORY_KEY).orderBy(F.col("frame_id").desc())
    last_feats = (
        feats.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    want = feature_cols or DEFAULT_FEATURES
    cols = [c for c in want if c in last_feats.columns]  # declared∩present

    train = (
        labeled.filter(F.col("last_x").isNotNull())
        .join(last_feats.select(*TRAJECTORY_KEY, *cols), list(TRAJECTORY_KEY))
        .withColumn("delta_frames", F.col("out_frame_id").cast("double"))
        .na.fill(0.0, cols)
    )
    train = with_fold(train, list(TRAJECTORY_KEY), k=k)
    models = train_residual_gbt(
        train, cols + ["delta_frames", "delta_t"], k=k, cfg=cfg or ResidualGBTConfig()
    )
    pred = predict_fold_mean(models, train)

    sol = pred.select("id", F.col("target_x").alias("x"), F.col("target_y").alias("y"))
    base = pred.select(
        "id", F.col("baseline_x").alias("x"), F.col("baseline_y").alias("y")
    )
    ens = pred.select("id", F.col("pred_x").alias("x"), F.col("pred_y").alias("y"))
    return TrainResult(
        predictions=pred,
        rmse_baseline=score(sol, base),
        rmse_ensemble=score(sol, ens),
        feature_cols=cols,
    )
