"""M2/M4/M5/M6/M7 — the gradient-boosted residual ensemble, MLlib-first.

Reference stack (main_cuda.py:1009-1126, 1298-1310, 85-90):
  CatBoost primary on residual labels → OOF residuals → XGB/LGB
  second stage → inverse-RMSE weighted combine → Ridge meta-stack.

MLlib mapping (SURVEY §2.10): GBTRegressor per target replaces each
booster (parity is metric-level, not bitwise — the reference's own
logs are its only spec); LinearRegression(regParam=1, elasticNet=0)
is the Ridge meta-learner; weighted averaging is column arithmetic.
Early stopping: GBT's validationIndicatorCol + validationTol emulate
the reference's eval_set (SURVEY §4) via folds.with_validation_flag;
default stays a fixed maxIter budget.

Everything stays distributed: VectorAssembler keeps features in
DataFrames; per-fold training iterates over K cached filtered views.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.regression import GBTRegressor, LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ResidualGBTConfig:
    max_iter: int = 20  # reference uses 20k + early stop; scaled for tests
    max_depth: int = 5  # reference depth 8 (main_cuda.py:68-72)
    step_size: float = 0.08  # reference lr (main_cuda.py:70)
    subsample: float = 0.8
    seed: int = 42
    scale_features: bool = False
    # eval_set early stopping (CatBoost :759 / XGB :852 / LGB :946):
    # name of a boolean holdout column (folds.with_validation_flag) —
    # GBT stops adding trees once the holdout error improves by less
    # than validation_tol.  None = fixed iteration budget.
    validation_col: str | None = None
    validation_tol: float = 0.01


@dataclass
class FoldModel:
    fold: int
    model_x: PipelineModel
    model_y: PipelineModel


def _pipeline(feature_cols: list[str], label: str, cfg: ResidualGBTConfig) -> Pipeline:
    stages = [
        VectorAssembler(
            inputCols=feature_cols, outputCol="_features_raw", handleInvalid="keep"
        )
    ]
    feat_col = "_features_raw"
    if cfg.scale_features:
        # M8 — StandardScaler (nn-mps.py:908-916)
        stages.append(
            StandardScaler(
                inputCol="_features_raw", outputCol="_features", withMean=True
            )
        )
        feat_col = "_features"
    kwargs = {}
    if cfg.validation_col is not None:
        kwargs = {
            "validationIndicatorCol": cfg.validation_col,
            "validationTol": cfg.validation_tol,
        }
    stages.append(
        GBTRegressor(
            featuresCol=feat_col,
            labelCol=label,
            predictionCol=f"pred_{label}",
            maxIter=cfg.max_iter,
            maxDepth=cfg.max_depth,
            stepSize=cfg.step_size,
            subsamplingRate=cfg.subsample,
            seed=cfg.seed,
            **kwargs,
        )
    )
    return Pipeline(stages=stages)


def train_residual_gbt(
    train_df: DataFrame,
    feature_cols: list[str],
    k: int = 3,
    cfg: ResidualGBTConfig | None = None,
    fold_col: str = "fold",
) -> list[FoldModel]:
    """K-fold training of the (res_x, res_y) regressor pair
    (main_cuda.py:728-801).  Expects ``with_fold`` to have been
    applied; labels are the residuals from build_training_rows."""
    cfg = cfg or ResidualGBTConfig()
    train_df = train_df.cache()
    models = []
    for fold in range(k):
        tr = train_df.filter(F.col(fold_col) != fold)
        mx = _pipeline(feature_cols, "res_x", cfg).fit(tr)
        my = _pipeline(feature_cols, "res_y", cfg).fit(tr)
        models.append(FoldModel(fold, mx, my))
    return models


def predict_fold_mean(
    models: list[FoldModel], df: DataFrame, clip_bounds: bool = True
) -> DataFrame:
    """Fold-ensemble mean prediction + baseline add-back + clip
    (main_cuda.py:1501-1530): pred = clip(baseline + mean_k residual)."""
    n = len(models)
    out = df
    for fm in models:
        out = (
            fm.model_x.transform(out)
            .withColumnRenamed("pred_res_x", f"_px_{fm.fold}")
            .drop("_features_raw", "_features")
        )
        out = (
            fm.model_y.transform(out)
            .withColumnRenamed("pred_res_y", f"_py_{fm.fold}")
            .drop("_features_raw", "_features")
        )
    mean_x = sum(F.col(f"_px_{m.fold}") for m in models) / float(n)
    mean_y = sum(F.col(f"_py_{m.fold}") for m in models) / float(n)
    px = F.col("baseline_x") + mean_x
    py = F.col("baseline_y") + mean_y
    if clip_bounds:
        px = F.greatest(F.lit(0.0), F.least(F.lit(120.0), px))
        py = F.greatest(F.lit(0.0), F.least(F.lit(53.3), py))
    out = out.withColumn("pred_x", px).withColumn("pred_y", py)
    return out.drop(*[c for c in out.columns if c.startswith("_p")])


def weighted_average(preds: dict[str, DataFrame], weights: dict[str, float], keys: list[str]) -> DataFrame:
    """M7 — fixed-weight model averaging (main_cuda.py:85-90):
    pred = Σ w_m · pred_m, joined on the row key."""
    total = sum(weights.values())
    it = iter(preds.items())
    name0, df0 = next(it)
    out = df0.select(*keys, F.col("pred_x").alias(f"px_{name0}"), F.col("pred_y").alias(f"py_{name0}"))
    names = [name0]
    for name, df in it:
        out = out.join(
            df.select(*keys, F.col("pred_x").alias(f"px_{name}"), F.col("pred_y").alias(f"py_{name}")),
            keys,
        )
        names.append(name)
    wx = sum(F.col(f"px_{n}") * F.lit(weights[n] / total) for n in names)
    wy = sum(F.col(f"py_{n}") * F.lit(weights[n] / total) for n in names)
    return out.withColumn("pred_x", wx).withColumn("pred_y", wy)


def save_models(models: list[FoldModel], path: str) -> None:
    """S5 — model sink (main_cuda.py:1544-1559 pickle bundle →
    MLlib native persistence): one directory per fold per target."""
    for fm in models:
        fm.model_x.write().overwrite().save(f"{path}/fold{fm.fold}/x")
        fm.model_y.write().overwrite().save(f"{path}/fold{fm.fold}/y")


def load_models(path: str, k: int) -> list[FoldModel]:
    """S5 — model source (main_cuda.py:1483-1488 pickle load)."""
    return [
        FoldModel(
            fold,
            PipelineModel.load(f"{path}/fold{fold}/x"),
            PipelineModel.load(f"{path}/fold{fold}/y"),
        )
        for fold in range(k)
    ]


def ridge_stack(
    oof: DataFrame, meta_cols: list[str], label: str, reg: float = 1.0
) -> PipelineModel:
    """M6 — Ridge meta-learner on OOF meta-features
    (main_cuda.py:1298-1310): LinearRegression(regParam=1, elasticNet=0)."""
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=meta_cols, outputCol="_meta", handleInvalid="keep"),
            LinearRegression(
                featuresCol="_meta",
                labelCol=label,
                predictionCol=f"stack_{label}",
                regParam=reg,
                elasticNetParam=0.0,
            ),
        ]
    )
    return pipe.fit(oof)
