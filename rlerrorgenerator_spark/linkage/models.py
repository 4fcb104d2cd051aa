"""Trainable pairwise match classifiers (MLlib).

Reference: ``build_model`` trains caret RF / svmRadial / svmLinear and a
keras NN over the 23-feature vectors, 10-fold CV, then thresholds the
match probability at 0.5 (`/root/reference/benchmarking/utils.R:916-995,
362-364,1006`; `standard_n.R:125-188`). The capability preserved here:
probability-emitting classifiers over metric_* features with the same
0.5 decision rule — as Spark MLlib pipelines (distributed training, no
driver-side collect). The deterministic weighted scorer
(features.add_match_prob) remains the default engine path; these models
are the trainable option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_match_model(train: DataFrame, feature_cols: list[str],
                      label_col: str = "label", model: str = "logreg",
                      seed: int = 42):
    """Fit an MLlib pipeline: impute-0 → assemble → scale → classifier.

    ``model``: 'logreg' | 'rf' (mirrors the reference's linear-SVM-ish /
    RF pair; `medianImpute` becomes fill-0 on z-scaled features,
    `utils.R:929-934` fill_na_0).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression, RandomForestClassifier
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    prepared = train.fillna(0.0, subset=feature_cols).withColumn(
        "__label", F.col(label_col).cast("double")
    )
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="__raw")
    scaler = StandardScaler(inputCol="__raw", outputCol="__features",
                            withMean=False, withStd=True)
    if model == "rf":
        clf = RandomForestClassifier(
            featuresCol="__features", labelCol="__label",
            numTrees=50, maxDepth=8, seed=seed,  # caret grid ntree=350 shrunk
            probabilityCol="probability",
        )
    else:
        clf = LogisticRegression(
            featuresCol="__features", labelCol="__label", maxIter=50,
            probabilityCol="probability",
        )
    return Pipeline(stages=[assembler, scaler, clf]).fit(prepared)


def predict_match_prob(model, pairs: DataFrame, feature_cols: list[str],
                       threshold: float = 0.5) -> DataFrame:
    """Attach ``match_prob`` (P(match)) + ``prediction`` at the
    reference's 0.5 rule (`utils.R:362-364`)."""
    from pyspark.ml.functions import vector_to_array

    prepared = pairs.fillna(0.0, subset=feature_cols)
    scored = model.transform(prepared)
    return (
        scored.withColumn("match_prob", vector_to_array("probability")[1])
        .withColumn("prediction", (F.col("match_prob") > threshold))
        .drop("__raw", "__features", "probability", "rawPrediction")
    )
