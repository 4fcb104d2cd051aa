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

    ``model`` mirrors the reference's caret family
    (`utils.R:916-995`): 'rf' (RF), 'svm_linear' (LinearSVC ≈ svmLinear),
    'mlp' (MultilayerPerceptron ≈ the keras NN at
    `paper_flow_dob_latest.Rmd:209-292`), 'logreg' (probability-emitting
    linear default; `medianImpute` becomes fill-0 on z-scaled features,
    `utils.R:929-934` fill_na_0). svmRadial has no MLlib kernel-SVM
    equivalent — the MLP covers the non-linear slot.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import (
        LinearSVC,
        LogisticRegression,
        MultilayerPerceptronClassifier,
        RandomForestClassifier,
    )
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    if model not in ("logreg", "rf", "svm_linear", "mlp"):
        raise ValueError(f"unknown model {model!r}: "
                         "use logreg | rf | svm_linear | mlp")
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
    elif model == "svm_linear":
        clf = LinearSVC(featuresCol="__features", labelCol="__label",
                        maxIter=50, regParam=0.01)
    elif model == "mlp":
        # input layer = |features|; two hidden layers like the keras NN
        # (`paper_flow_dob_latest.Rmd:209-292` dense 32/16)
        clf = MultilayerPerceptronClassifier(
            featuresCol="__features", labelCol="__label",
            layers=[len(feature_cols), 32, 16, 2], maxIter=100, seed=seed,
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
    if "probability" in scored.columns:
        prob = vector_to_array("probability")[1]
    else:
        # margin classifiers (LinearSVC): squash the decision margin
        # through a sigmoid (Platt-style, unit scale) so the 0.5 rule
        # coincides with the sign of the margin
        margin = vector_to_array("rawPrediction")[1]
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return (
        scored.withColumn("match_prob", prob)
        .withColumn("prediction", (F.col("match_prob") > threshold))
        .drop("__raw", "__features", "probability", "rawPrediction",
              "prediction_raw")
    )
