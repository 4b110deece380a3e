"""Tree ensembles + model selection (SURVEY.md §2.9 M7-M9, M14, M17):
decision trees, bagging/random forest, GBT, TF-IDF text pipeline,
cross-validated grid search.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import DecisionTreeClassifier, LogisticRegression
from pyspark.ml.evaluation import (
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.feature import (
    CountVectorizer,
    IDF,
    StopWordsRemover,
    Tokenizer,
    VectorAssembler,
)
from pyspark.ml.regression import (
    DecisionTreeRegressor,
    GBTRegressor,
    RandomForestRegressor,
)
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame


def decision_tree_classifier(df: DataFrame, features: list[str], label: str,
                             max_depth: int = 3, impurity: str = "entropy"):
    """Reference: DecisionTreeClassifier(criterion='entropy',
    max_depth=3), BasicsDecisionTree.ipynb:53."""
    assembler = VectorAssembler(inputCols=features, outputCol="__features")
    dt = DecisionTreeClassifier(featuresCol="__features", labelCol=label,
                                maxDepth=max_depth, impurity=impurity)
    model = dt.fit(assembler.transform(df))
    return model, lambda d: model.transform(assembler.transform(d))


def decision_tree_regressor(df: DataFrame, features: list[str], label: str,
                            max_depth: int = 3):
    assembler = VectorAssembler(inputCols=features, outputCol="__features")
    dt = DecisionTreeRegressor(featuresCol="__features", labelCol=label,
                               maxDepth=max_depth)
    model = dt.fit(assembler.transform(df))
    return model, lambda d: model.transform(assembler.transform(d))


def random_forest_regressor(df: DataFrame, features: list[str], label: str,
                            num_trees: int = 100,
                            feature_subset: str = "onethird",
                            seed: int = 0):
    """Reference: RandomForestRegressor(max_features=...) with
    feature_subset='all' reproducing *bagging*
    (BasicsDecisionTree.ipynb:2639-2737). Returns the model (with
    .featureImportances) + predict."""
    assembler = VectorAssembler(inputCols=features, outputCol="__features")
    rf = RandomForestRegressor(featuresCol="__features", labelCol=label,
                               numTrees=num_trees,
                               featureSubsetStrategy=feature_subset, seed=seed)
    model = rf.fit(assembler.transform(df))
    return model, lambda d: model.transform(assembler.transform(d))


def gbt_regressor(df: DataFrame, features: list[str], label: str,
                  max_iter: int = 50, step_size: float = 0.2,
                  max_depth: int = 3, seed: int = 0):
    """Reference: GradientBoostingRegressor(n_estimators, learning_rate,
    max_depth), BasicsDecisionTree.ipynb:2744-2806."""
    assembler = VectorAssembler(inputCols=features, outputCol="__features")
    gbt = GBTRegressor(featuresCol="__features", labelCol=label,
                       maxIter=max_iter, stepSize=step_size,
                       maxDepth=max_depth, seed=seed)
    model = gbt.fit(assembler.transform(df))
    return model, lambda d: model.transform(assembler.transform(d))


def tfidf_sentiment_pipeline(text_col: str = "text", label: str = "label",
                             vocab_size: int = 500) -> Pipeline:
    """Reference: TfidfVectorizer(max_features=500, stop_words='english')
    + LogisticRegression (data_mining_Assignment1.ipynb NLP section) as
    one MLlib Pipeline: Tokenizer → StopWordsRemover →
    CountVectorizer(vocabSize) → IDF → LogisticRegression."""
    return Pipeline(stages=[
        Tokenizer(inputCol=text_col, outputCol="__tokens"),
        StopWordsRemover(inputCol="__tokens", outputCol="__clean"),
        CountVectorizer(inputCol="__clean", outputCol="__tf",
                        vocabSize=vocab_size),
        IDF(inputCol="__tf", outputCol="__features"),
        LogisticRegression(featuresCol="__features", labelCol=label),
    ])


def grid_search_cv(df: DataFrame, features: list[str], label: str,
                   max_depths=(2, 3, 5), num_folds: int = 3,
                   regression: bool = True, seed: int = 0):
    """Reference: GridSearchCV(ccp_alpha grid) + KFold
    (BasicsDecisionTree.ipynb:807-840). MLlib has no cost-complexity
    pruning; this is the maxDepth-grid CrossValidator analogue
    (SURVEY §2.9 M7). For the reference's *exact* ccp_alpha
    weakest-link semantics use ``ml.pruning.cv_ccp_prune``. Returns
    (best_model, best_depth, avg_metrics_per_depth)."""
    assembler = VectorAssembler(inputCols=features, outputCol="__features")
    assembled = assembler.transform(df)
    if regression:
        est = DecisionTreeRegressor(featuresCol="__features", labelCol=label)
        ev = RegressionEvaluator(labelCol=label, metricName="rmse")
        param = est.maxDepth
    else:
        est = DecisionTreeClassifier(featuresCol="__features", labelCol=label)
        ev = MulticlassClassificationEvaluator(labelCol=label,
                                               metricName="accuracy")
        param = est.maxDepth
    grid = ParamGridBuilder().addGrid(param, list(max_depths)).build()
    cv = CrossValidator(estimator=est, estimatorParamMaps=grid, evaluator=ev,
                        numFolds=num_folds, seed=seed, parallelism=2)
    model = cv.fit(assembled)
    metrics = dict(zip(max_depths, model.avgMetrics))
    best_depth = model.bestModel.getMaxDepth()
    return model.bestModel, best_depth, metrics


def staged_gbt_error(df: DataFrame, features: list[str], label: str,
                     max_iter: int = 30, step_size: float = 0.2,
                     max_depth: int = 3, seed: int = 0) -> list[float]:
    """Per-iteration training error of a GBT fit (reference: the staged
    test-error curve, BasicsDecisionTree.ipynb:2744-2806) via
    ``evaluateEachIteration`` — one distributed pass per iteration over
    the ensemble prefix."""
    assembler = VectorAssembler(inputCols=features, outputCol="__features")
    assembled = assembler.transform(df)
    gbt = GBTRegressor(featuresCol="__features", labelCol=label,
                       maxIter=max_iter, stepSize=step_size,
                       maxDepth=max_depth, seed=seed)
    model = gbt.fit(assembled)
    return list(model.evaluateEachIteration(assembled, "squared"))


def one_vs_rest_classifier(df: DataFrame, features: list[str], label: str,
                           max_iter: int = 50):
    """Multiclass via one-vs-rest logistic models (reference: SVC
    decision_function_shape='ovo', SVM.ipynb:3337 — OVR is the
    documented MLlib substitute, SURVEY §2.9 M10)."""
    from pyspark.ml.classification import OneVsRest

    assembler = VectorAssembler(inputCols=features, outputCol="__features")
    base = LogisticRegression(featuresCol="__features", labelCol=label,
                              maxIter=max_iter)
    ovr = OneVsRest(classifier=base, featuresCol="__features", labelCol=label)
    model = ovr.fit(assembler.transform(df))
    return model, lambda d: model.transform(assembler.transform(d))
