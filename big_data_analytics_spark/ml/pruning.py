"""Exact cost-complexity (weakest-link) pruning for MLlib decision
trees — the reference's ``ccp_alpha`` semantics
(/root/reference/BasicsDecisionTree.ipynb:807-840: sklearn
``cost_complexity_pruning_path`` + ``GridSearchCV(ccp_alpha=...)``),
which MLlib does not ship. Round 1-2 approximated it with a maxDepth
CV grid (ml/trees.py:grid_search_cv, sanctioned by SURVEY §2.9 M7);
this module closes the gap with the actual Breiman et al. algorithm.

Scale split (same contract as every fit in ml/):

- **Tree fits are distributed** (MLlib DecisionTree over the full
  DataFrame / train folds).
- **The pruning path is computed driver-side over the fitted model**,
  which is KB-scale (node count ≤ 2^depth) — model structure, not
  data. R(t) uses the training-weighted impurities MLlib already
  stored in each node, so no extra pass over the data is needed.
- **Scoring a pruned tree is a pure column expression**: the tree
  compiles to nested ``CASE WHEN feature <= threshold`` — JVM-side,
  whole-stage-codegen, no UDF. One evaluation pass scores *every*
  candidate alpha simultaneously (one column per alpha, one
  aggregate), so k-fold CV over A alphas costs k fits + k passes,
  never k·A jobs.

Algorithm (Breiman, Friedman, Olshen & Stone 1984, ch. 3): for an
internal node t with subtree T_t,

    g(t) = (R(t) − R(T_t)) / (|leaves(T_t)| − 1)

where R is the training-sample risk n_t/N · impurity(t). Repeatedly
collapsing the minimum-g node yields the nested sequence of optimally
pruned subtrees; pruning at alpha collapses every node with
g(t) ≤ alpha (sklearn's ``ccp_alpha`` convention).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import DecisionTreeRegressor
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class PrunedTree:
    """Driver-side tree mirror (KB-scale), prunable and compilable to
    a column expression."""
    prediction: float
    impurity: float
    count: float
    feature: Optional[int] = None      # None → leaf
    threshold: Optional[float] = None
    left: Optional["PrunedTree"] = None
    right: Optional["PrunedTree"] = None

    @property
    def is_leaf(self) -> bool:
        return self.feature is None

    def n_leaves(self) -> int:
        if self.is_leaf:
            return 1
        return self.left.n_leaves() + self.right.n_leaves()


def extract_tree(model) -> PrunedTree:
    """Mirror a fitted MLlib DecisionTree{Regressor,Classifier} model
    into a :class:`PrunedTree` (py4j walk over the model's node
    objects — model structure, never data). Continuous splits only;
    MLlib categorical splits would need feature metadata this engine
    does not use."""
    def walk(jnode) -> PrunedTree:
        cls = jnode.getClass().getSimpleName()
        count = float(jnode.impurityStats().count())
        if cls == "LeafNode":
            return PrunedTree(float(jnode.prediction()),
                              float(jnode.impurity()), count)
        split = jnode.split()
        if split.getClass().getSimpleName() != "ContinuousSplit":
            raise ValueError("only continuous splits are supported")
        return PrunedTree(
            float(jnode.prediction()), float(jnode.impurity()), count,
            feature=int(split.featureIndex()),
            threshold=float(split.threshold()),
            left=walk(jnode.leftChild()),
            right=walk(jnode.rightChild()),
        )

    return walk(model._call_java("rootNode"))


def _leaf_id_expr(tree: PrunedTree, features: list[str]):
    """Column assigning each row its (in-order) leaf index."""
    def build(node: PrunedTree, nid: int):
        if node.is_leaf:
            return F.lit(nid), nid + 1
        le, nid = build(node.left, nid)
        re_, nid = build(node.right, nid)
        return F.when(F.col(features[node.feature]) <= node.threshold,
                      le).otherwise(re_), nid
    return build(tree, 0)


def refresh_stats(tree: PrunedTree, df: DataFrame,
                  features: list[str], label: str) -> PrunedTree:
    """Replace the mirrored node stats with exact training stats.

    MLlib stores an ``impurity = -1.0`` sentinel on leaves whose stats
    were never finalized during training, which would corrupt the risk
    bookkeeping. One distributed aggregate computes (n, mean, var_pop)
    per leaf — the routing is the compiled CASE WHEN expression, so the
    pass is whole-stage codegen and only |leaves| rows reach the
    driver — and internal nodes pool their children exactly (parallel
    variance formula). Mutates ``tree`` in place and returns it."""
    expr, _ = _leaf_id_expr(tree, features)
    rows = (df.select(expr.alias("__leaf"), F.col(label).alias("__y"))
            .groupBy("__leaf")
            .agg(F.count(F.lit(1)).alias("n"), F.avg("__y").alias("m"),
                 F.var_pop("__y").alias("v"))
            .collect())
    stats = {r["__leaf"]: (float(r["n"]), float(r["m"]),
                           float(r["v"] or 0.0)) for r in rows}

    def walk(node: PrunedTree, nid: int) -> int:
        if node.is_leaf:
            node.count, node.prediction, node.impurity = stats.get(
                nid, (0.0, node.prediction, 0.0))
            return nid + 1
        nid = walk(node.left, nid)
        nid = walk(node.right, nid)
        l, r = node.left, node.right
        n = l.count + r.count
        if n > 0:
            m = (l.count * l.prediction + r.count * r.prediction) / n
            node.impurity = (
                l.count * (l.impurity + (l.prediction - m) ** 2)
                + r.count * (r.impurity + (r.prediction - m) ** 2)) / n
            node.count, node.prediction = n, m
        return nid

    walk(tree, 0)
    return tree


def _subtree_risk(node: PrunedTree, n_total: float) -> float:
    """R(T_t): summed leaf risks of the subtree rooted at ``node``."""
    if node.is_leaf:
        return node.count / n_total * node.impurity
    return (_subtree_risk(node.left, n_total)
            + _subtree_risk(node.right, n_total))


def _weakest_link(node: PrunedTree, n_total: float):
    """(min g(t), node) over internal nodes of ``node``'s subtree."""
    if node.is_leaf:
        return float("inf"), None
    own_r = node.count / n_total * node.impurity
    g = ((own_r - _subtree_risk(node, n_total))
         / max(node.n_leaves() - 1, 1))
    best, best_node = g, node
    for child in (node.left, node.right):
        cg, cn = _weakest_link(child, n_total)
        if cg < best:
            best, best_node = cg, cn
    return best, best_node


def _copy(node: PrunedTree) -> PrunedTree:
    if node.is_leaf:
        return PrunedTree(node.prediction, node.impurity, node.count)
    return PrunedTree(node.prediction, node.impurity, node.count,
                      node.feature, node.threshold,
                      _copy(node.left), _copy(node.right))


def _collapse(node: PrunedTree) -> None:
    node.feature = node.threshold = node.left = node.right = None


def cost_complexity_pruning_path(tree: PrunedTree):
    """The sklearn-shaped path: (ccp_alphas, impurities) — effective
    alpha at each weakest-link collapse and the training risk of the
    corresponding pruned tree, ending at the root-only tree."""
    t = _copy(tree)
    n_total = t.count
    alphas = [0.0]
    risks = [_subtree_risk(t, n_total)]
    while not t.is_leaf:
        g, node = _weakest_link(t, n_total)
        _collapse(node)
        alphas.append(g)
        risks.append(_subtree_risk(t, n_total))
    return alphas, risks


def prune_at_alpha(tree: PrunedTree, alpha: float) -> PrunedTree:
    """Smallest optimally-pruned subtree for ``alpha``: collapse while
    the weakest link's g(t) ≤ alpha (sklearn ``ccp_alpha``)."""
    t = _copy(tree)
    n_total = t.count
    while not t.is_leaf:
        g, node = _weakest_link(t, n_total)
        if g > alpha:
            break
        _collapse(node)
    return t


def tree_predict_expr(tree: PrunedTree, features: list[str]) -> Column:
    """Compile the tree to a nested CASE WHEN column — the pruned
    model's whole scoring path stays inside whole-stage codegen."""
    if tree.is_leaf:
        return F.lit(float(tree.prediction))
    return F.when(
        F.col(features[tree.feature]) <= tree.threshold,
        tree_predict_expr(tree.left, features),
    ).otherwise(tree_predict_expr(tree.right, features))


def _pruned_leaf_predictions(orig: PrunedTree,
                             pruned: PrunedTree) -> list[float]:
    """For each leaf of ``orig`` (in-order), the prediction the
    ``pruned`` subtree assigns its rows. Pruning only merges leaves,
    so a pruned tree's prediction is a pure function of the unpruned
    leaf id — the key to scoring many alphas from ONE tree routing."""
    out: list[float] = []

    def walk(o: PrunedTree, p: PrunedTree) -> None:
        if p.is_leaf:
            def fill(n: PrunedTree) -> None:
                if n.is_leaf:
                    out.append(p.prediction)
                else:
                    fill(n.left)
                    fill(n.right)
            fill(o)
        else:
            walk(o.left, p.left)
            walk(o.right, p.right)

    walk(orig, pruned)
    return out


#: Candidate-alpha grid cap: bounds per-fold scoring width (and the
#: lookup-table size) regardless of how deep the unpruned tree grew.
MAX_ALPHA_GRID = 24


def cv_ccp_prune(df: DataFrame, features: list[str], label: str,
                 max_depth: int = 8, k: int = 3, seed: int = 17,
                 alphas: Optional[list[float]] = None):
    """The reference's GridSearchCV(ccp_alpha) + KFold, Spark-first.

    1. Fit one deep tree on the full data (distributed); its pruning
       path supplies the candidate alphas (geometric midpoints of
       consecutive path alphas — sklearn's recommended grid,
       subsampled to ``MAX_ALPHA_GRID``) unless ``alphas`` is given.
    2. Deterministic hash folds (membership is a pure row function —
       stable across reruns/partitionings, no RNG shuffle).
    3. Per fold: one distributed tree fit on the train side, then ONE
       validation pass scoring every alpha simultaneously. The tree
       routes each row to its unpruned leaf id (one compiled CASE
       WHEN); a broadcast |leaves|×|alphas| lookup table maps leaf id
       → each alpha's pruned prediction. Compiling every pruned tree
       as its own expression instead would explode generated code
       (Spark splits huge codegen into nested classes, with known
       JDK17 access failures) — the lookup join keeps codegen one
       tree + one join wide, whatever the grid size.
    4. Return the full-data tree pruned at the best-mean-MSE alpha.

    Returns (pruned PrunedTree, best_alpha, {alpha: mean_cv_mse}).
    """
    assembler = VectorAssembler(inputCols=features, outputCol="__f")

    def fit_tree(data: DataFrame) -> PrunedTree:
        m = DecisionTreeRegressor(featuresCol="__f", labelCol=label,
                                  maxDepth=max_depth, seed=seed) \
            .fit(assembler.transform(data))
        # exact stats pass: MLlib leaves can carry sentinel impurities
        return refresh_stats(extract_tree(m), data, features, label)

    full_tree = fit_tree(df)
    if alphas is None:
        path, _ = cost_complexity_pruning_path(full_tree)
        # geometric midpoints between consecutive effective alphas
        alphas = [0.0] + [
            (path[i] * path[i + 1]) ** 0.5
            for i in range(1, len(path) - 1)
            if path[i] > 0 and path[i + 1] > path[i]
        ]
        if len(alphas) > MAX_ALPHA_GRID:
            step = len(alphas) / MAX_ALPHA_GRID
            alphas = [alphas[int(i * step)] for i in range(MAX_ALPHA_GRID)]

    spark = df.sparkSession
    fold = F.pmod(F.xxhash64(*[F.col(c) for c in features],
                             F.col(label), F.lit(seed)), F.lit(k))
    tagged = df.withColumn("__fold", fold)

    sums = {a: 0.0 for a in alphas}
    counts = {a: 0.0 for a in alphas}
    for i in range(k):
        train = tagged.filter(F.col("__fold") != i)
        val = tagged.filter(F.col("__fold") == i)
        t = fit_tree(train)
        leaf_expr, n_leaves = _leaf_id_expr(t, features)
        preds = [_pruned_leaf_predictions(t, prune_at_alpha(t, a))
                 for a in alphas]
        lookup = spark.createDataFrame(
            [(lid, *[preds[j][lid] for j in range(len(alphas))])
             for lid in range(n_leaves)],
            ", ".join(["__leaf int"]
                      + [f"__p{j} double" for j in range(len(alphas))]),
        )
        scored = (val.select(leaf_expr.alias("__leaf"),
                             F.col(label).alias("__y"))
                  .join(F.broadcast(lookup), "__leaf"))
        row = scored.agg(
            *[F.sum(F.pow(F.col(f"__p{j}") - F.col("__y"), 2))
              .alias(f"__sse_{j}") for j in range(len(alphas))],
            F.count(F.lit(1)).alias("__n"),
        ).collect()[0]
        for j, a in enumerate(alphas):
            sums[a] += row[f"__sse_{j}"] or 0.0
            counts[a] += row["__n"]
    cv_mse = {a: sums[a] / counts[a] for a in alphas if counts[a]}
    best_alpha = min(cv_mse, key=lambda a: (cv_mse[a], -a))
    return prune_at_alpha(full_tree, best_alpha), best_alpha, cv_mse
