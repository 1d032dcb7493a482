"""Model-based document quality scoring (the learned filter tier).

Heuristic gates (``curation.quality_filter``) catch mechanical junk;
production corpus pipelines add a LEARNED tier — a lightweight linear
classifier over cheap text features, trained on a labeled sample and
applied to the whole corpus (the FastText/linear-probe pattern of
FineWeb/DCLM-style filtering).  This is that tier on Spark ML
primitives: tokenizer → hashing TF → logistic regression, trained on a
bounded labeled sample and applied as one distributed model transform.

100 TB shape: training touches only the labeled sample (thousands of
rows, one driver-coordinated L-BFGS run); scoring is a pure map —
feature hashing and the dot product run per-partition with the model
coefficients broadcast, no shuffle at all.  Scores are floats from a
distributed training loop, so correctness is pinned by invariant
pytest (separation on planted data, determinism of scoring given a
model), not a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 2^18 hashed features — small enough to broadcast, large enough that
#: token collisions don't blur a corpus-scale quality signal.
N_FEATURES = 1 << 18


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 1e-3,
):
    """Fit tokenizer→TF→LR on a labeled sample; returns a PipelineModel.

    ``label_col`` is 1.0 for keep-quality documents, 0.0 for junk.  The
    sample should be bounded (thousands of rows) — it is the only data
    the iterative optimizer ever sees.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol="__tokens",
        pattern="[^a-z0-9]+",
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__features", numFeatures=N_FEATURES
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(labeled)


def score_quality(
    docs: DataFrame,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained model corpus-wide: ``(id, quality_prob)``.

    Pure map — coefficients ride the closure, probability is
    ``sigmoid(w·x + b)`` per row; no shuffle, no iteration.
    """
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.select(id_col, text_col))
    return scored.select(
        F.col(id_col),
        vector_to_array(F.col("probability")).getItem(1).alias("quality_prob"),
    )
