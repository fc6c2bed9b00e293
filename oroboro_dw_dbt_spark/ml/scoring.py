"""Arrow-batched model inference over DataFrame columns.

The production shape this certifies: a trained quality/toxicity/reward
classifier scoring a 100 TB corpus. The model itself is whatever runs
inside the kernel (sklearn predict, ONNX session, a torch module); what
Spark owns — and what this module pins down — is the plumbing:

- features are computed JVM-side as Column expressions (cheap, fused
  into the scan) and only the numeric feature matrix crosses into
  Python via Arrow;
- the kernel scores a whole Arrow batch with one vectorized call
  (here: numpy matmul + sigmoid — a deterministic stand-in with the
  exact same batch shape as a real model's ``predict``);
- output is (id columns, score) — no payload columns ride along, so
  the shuffle after scoring carries scores, not text.

Row-local ⇒ no shuffle at all; the scoring stage pipelines behind
whatever scan/filter precedes it. Batch size is Arrow's
``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10k) — the
knob that trades kernel-call overhead against peak memory at real
model sizes.

The linear-sigmoid stand-in is oracle-checkable: the SQL twin restates
``round(1/(1+exp(-(w·x+b))), 6)`` and the driver hash-matches it —
certifying the Arrow roundtrip end-to-end (dtype, null, and batching
behavior), which is precisely the part a real deployment gets wrong.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame


def batch_score(
    df: DataFrame,
    id_cols: Sequence[str],
    feature_cols: Sequence[str],
    weights: Sequence[float],
    bias: float,
    out: str = "score",
) -> DataFrame:
    """Score each row as sigmoid(features · weights + bias), computed
    per Arrow batch with one numpy matmul. Returns (id_cols..., out).

    Feature columns must be numeric; compute them JVM-side first
    (pure Column expressions) so Python sees only the feature matrix.
    Scores are rounded to 6 decimals — the repo-wide cross-engine
    float contract (catalog.py).
    """
    import numpy as np
    import pandas as pd

    from oroboro_dw_dbt_spark.functions.rounding import np_round_half_up

    if len(weights) != len(feature_cols):
        raise ValueError(
            f"{len(feature_cols)} feature cols but {len(weights)} weights"
        )
    w = np.asarray(weights, dtype=np.float64)
    b = float(bias)
    ids = list(id_cols)
    feats = list(feature_cols)
    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in ids
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = pdf[feats].to_numpy(dtype=np.float64)
            # HALF_UP like the SQL twin's round() — np.round is banker's
            score = np_round_half_up(1.0 / (1.0 + np.exp(-(x @ w + b))))
            out_pdf = pdf[ids].copy()
            out_pdf[out] = score
            yield out_pdf

    return df.select(*ids, *feats).mapInPandas(kernel, f"{id_schema}, {out} double")
