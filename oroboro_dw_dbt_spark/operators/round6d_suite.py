"""Round-6 seventh wave: distributed BPE tokenizer training.

Two entries over ``text/bpe.py``:

- ``t_bpe_train`` — the learned merge table itself: 10 BPE merge
  rules (step, lhs, rhs, merged, pair_count) from the documents
  corpus. The heavy pass is ONE ``groupBy(word)`` shuffle; the merge
  loop then runs on the KB-scale word-type table (Heaps' law keeps it
  MB-scale even at 100 TB), each step a tiny job whose argmax row IS
  the learned state.
- ``t_bpe_encode`` — the corpus re-tokenized with those rules: top-15
  BPE tokens by corpus frequency. Certifies that applying the learned
  merges to the full corpus (the encode side of a tokenizer) matches
  an independent engine end-to-end.

The DuckDB oracle replays the identical algorithm as an UNROLLED
chain of MATERIALIZED CTEs — one (pairs → argmax → re-segment) block
per merge step, the same equal-cap pattern the k-core entry uses for
iterative fixpoints (MATERIALIZED defeats DuckDB's exponential CTE
inlining). Greedy re-segmentation is a ``list_reduce`` fold that is
semantically byte-identical to the Spark ``F.aggregate`` fold
(text/bpe.py:apply_merge). Everything is strings and exact integers —
no float hazard anywhere.

House rules as everywhere (operators/catalog.py): explicit
lexicographic tie-break on the argmax pair, identical aliases both
engines. The reference (3 BigQuery models, models/marts/core/*.sql)
has no tokenizer surface; SURVEY §6 scopes this family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.text import bpe

_TOPK_TOKENS = 15


def _oracle_prefix(n_merges: int) -> str:
    """WITH-chain: word counts, base segmentation, then one
    (pairs p{k} → argmax b{k} → re-segment s{k}) block per merge."""
    parts = [
        """WITH w AS MATERIALIZED (
  SELECT w AS word, count(*) AS freq FROM (
    SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents) t
  WHERE w <> '' GROUP BY w
),
s0 AS MATERIALIZED (
  SELECT word, freq,
         array_to_string(string_split(word, '') || ['</w>'], ' ') AS s
  FROM w
)"""
    ]
    for k in range(1, n_merges + 1):
        prev = f"s{k - 1}"
        parts.append(
            f""",
p{k} AS MATERIALIZED (
  WITH t AS (SELECT freq, string_split(s, ' ') AS L FROM {prev})
  SELECT L[i] AS l, L[i + 1] AS r, sum(freq) AS cnt
  FROM t, unnest(range(1, len(L))) AS u(i)
  GROUP BY 1, 2
),
b{k} AS MATERIALIZED (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
s{k} AS MATERIALIZED (
  SELECT word, freq, list_reduce(string_split(s, ' '), (acc, x) -> CASE
    WHEN x = bb.r AND (acc = bb.l
                       OR right(acc, length(bb.l) + 1) = ' ' || bb.l)
    THEN acc || x ELSE acc || ' ' || x END) AS s
  FROM {prev} CROSS JOIN b{k} bb
)"""
        )
    return "".join(parts)


def _train_oracle(n_merges: int) -> str:
    steps = "\nUNION ALL ".join(
        f"SELECT {k} AS step, l AS lhs, r AS rhs, l || r AS merged,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return f"{_oracle_prefix(n_merges)}\nSELECT * FROM ({steps})"


def _encode_oracle(n_merges: int, topk: int) -> str:
    return f"""{_oracle_prefix(n_merges)},
tok AS (
  WITH t AS (SELECT freq, string_split(s, ' ') AS L FROM s{n_merges})
  SELECT L[i] AS token, CAST(sum(freq) AS BIGINT) AS corpus_count
  FROM t, unnest(range(1, len(L) + 1)) AS u(i)
  GROUP BY 1
)
SELECT token, corpus_count, rnk FROM (
  SELECT token, corpus_count,
         CAST(row_number() OVER (ORDER BY corpus_count DESC, token) AS INT) AS rnk
  FROM tok
) WHERE rnk <= {topk}"""


@query(
    "t_bpe_train",
    oracle=_train_oracle(bpe.N_MERGES),
    survey_ref="beyond-reference: distributed BPE vocabulary learning — "
    "one corpus groupBy(word) pass, then a merge loop over the KB-scale "
    "type table; unrolled MATERIALIZED-CTE oracle",
)
def t_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn 10 BPE merges from documents; return the merge table.

    Scale: the corpus is touched exactly once (word-type groupBy);
    every subsequent job runs on the localCheckpointed type table
    (31 rows here; MB-scale for natural language at any corpus size).
    The per-step driver transfer is ONE row — the argmax pair — which
    is the learned artifact itself, not data movement. See
    text/bpe.py for the fold-based greedy re-segmentation kernel."""
    merges = bpe.learn_merges(bpe.word_counts(spark, sf_dir))
    rows = [
        (k + 1, lhs, rhs, lhs + rhs, cnt)
        for k, (lhs, rhs, cnt) in enumerate(merges)
    ]
    schema = T.StructType(
        [
            T.StructField("step", T.IntegerType()),
            T.StructField("lhs", T.StringType()),
            T.StructField("rhs", T.StringType()),
            T.StructField("merged", T.StringType()),
            T.StructField("pair_count", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


@query(
    "t_bpe_encode",
    oracle=_encode_oracle(bpe.N_MERGES, _TOPK_TOKENS),
    survey_ref="beyond-reference: BPE encode — learned merges applied "
    "back over the corpus, top-15 token census; certifies the encode "
    "side of the tokenizer end-to-end",
)
def t_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-tokenize the corpus with the learned merges; top-15 tokens.

    The encode pass reuses the training loop's final materialized
    segmentation table (word, freq, s) — one merge applied per step,
    never a re-derived nested fold (see text/bpe.py:train on why) —
    then an explode + weighted integer sum gives the token census.
    On a cluster the merge rules ship as literals inside the plan —
    the exact analogue of broadcasting a tokenizer's merge file."""
    _merges, seg = bpe.train(bpe.word_counts(spark, sf_dir))
    toks = (
        seg.select("freq", F.explode(F.split("s", " ")).alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("corpus_count"))
    )
    w = Window.orderBy(F.desc("corpus_count"), "token")
    return (
        toks.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TOPK_TOKENS)
        .select("token", "corpus_count", "rnk")
    )
