"""Declarative data tests — the engine's version of dbt schema tests.

Each test compiles to a *violating-rows* DataFrame; the test passes iff
that DataFrame is empty — the exact contract dbt uses (SURVEY §3.2).
The two tests the reference declares (ref: models/marts/marts_schema.yml:6-15):

- ``not_null`` on ``user_base.user_id``
- ``dbt_utils.unique_combination_of_columns`` on
  ``[user_id, partner_id, site_id]``

plus the other staple dbt tests (``accepted_values``, ``relationship``)
so model authors have the standard vocabulary.

Scale note: every violation query is a single aggregation or anti-join —
map-side-combinable, AQE-coalesced; ``.limit(sample)`` keeps the
driver-side sample bounded no matter the table size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TestResult:
    name: str
    passed: bool
    n_violations: int
    sample: list | None = None


class DataTest:
    name: str = "test"

    def violations(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def run(self, df: DataFrame, sample: int = 5) -> TestResult:
        v = self.violations(df)
        rows = v.limit(sample + 1).collect()
        # cheap pass-path: only count precisely when there are violations
        n = len(rows) if len(rows) <= sample else v.count()
        return TestResult(
            name=self.name,
            passed=not rows,
            n_violations=n,
            sample=rows[:sample] or None,
        )


@dataclass
class not_null(DataTest):
    column: str

    def __post_init__(self) -> None:
        self.name = f"not_null({self.column})"

    def violations(self, df: DataFrame) -> DataFrame:
        return df.filter(F.col(self.column).isNull())


class unique_combination_of_columns(DataTest):
    """Grain uniqueness: ``GROUP BY cols HAVING count(*) > 1``."""

    def __init__(self, *columns: str) -> None:
        self.columns = columns
        self.name = f"unique_combination_of_columns({', '.join(columns)})"

    def violations(self, df: DataFrame) -> DataFrame:
        return (
            df.groupBy(*self.columns)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .filter(F.col("n_rows") > 1)
        )


@dataclass
class accepted_values(DataTest):
    column: str
    values: tuple
    allow_null: bool = True

    def __post_init__(self) -> None:
        self.name = f"accepted_values({self.column})"

    def violations(self, df: DataFrame) -> DataFrame:
        bad = ~F.col(self.column).isin(list(self.values))
        if self.allow_null:
            bad = bad & F.col(self.column).isNotNull()
        return df.filter(bad)


@dataclass
class relationship(DataTest):
    """FK integrity: every non-null ``column`` exists in ``to[to_column]``.

    Anti-join keeps it fully distributed; the referenced side is usually
    a dimension → broadcast under AQE.
    """

    column: str
    to: DataFrame
    to_column: str

    def __post_init__(self) -> None:
        self.name = f"relationship({self.column} → {self.to_column})"

    def violations(self, df: DataFrame) -> DataFrame:
        keys = self.to.select(F.col(self.to_column).alias(self.column)).distinct()
        return (
            df.filter(F.col(self.column).isNotNull())
            .join(keys, on=self.column, how="left_anti")
        )
