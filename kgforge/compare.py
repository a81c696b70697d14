"""Quad-set P/R comparison (the correctness gate).

Equality on distinct (subject, predicate, value, datatype, language) — the
reference's Quad equality, which ignores dataset and context
(transform/Quad.scala:120-157). NULL datatype (IRI objects) is compared
null-safely."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .schema import QUAD_KEY


def _keyed(df: DataFrame) -> DataFrame:
    return df.select(
        "subject",
        "predicate",
        "value",
        F.coalesce(F.col("datatype"), F.lit("")).alias("datatype"),
        "language",
    ).distinct()


@dataclass
class PRResult:
    engine: int
    golden: int
    matched: int

    @property
    def precision(self) -> float:
        return self.matched / self.engine if self.engine else 0.0

    @property
    def recall(self) -> float:
        return self.matched / self.golden if self.golden else 0.0

    def __str__(self) -> str:  # pragma: no cover
        return (
            f"P={self.precision:.4f} R={self.recall:.4f} "
            f"(engine={self.engine} golden={self.golden} matched={self.matched})"
        )


def quad_pr(engine: DataFrame, golden: DataFrame) -> PRResult:
    e = _keyed(engine).cache()
    g = _keyed(golden).cache()
    matched = e.join(g, QUAD_KEY, "inner").count()
    return PRResult(engine=e.count(), golden=g.count(), matched=matched)


def diff_by_dataset(engine: DataFrame, golden: DataFrame):
    """(missing_df, extra_df) grouped by dataset — debugging aid."""
    ekeys = _keyed(engine)
    gkeys = _keyed(golden)
    gk = golden.withColumn("datatype", F.coalesce("datatype", F.lit("")))
    ek = engine.withColumn("datatype", F.coalesce("datatype", F.lit("")))
    missing = gk.join(ekeys, QUAD_KEY, "left_anti").groupBy("dataset").count()
    extra = ek.join(gkeys, QUAD_KEY, "left_anti").groupBy("dataset").count()
    return missing, extra
