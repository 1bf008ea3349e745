"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over japanstockdatapipeline_spark.plans — the registry is
the single source of truth binding each operator from SURVEY.md §2
to its Spark plan and DuckDB oracle.

Registry structure: 50 registered queries, of which 16 are feature
PANELS (plans/panels.py) — full-outer joins of same-grain member
queries (92 members as of round 6 — `len(all_members())` is the live
count — each with its own oracle, individually verified
by tests/test_oracle.py and tools/verify_local.py). Panels exist so
every operator's values hash into one of the driver's checked rows;
COVERAGE.md maps SURVEY §2 items to their binding query or member.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from japanstockdatapipeline_spark.plans import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary — A1 scan+agg) on sf0.001."""
    from japanstockdatapipeline_spark.plans.core import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
