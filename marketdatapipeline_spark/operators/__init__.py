"""Relational operators Spark lacks natively, built as compositions
of DataFrame primitives (never driver loops, never cross products):

- :func:`asof_join` — point-in-time join (trades -> latest quote);
- :func:`sessionize` — gap-based session assignment;
- :func:`rollup_bars` — multi-granularity OHLCV rollup;
- :func:`point_in_interval_join` — bin-bucketed range join;
- :func:`anchored_vwap` — day/week/month-anchored running VWAP;
- :func:`resample_ffill` — dense calendar grid with forward fill;
- :func:`salted_collect_list` / :func:`salted_join_left_hot` — skew
  mitigation for holistic aggregates and hot-key joins.
"""

from marketdatapipeline_spark.operators.asof import asof_join
from marketdatapipeline_spark.operators.range_join import point_in_interval_join
from marketdatapipeline_spark.operators.resample import resample_ffill
from marketdatapipeline_spark.operators.rollup import rollup_bars
from marketdatapipeline_spark.operators.vwap import anchored_vwap
from marketdatapipeline_spark.operators.salting import (
    salted_collect_list,
    salted_join_left_hot,
)
from marketdatapipeline_spark.operators.sessions import sessionize

__all__ = [
    "anchored_vwap",
    "asof_join",
    "point_in_interval_join",
    "resample_ffill",
    "rollup_bars",
    "salted_collect_list",
    "salted_join_left_hot",
    "sessionize",
]
