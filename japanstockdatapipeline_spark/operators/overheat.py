"""Overheat stage-transition machine (SURVEY §2.5 W22 completion).

The reference stores a per-security `stage` enum
('none','early','riding','climax','unwind') with a `stage_since`
date that "does not move while hysteresis holds the stage"
(00120_create_overheat_tables.sql:94-95, stage_since comment) and a
transition-event log with a from<>to constraint (00120:overheat_
stage_event). The migration deliberately keeps thresholds in batch
code, so the ladder here is the engine's documented calibration — a
Schmitt-trigger per band (enter high / exit low) over the W22 heat
score in [0, 1]:

  enter climax  h >= 0.8   hold while h >= 0.7, else -> unwind
  enter riding  h >= 0.6   hold while h >= 0.5
  enter early   h >= 0.4   hold while h >= 0.3
  unwind        entered only by falling out of climax; holds until
                h >= 0.8 (re-climax) or h < 0.3 (-> none; after the
                washout a new cycle starts from 'none')

Execution shape: applyInPandas per entity key — the same sanctioned
recursive-family path as EMA/RSI (operators/smoothers.py): one
shuffle on the key, then an O(n) state walk per group; per-key
histories are thousands of rows even at 100 TB total. The DuckDB
oracle replays the identical machine as a RECURSIVE CTE, so the
enum, stage_since, and the transition column are value-checked.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["overheat_stages", "OVERHEAT_THRESHOLDS"]

# (climax_in, climax_out, riding_in, riding_out, early_in, early_out)
OVERHEAT_THRESHOLDS = (0.8, 0.7, 0.6, 0.5, 0.4, 0.3)


def _step(prev: str, h: float, th=OVERHEAT_THRESHOLDS) -> str:
    c_in, c_out, r_in, r_out, e_in, e_out = th
    if prev == "climax":
        return "climax" if h >= c_out else "unwind"
    if prev == "unwind":
        if h >= c_in:
            return "climax"
        if h < e_out:
            return "none"
        return "unwind"
    if prev == "riding":
        if h >= c_in:
            return "climax"
        if h >= r_out:
            return "riding"
        if h >= e_out:
            return "early"
        return "none"
    if prev == "early":
        if h >= c_in:
            return "climax"
        if h >= r_in:
            return "riding"
        if h >= e_out:
            return "early"
        return "none"
    # none (also the entry rule for the first observation)
    if h >= c_in:
        return "climax"
    if h >= r_in:
        return "riding"
    if h >= e_in:
        return "early"
    return "none"


def overheat_stages(
    scored: DataFrame,
    key_col: str,
    order_col: str,
    heat_col: str,
) -> DataFrame:
    """Attach (stage, stage_from, stage_since) to a per-(key, period)
    heat-score frame.

    - `stage`: the machine state after observing this period's heat.
    - `stage_from`: the PREVIOUS stage when this row is a transition,
      NULL otherwise — exactly the overheat_stage_event rows
      (from <> to; the first observation is state, not a transition).
    - `stage_since`: the `order_col` value at which the current stage
      was entered; unchanged while hysteresis holds the stage
      (00120:94-95).
    """
    clash = {"stage", "stage_from", "stage_since"} & set(scored.columns)
    if clash:
        raise ValueError(
            f"overheat_stages output columns {sorted(clash)} already exist "
            "on the input frame; rename or drop them first"
        )
    schema_str = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in scored.schema.fields)
        + ", stage string, stage_from string"
        + f", stage_since {scored.schema[order_col].dataType.simpleString()}"
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        heats = pdf[heat_col].to_list()
        orders = pdf[order_col].to_list()
        stages, froms, sinces = [], [], []
        prev, since = "none", None
        for i, h in enumerate(heats):
            # NULL/NaN heat = no observation: hold the stage, no
            # transition, stage_since unchanged. Without this guard
            # NaN compares False everywhere, silently stepping e.g.
            # climax -> unwind, and a None (object dtype) raises.
            # (The registered pipeline never feeds NULLs — the heat
            # score null-renormalizes — so the oracle needs no
            # matching rule; this protects direct API use.)
            cur = prev if (h is None or pd.isna(h)) else _step(prev, h)
            if i == 0:
                froms.append(None)
                since = orders[0]
            elif cur != prev:
                froms.append(prev)
                since = orders[i]
            else:
                froms.append(None)
            stages.append(cur)
            sinces.append(since)
            prev = cur
        pdf["stage"] = stages
        pdf["stage_from"] = froms
        pdf["stage_since"] = sinces
        return pdf

    return scored.groupBy(key_col).applyInPandas(compute, schema=schema_str)
