"""Overheat stage machine (00120 stage/stage_since/stage_event
semantics): hysteresis holds, unwind path, washout restart."""

import pandas as pd

from japanstockdatapipeline_spark.operators.overheat import overheat_stages


def test_stage_machine_hysteresis_and_unwind(spark):
    heats = [0.45, 0.55, 0.65, 0.55, 0.85, 0.75, 0.72, 0.65, 0.25, 0.50, 0.85]
    rows = [("A", d, h) for d, h in enumerate(heats)]
    df = spark.createDataFrame(rows, "user_id string, day long, heat_score double")
    out = (
        overheat_stages(df, "user_id", "day", "heat_score")
        .orderBy("day")
        .collect()
    )
    got = [(r["stage"], r["stage_from"], r["stage_since"]) for r in out]
    assert got == [
        ("early", None, 0),      # 0.45 >= early_in
        ("early", None, 0),      # 0.55 < riding_in: holds (no upgrade)
        ("riding", "early", 2),  # 0.65 >= riding_in
        ("riding", None, 2),     # 0.55 >= riding_out: HYSTERESIS HOLD
                                 # (from 'none' 0.55 would only be early)
        ("climax", "riding", 4),  # 0.85 >= climax_in
        ("climax", None, 4),     # 0.75 >= climax_out: HOLD
        ("climax", None, 4),     # 0.72 >= climax_out: HOLD
        ("unwind", "climax", 7),  # 0.65 < climax_out -> unwind
        ("none", "unwind", 8),   # 0.25 < early_out: washout
        ("early", "none", 9),    # fresh cycle starts from none
        ("climax", "early", 10),  # jump entry straight to climax
    ]


def test_stage_machine_unwind_holds_mid_band(spark):
    # unwind persists through the riding band (no re-entry except
    # re-climax), then washes out
    heats = [0.9, 0.6, 0.65, 0.55, 0.2]
    df = spark.createDataFrame(
        [("A", d, h) for d, h in enumerate(heats)],
        "user_id string, day long, heat_score double",
    )
    out = overheat_stages(df, "user_id", "day", "heat_score").orderBy("day").collect()
    assert [r["stage"] for r in out] == ["climax", "unwind", "unwind", "unwind", "none"]
    assert [r["stage_since"] for r in out] == [0, 1, 1, 1, 4]


def test_stateful_stage_machine_equals_batch(spark, tmp_path):
    """The streaming stage machine (applyInPandasWithState, state
    carried across micro-batches) must emit exactly the batch
    operator's rows — both step the same _step transition function."""
    from japanstockdatapipeline_spark.streaming.jobs import (
        run_to_parquet,
        stateful_overheat_stages,
    )

    heats = [0.45, 0.55, 0.65, 0.55, 0.85, 0.75, 0.72, 0.65, 0.25, 0.50, 0.85]
    rows = [(u, d, h + (0.05 if u == 2 else 0.0)) for u in (1, 2) for d, h in enumerate(heats)]
    schema = "user_id long, day long, heat_score double"
    batch_df = spark.createDataFrame(rows, schema)

    # stage the stream as 3 day-range files; maxFilesPerTrigger=1
    # forces one micro-batch per file so state genuinely carries.
    # The file source orders batches by mtime: set strictly increasing
    # mtimes on each drop's files so identical timestamps can't batch
    # days out of order (flake pinned by the round-6 advice).
    import os
    import time

    src = str(tmp_path / "heat_src")
    seen: set = set()
    base = time.time()
    for i, (lo, hi) in enumerate(((0, 4), (4, 8), (8, 11))):
        part = [(u, d, h) for (u, d, h) in rows if lo <= d < hi]
        spark.createDataFrame(part, schema).coalesce(1).write.mode("append").parquet(src)
        for name in os.listdir(src):
            p = os.path.join(src, name)
            if name.endswith(".parquet") and p not in seen:
                seen.add(p)
                os.utime(p, (base + 10 * i, base + 10 * i))

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "stage_out")
    run_to_parquet(
        stateful_overheat_stages(stream), out_dir, str(tmp_path / "cp")
    )
    got = {
        (r["user_id"], r["day"], r["stage"], r["stage_from"], r["stage_since"])
        for r in spark.read.parquet(out_dir).collect()
    }

    want = {
        (r["user_id"], r["day"], r["stage"], r["stage_from"], r["stage_since"])
        for r in overheat_stages(batch_df, "user_id", "day", "heat_score").collect()
    }
    assert got == want
    assert len(got) == len(rows)


def test_stage_machine_rejects_colliding_output_columns(spark):
    import pytest

    df = spark.createDataFrame(
        [("A", 0, 0.9, "climax")],
        "user_id string, day long, heat_score double, stage string",
    )
    with pytest.raises(ValueError, match="stage"):
        overheat_stages(df, "user_id", "day", "heat_score")


def test_stage_machine_keys_independent(spark):
    df = spark.createDataFrame(
        [("A", 0, 0.9), ("B", 0, 0.1), ("A", 1, 0.75), ("B", 1, 0.75)],
        "user_id string, day long, heat_score double",
    )
    got = {
        (r["user_id"], r["day"]): r["stage"]
        for r in overheat_stages(df, "user_id", "day", "heat_score").collect()
    }
    # A holds climax at 0.75; B (from none) only reaches riding at 0.75
    assert got == {
        ("A", 0): "climax",
        ("B", 0): "none",
        ("A", 1): "climax",
        ("B", 1): "riding",
    }


def test_stage_machine_null_heat_holds(spark):
    """Review fix: NULL/NaN heat = no observation — hold the stage
    with no transition (NaN comparisons are all-False, which silently
    stepped climax -> unwind before the guard)."""
    df = spark.createDataFrame(
        [("A", 0, 0.9), ("A", 1, None), ("A", 2, 0.75)],
        "user_id string, day long, heat_score double",
    )
    out = overheat_stages(df, "user_id", "day", "heat_score").orderBy("day").collect()
    assert [r["stage"] for r in out] == ["climax", "climax", "climax"]
    assert [r["stage_since"] for r in out] == [0, 0, 0]
    assert [r["stage_from"] for r in out] == [None, None, None]
