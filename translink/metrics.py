"""Per-stage metrics via Spark ``observe`` — the analog of the reference's
atomic counter snapshots (``src/walker_hp.rs:57-100``,
``src/pipeline/parallel.rs:52-103``) without any extra Spark job.

Usage::

    obs, df = observe_stage(df, "canonicalize")
    ... run an action through df ...
    row = obs.get          # {'rows': ..., 'null_ids': ...}
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, Observation, functions as F


def observe_stage(df: DataFrame, stage: str, id_col: str = "conv_id"):
    """Attach a named Observation counting rows and null ids; free at
    execution time (metrics ride the action, no second pass)."""
    obs = Observation(stage)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col(id_col).isNull(), 1).otherwise(0)).alias("null_ids"),
    )
    return obs, observed


@contextmanager
def stage_timer(sink: dict, stage: str):
    """Record wall-clock seconds of a stage into ``sink[stage]``."""
    t0 = time.time()
    try:
        yield
    finally:
        sink[stage] = round(time.time() - t0, 3)
