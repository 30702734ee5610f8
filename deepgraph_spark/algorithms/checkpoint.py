"""Superstep checkpoint/resume protocol.

Every iterative kernel materializes its state each superstep — this breaks
the otherwise exponentially-growing lineage of a join loop (SURVEY.md §7.3)
*and* doubles as the resume point: a killed job restarts from the latest
complete superstep. A superstep is complete iff both its parquet state and
its metrics JSON exist (the JSON is written last and acts as the commit
marker). Metrics carry per-partition lineage (partition id → row count) and
the kernel's convergence measures.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SuperstepCheckpoint:
    def __init__(self, spark: SparkSession, base_dir: str | None, job_id: str = "job"):
        self.spark = spark
        self.enabled = base_dir is not None
        self.dir = os.path.join(base_dir, job_id) if base_dir else None
        if self.enabled:
            os.makedirs(self.dir, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _state_path(self, k: int) -> str:
        return os.path.join(self.dir, f"iter_{k:05d}")

    def _metrics_path(self, k: int) -> str:
        return os.path.join(self.dir, f"iter_{k:05d}.json")

    # -- protocol ----------------------------------------------------------
    def save(self, k: int, state: DataFrame, metrics: dict) -> DataFrame:
        """Write state parquet, then the metrics commit marker; return the
        re-read state (lineage cut). With checkpointing disabled, falls back
        to ``localCheckpoint`` (lineage cut without durability)."""
        if not self.enabled:
            return state.localCheckpoint(eager=True)
        path = self._state_path(k)
        if os.path.exists(path):
            shutil.rmtree(path)
        state.write.mode("overwrite").parquet(path)
        reread = self.spark.read.parquet(path)
        lineage = {
            str(r["pid"]): r["count"]
            for r in reread.groupBy(F.spark_partition_id().alias("pid")).count().collect()
        }
        full = {"iter": k, "partition_lineage": lineage, **metrics}
        tmp = self._metrics_path(k) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(full, f)
        os.replace(tmp, self._metrics_path(k))
        return reread

    def update_metrics(self, k: int, extra: dict) -> None:
        """Merge convergence measures into an already-committed superstep's
        marker (used by the single-action loops, where metrics are only known
        after the materializing aggregation)."""
        if not self.enabled:
            return
        with open(self._metrics_path(k)) as f:
            full = json.load(f)
        full.update(extra)
        tmp = self._metrics_path(k) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(full, f)
        os.replace(tmp, self._metrics_path(k))

    def latest(self) -> tuple[int, DataFrame, dict] | None:
        """Most recent complete superstep, or None."""
        if not self.enabled or not os.path.isdir(self.dir):
            return None
        iters = []
        for name in os.listdir(self.dir):
            if name.startswith("iter_") and name.endswith(".json"):
                k = int(name[len("iter_") : -len(".json")])
                if os.path.isdir(self._state_path(k)):
                    iters.append(k)
        if not iters:
            return None
        k = max(iters)
        with open(self._metrics_path(k)) as f:
            metrics = json.load(f)
        return k, self.spark.read.parquet(self._state_path(k)), metrics

    def metrics_history(self) -> list[dict]:
        if not self.enabled or not os.path.isdir(self.dir):
            return []
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.startswith("iter_") and name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out
