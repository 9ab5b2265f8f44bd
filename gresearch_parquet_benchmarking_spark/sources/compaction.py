"""Small-file compaction: rewrite a fragmented parquet dataset into
target-sized files.

The reference is single-file by construction; at 100 TB the opposite
problem dominates: streaming sinks, per-task writers, and incremental
loads leave thousands of KB-scale files per partition, and every scan
then pays (open + footer decode + seek) per file — the same per-task
footer tax the io_pageread_task probe quantifies (BENCH.md). Compaction
is the periodic OPTIMIZE every lakehouse layout runs.

Spark-first: the plan is one repartition shuffle sized from the
dataset's real bytes (ceil(total/target)), optionally range-clustered
on sort keys so the rewrite also buys min/max skipping (layout.py's
one-dimension story; zorder_by for several). At 100 TB compaction runs
per partition directory (sources/partitioned.py layout), so the unit
of work stays bounded and incremental — compact only directories whose
small-file count crossed a threshold.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 << 20  # one HDFS-ish block per file


@dataclass
class CompactionPlan:
    path: str
    n_files: int
    total_bytes: int
    target_bytes: int
    n_output_files: int

    @property
    def worthwhile(self) -> bool:
        """Skip directories that are already well-laid-out: fewer files
        than the plan would produce means a rewrite only shuffles bytes
        for no layout gain."""
        return self.n_files > self.n_output_files


def _data_files(path: str) -> list[tuple[str, int]]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                p = os.path.join(root, f)
                out.append((p, os.path.getsize(p)))
    return out


def plan_compaction(
    path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> CompactionPlan:
    """Size the rewrite from the dataset's actual bytes — never from
    row counts (row width varies) or file counts (the thing being
    fixed). Local-fs listing here; on an object store the same numbers
    come from the catalog/manifest listing."""
    files = _data_files(path)
    total = sum(sz for _, sz in files)
    return CompactionPlan(
        path=path,
        n_files=len(files),
        total_bytes=total,
        target_bytes=target_bytes,
        n_output_files=max(1, math.ceil(total / target_bytes)),
    )


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_by: list[str] | None = None,
) -> tuple[CompactionPlan, CompactionPlan]:
    """Rewrite ``path`` into ``out_path`` as ~target-sized files;
    returns (input_plan, output_plan) so callers can assert the layout
    actually improved.

    ``sort_by`` upgrades the plain repartition to repartitionByRange +
    sortWithinPartitions: same shuffle count, but output files carry
    tight min/max ranges on the sort keys (row-group skipping for free
    with the rewrite — the one-dimensional clustering of layout.py)."""
    plan = plan_compaction(path, target_bytes)
    df: DataFrame = spark.read.parquet(path)
    n = plan.n_output_files
    if sort_by:
        df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(out_path)
    return plan, plan_compaction(out_path, target_bytes)
