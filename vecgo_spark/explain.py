"""Query introspection — the reference's WithStats/QueryStats.Explain
surface (/root/reference/model/types.go:134-249, populated at
internal/engine/search.go:1114-1164) re-expressed for DataFrame plans.

Planner decisions (segment pruning counts, strategy, probe set) are known
driver-side; Spark-side physical details come from the captured
`explain("formatted")` text. EstimatedCost mirrors
model/types.go:212-221: full distance computations + 0.3 × short-circuited
— in the exact-scan engine "short-circuited" are the rows a pushed filter
removed before scoring."""

from __future__ import annotations

import io
import time
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def spark_plan(df: DataFrame, mode: str = "formatted") -> str:
    """Capture df.explain(mode) as a string (public API prints to stdout)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@dataclass
class QueryStats:
    strategy: str = ""
    metric: str = ""
    k: int = 0
    segments_total: int = 0
    segments_searched: int = 0
    segments_pruned: int = 0
    rows_considered: int = 0            # rows scored (exact distance comps)
    rows_filtered_out: int = 0          # removed before scoring (pushdown)
    clusters_probed: int = 0            # IVF only
    selectivity_est: float | None = None  # manifest-histogram estimate
    elapsed_ms: float = 0.0
    plan: str = field(default="", repr=False)

    def estimated_cost(self) -> float:
        """model/types.go:212-221: full + 0.3 × short-circuited."""
        return float(self.rows_considered) + 0.3 * float(self.rows_filtered_out)

    def explain(self) -> str:
        """Human-readable breakdown (QueryStats.Explain, model/types.go)."""
        lines = [
            f"strategy: {self.strategy}",
            f"metric: {self.metric}  k: {self.k}",
            f"segments: total={self.segments_total} "
            f"searched={self.segments_searched} pruned={self.segments_pruned}",
            f"rows: scored={self.rows_considered} filtered_out={self.rows_filtered_out}",
        ]
        if self.clusters_probed:
            lines.append(f"ivf clusters probed: {self.clusters_probed}")
        if self.selectivity_est is not None:
            lines.append(f"estimated filter selectivity: {self.selectivity_est:.4f}")
        lines.append(f"estimated cost: {self.estimated_cost():.1f}")
        lines.append(f"elapsed: {self.elapsed_ms:.1f} ms")
        if self.plan:
            lines.append("-- spark physical plan --")
            lines.append(self.plan.rstrip())
        return "\n".join(lines)


class timed:
    """Context manager stamping elapsed_ms onto a QueryStats."""

    def __init__(self, stats: QueryStats):
        self.stats = stats

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self.stats

    def __exit__(self, *exc):
        self.stats.elapsed_ms = (time.perf_counter() - self._t0) * 1000.0
        return False
