"""Stream-stream joins (capability extension, SURVEY §2.12).

Watermarked interval joins between two event streams — state for
each side is bounded by the watermark delay plus the join interval,
so state size scales with event rate × horizon, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join right-side events occurring within (left_ts, left_ts +
    max_lag] for the same key. On streaming inputs both sides are
    watermarked (required for state cleanup); the same expression
    joins batch frames identically — one code path, two runtimes."""
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] > lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_lag}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def broadcast_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str | None = None,
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension via stream-static
    broadcast join — the streaming analog of the reference's
    DistributedCache map-side hash join (MRC/filecache/
    DistributedCache.java:135).

    The dimension is broadcast once per micro-batch planning cycle;
    no state store is involved (unlike stream-stream joins), so this
    is the right shape whenever one side is a slowly-changing lookup
    table. The same expression enriches batch frames identically.
    """
    d = F.broadcast(dim.withColumnRenamed(dim_key, key) if dim_key else dim)
    return stream.join(d, key, how)
