"""Subprocess pipe operator — Hadoop Streaming semantics.

The reference runs any executable as mapper/reducer, feeding
``key<sep>value`` lines over stdin/stdout (ST/PipeMapper.java:38,
PipeMapRed.java:1, option surface StreamJob.java:329-:528).

Spark-first form: `mapInPandas` spawns the command once per
Arrow batch stream (one subprocess per task, like one per
MapTask there), pipes lines in a writer thread, and parses stdout
back into (key, value) rows on the configurable separator. This is
the idiomatic replacement for both Streaming and rdd.pipe — Arrow
batching plays the role of the typed-bytes binary protocol.

Reducer-side streaming contract (keys grouped & sorted) composes as
``sorted_groups(df, k, v)`` (operators/sorting.py) before pipe_reduce.
"""

from __future__ import annotations

import subprocess
import threading
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

OUT_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("value", StringType())]
)


def _run_pipe(
    lines: Iterator[str], cmd: Sequence[str] | str, sep: str
) -> Iterator[tuple[str, str]]:
    shell = isinstance(cmd, str)
    proc = subprocess.Popen(
        cmd,
        shell=shell,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        text=True,
        bufsize=1 << 16,
    )

    def feed() -> None:
        try:
            for line in lines:
                proc.stdin.write(line + "\n")
            proc.stdin.close()
        except BrokenPipeError:
            pass

    writer = threading.Thread(target=feed)
    writer.start()
    for out_line in proc.stdout:
        out_line = out_line.rstrip("\n")
        k, s, v = out_line.partition(sep)
        yield (k, v if s else "")
    writer.join()
    rc = proc.wait()
    if rc != 0:
        raise RuntimeError(f"pipe command failed with exit code {rc}: {cmd}")


def pipe(
    df: DataFrame,
    cmd: Sequence[str] | str,
    input_sep: str = "\t",
    output_sep: str = "\t",
) -> DataFrame:
    """Pipe every row (all columns joined with ``input_sep``) through
    ``cmd``; parse stdout lines into (key, value) on the first
    ``output_sep``. One subprocess per task."""
    # coalesce NULLs to '' — concat_ws silently DROPS null columns,
    # which would shift every later field the script reads
    line_col = F.concat_ws(
        input_sep, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    )
    src = df.select(line_col.alias("__line"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def line_iter() -> Iterator[str]:
            for b in batches:
                yield from b["__line"].tolist()

        rows = list(_run_pipe(line_iter(), cmd, output_sep))
        yield pd.DataFrame(rows or None, columns=["key", "value"])

    return src.mapInPandas(run, OUT_SCHEMA)


def pipe_reduce(
    df: DataFrame,
    cmd: Sequence[str] | str,
    group_key: str,
    order_key: str | None = None,
    input_sep: str = "\t",
    output_sep: str = "\t",
) -> DataFrame:
    """Streaming-reducer contract: co-locate each group's rows in one
    partition, sorted by (group, order) — exactly what a streaming
    reducer script expects on stdin — then pipe."""
    from hadoop_main_spark.operators.sorting import sorted_groups

    arranged = sorted_groups(df, group_key, order_key or group_key)
    return pipe(arranged, cmd, input_sep, output_sep)
