"""Subprocess pipe operator — Hadoop Streaming semantics.

The reference runs any executable as mapper/reducer, feeding
``key<sep>value`` lines over stdin/stdout (ST/PipeMapper.java:38,
PipeMapRed.java:1, option surface StreamJob.java:329-:528).

Spark-first form: `mapInPandas` spawns the command once per
Arrow batch stream (one subprocess per task, like one per
MapTask there), pipes lines in a writer thread, and parses stdout
back into (key, value) rows on the configurable separator.

Two record protocols, mirroring the reference's two modes:

- text lines (``pipe`` / ``pipe_reduce``) — PipeMapRed's default
  ``key<sep>value\\n`` framing; UTF-8 is forced explicitly (the
  executor locale is not trusted).
- length-prefixed binary records (``pipe_binary``) — the typed-bytes
  analog (ST/io/TypedBytesInputWriter.java:1,
  TypedBytesOutputReader.java:1): data that newlines/separators would
  corrupt crosses the subprocess boundary as ``uint32 length + raw
  bytes`` frames, bit-transparent in both directions.

Both directions stream: stdin from a writer thread, stdout drained
incrementally and yielded in bounded pandas chunks — per-task memory
is O(chunk), not O(partition output) (the reference streams
record-by-record for the same reason).

Reducer-side streaming contract (keys grouped & sorted) composes as
``sorted_groups(df, k, v)`` (operators/sorting.py) before pipe_reduce.
"""

from __future__ import annotations

import struct
import subprocess
import threading
from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("value", StringType())]
)

BIN_SCHEMA = StructType([StructField("value", BinaryType())])

#: rows per yielded pandas chunk — bounds task memory under
#: output-expanding commands (a tokenizer can emit 100× its input)
PIPE_CHUNK_ROWS = 1 << 16


def _piped(
    feed_items: Iterator,
    cmd: Sequence[str] | str,
    write_item: Callable,
    read_stdout: Callable,
    binary: bool,
):
    """Common subprocess plumbing: writer thread feeding stdin with
    guaranteed stdin-close and exception propagation (a feed error
    that leaves stdin open would hang the child forever), incremental
    stdout parse, exit-code check."""
    shell = isinstance(cmd, str)
    kwargs: dict = {"bufsize": 1 << 16}
    if not binary:
        kwargs.update(text=True, encoding="utf-8")
    proc = subprocess.Popen(
        cmd, shell=shell, stdin=subprocess.PIPE, stdout=subprocess.PIPE, **kwargs
    )
    feed_exc: list[BaseException] = []

    def feed() -> None:
        try:
            for item in feed_items:
                write_item(proc.stdin, item)
        except BrokenPipeError:
            pass
        except BaseException as e:  # noqa: BLE001 — re-raised on the main thread
            feed_exc.append(e)
        finally:
            try:
                proc.stdin.close()
            except Exception:
                pass

    writer = threading.Thread(target=feed)
    writer.start()
    try:
        yield from read_stdout(proc.stdout)
    except BaseException:
        proc.kill()  # unblock the writer if it's stuck on a full pipe
        writer.join()
        # reap the killed child and close its read end — an unreaped
        # Popen lingers as a zombie with open fds until GC
        # (review-r4b); repeated task errors on a long-lived executor
        # would otherwise accumulate them between GC cycles
        proc.wait()
        try:
            proc.stdout.close()
        except OSError:
            pass
        raise
    writer.join()
    if feed_exc:
        raise feed_exc[0]
    rc = proc.wait()
    if rc != 0:
        raise RuntimeError(f"pipe command failed with exit code {rc}: {cmd}")


def _run_pipe(
    lines: Iterator[str], cmd: Sequence[str] | str, sep: str
) -> Iterator[tuple[str, str]]:
    def write_line(stdin, line: str) -> None:
        stdin.write(line + "\n")

    def read_lines(stdout) -> Iterator[tuple[str, str]]:
        for out_line in stdout:
            out_line = out_line.rstrip("\n")
            k, s, v = out_line.partition(sep)
            yield (k, v if s else "")

    return _piped(lines, cmd, write_line, read_lines, binary=False)


def _read_exact(f, n: int) -> bytes | None:
    chunks = []
    got = 0
    while got < n:
        b = f.read(n - got)
        if not b:
            if got:
                raise RuntimeError("pipe: truncated binary record from subprocess")
            return None
        chunks.append(b)
        got += len(b)
    return b"".join(chunks)


def _run_pipe_binary(
    records: Iterator[bytes], cmd: Sequence[str] | str
) -> Iterator[bytes]:
    def write_rec(stdin, rec: bytes) -> None:
        stdin.write(struct.pack(">I", len(rec)))
        stdin.write(rec)

    def read_recs(stdout) -> Iterator[bytes]:
        while True:
            header = _read_exact(stdout, 4)
            if header is None:
                return
            (n,) = struct.unpack(">I", header)
            body = _read_exact(stdout, n) if n else b""
            if body is None:
                raise RuntimeError("pipe: truncated binary record from subprocess")
            yield body

    return _piped(records, cmd, write_rec, read_recs, binary=True)


def _chunked(
    rows: Iterator, columns: list[str], chunk_rows: int
) -> Iterator[pd.DataFrame]:
    buf: list = []
    for r in rows:
        buf.append(r)
        if len(buf) >= chunk_rows:
            yield pd.DataFrame(buf, columns=columns)
            buf = []
    if buf:
        yield pd.DataFrame(buf, columns=columns)


def pipe(
    df: DataFrame,
    cmd: Sequence[str] | str,
    input_sep: str = "\t",
    output_sep: str = "\t",
    chunk_rows: int = PIPE_CHUNK_ROWS,
) -> DataFrame:
    """Pipe every row (all columns joined with ``input_sep``) through
    ``cmd``; parse stdout lines into (key, value) on the first
    ``output_sep``. One subprocess per task; output yielded in
    ``chunk_rows``-bounded pandas chunks."""
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

        yield from _chunked(
            _run_pipe(line_iter(), cmd, output_sep), ["key", "value"], chunk_rows
        )

    return src.mapInPandas(run, OUT_SCHEMA)


def pipe_binary(
    df: DataFrame,
    cmd: Sequence[str] | str,
    input_col: str | None = None,
    chunk_rows: int = PIPE_CHUNK_ROWS,
    null_as_empty: bool = False,
) -> DataFrame:
    """Binary-safe pipe (typed-bytes analog): each input row's
    ``input_col`` bytes cross the subprocess boundary as a
    length-prefixed frame (``>I`` + payload), and stdout is parsed
    with the same framing into ``value binary`` rows. Content is
    bit-transparent — embedded newlines, separators, NULs all
    survive (the failure mode typed-bytes exists to prevent:
    ST/io/TypedBytesInputWriter.java:1, test corpus
    ST/.../TestTypedBytesStreaming.java).

    NULL input values RAISE by default: the framing cannot represent
    null, and silently coercing it to b'' would alter data in a
    function whose contract is bit-transparency. Pass
    ``null_as_empty=True`` to opt into the coercion explicitly."""
    col = input_col or (df.columns[0] if len(df.columns) == 1 else None)
    if col is None:
        raise ValueError("pipe_binary needs input_col when df has multiple columns")
    src = df.select(F.col(col).cast("binary").alias("__rec"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rec_iter() -> Iterator[bytes]:
            for b in batches:
                for rec in b["__rec"]:
                    if rec is None:
                        if not null_as_empty:
                            raise ValueError(
                                "pipe_binary: NULL input value (the binary "
                                "framing cannot represent null); filter "
                                "nulls out or pass null_as_empty=True"
                            )
                        yield b""
                    else:
                        yield bytes(rec)

        yield from _chunked(
            ((r,) for r in _run_pipe_binary(rec_iter(), cmd)), ["value"], chunk_rows
        )

    return src.mapInPandas(run, BIN_SCHEMA)


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
