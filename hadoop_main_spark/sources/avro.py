"""Pure-Python Apache Avro object-container files (no spark-avro, no
libraries): the same honest-implementation standard as the
SequenceFile (sources/sequencefile.py) and HAR (sources/har.py)
codecs. Implements the PUBLIC Avro 1.x specification (container
format + binary encoding): magic ``Obj\\x01``, file metadata map
(``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, then
blocks of ``(record count, byte length, payload, sync)`` with
``null`` or ``deflate`` (raw DEFLATE, wbits=-15) codecs. Binary
encoding: zigzag-varint longs/ints, little-endian IEEE float/double,
length-prefixed UTF-8 strings / bytes, 1-byte booleans, and
``["null", T]`` unions as a varint branch index.

Scope: FLAT records of primitive types — exactly what the TESTDATA
tables and the reference's Avro IO jobs
(MRC/mapreduce/lib/output/... via avro-mapred) exchange. Nested
records/arrays/maps/enums raise a clear ValueError rather than
decoding garbage.

Spark integration: ``write_avro`` emits one container file per
partition from an Arrow-batched pass (data never collects to the
driver); ``read_avro`` lists files, reads ONE header driver-side for
the schema, then decodes whole files Arrow-batched via the
binaryFile source — each .avro file is one row there, so per-file
parallelism matches the container's intended split unit (blocks
within a file stay together, the Avro splitter's sync-seek is not
needed at file granularity). ``sources.text.auto_input`` falls back
here when spark-avro is absent.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}
_AVRO_TO_SPARK = {
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
}


# --- binary primitives (Avro spec "Binary Encoding") --------------------------


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63)  # arbitrary-precision python ints: exact
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf) -> int:
    shift, acc = 0, 0
    while True:
        c = buf.read(1)
        if not c:
            raise ValueError("truncated varint")
        b = c[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (acc >> 1) ^ -(acc & 1)  # zigzag decode


def _write_value(buf: io.BytesIO, v, typ: str) -> None:
    if typ == "long" or typ == "int":
        _write_long(buf, int(v))
    elif typ == "double":
        buf.write(struct.pack("<d", float(v)))
    elif typ == "float":
        buf.write(struct.pack("<f", float(v)))
    elif typ == "string":
        b = str(v).encode("utf-8")
        _write_long(buf, len(b))
        buf.write(b)
    elif typ == "bytes":
        b = bytes(v)
        _write_long(buf, len(b))
        buf.write(b)
    elif typ == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    else:  # pragma: no cover - guarded at schema build
        raise ValueError(f"unsupported avro type {typ!r}")


def _read_value(buf, typ: str):
    if typ == "long" or typ == "int":
        return _read_long(buf)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "string":
        n = _read_long(buf)
        return buf.read(n).decode("utf-8")
    if typ == "bytes":
        n = _read_long(buf)
        return bytes(buf.read(n))
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    raise ValueError(f"unsupported avro type {typ!r}")


# --- schema mapping ------------------------------------------------------------


def _field_avro_type(f: T.StructField) -> object:
    base = _SPARK_TO_AVRO.get(type(f.dataType))
    if base is None:
        raise ValueError(
            f"write_avro supports flat primitive columns; {f.name} is "
            f"{f.dataType.simpleString()}"
        )
    return ["null", base] if f.nullable else base


def schema_to_avro_json(schema: T.StructType, name: str = "row") -> str:
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [
                {"name": f.name, "type": _field_avro_type(f)} for f in schema.fields
            ],
        }
    )


def avro_json_to_schema(
    avro_json: str,
) -> tuple[T.StructType, list[tuple[str, str, bool, int]]]:
    """Returns (spark schema, [(name, base type, nullable, null_branch)])
    for a flat record schema; raises ValueError on anything nested.

    ``null_branch`` is the union index of "null" (0 for the
    spec-common ``["null", T]``, 1 for the equally-valid
    ``[T, "null"]``; -1 for non-nullable fields).  Decode MUST honor
    it: assuming branch 0 is always null misreads ``[T, "null"]``
    files — the branch long for a present value would be taken as
    null and every subsequent byte misaligns."""
    sc = json.loads(avro_json)
    if not isinstance(sc, dict) or sc.get("type") != "record":
        raise ValueError("only record container schemas are supported")
    fields, plan = [], []
    for f in sc["fields"]:
        t = f["type"]
        nullable, null_branch = False, -1
        if isinstance(t, list):
            branches = [b for b in t if b != "null"]
            # A union WITHOUT "null" (including a single-branch [T])
            # still carries a branch-index long on the wire; treating
            # it as a plain type would misalign every subsequent byte
            # of an externally written container (advice r6).
            if len(branches) != 1 or len(t) > 2 or "null" not in t:
                raise ValueError(f"unsupported union {t!r} on field {f['name']}")
            nullable = True
            null_branch = f["type"].index("null")
            t = branches[0]
        if not isinstance(t, str) or t not in _AVRO_TO_SPARK:
            raise ValueError(f"unsupported avro type {t!r} on field {f['name']}")
        fields.append(T.StructField(f["name"], _AVRO_TO_SPARK[t], nullable))
        plan.append((f["name"], t, nullable, null_branch))
    return T.StructType(fields), plan


# --- container encode / decode --------------------------------------------------


def _sync_marker(avro_json: str) -> bytes:
    """Deterministic 16-byte sync (md5 of the schema + a fixed salt):
    the spec only requires uniqueness per file; determinism keeps
    written files byte-reproducible."""
    import hashlib

    return hashlib.md5(avro_json.encode() + b"#hadoop_main_spark").digest()


def encode_container(
    rows: list[tuple], avro_json: str, codec: str = "null", block_rows: int = 4096
) -> bytes:
    """Serialize rows (tuples in schema field order) into one complete
    Avro object-container file."""
    _, plan = avro_json_to_schema(avro_json)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = _sync_marker(avro_json)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": avro_json.encode(), "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_value(out, k, "string")
        _write_value(out, v, "bytes")
    _write_long(out, 0)  # end of metadata map
    out.write(sync)
    for lo in range(0, len(rows), block_rows):
        chunk = rows[lo : lo + block_rows]
        body = io.BytesIO()
        for row in chunk:
            for val, (_name, typ, nullable, null_branch) in zip(row, plan):
                if nullable:
                    if val is None:
                        _write_long(body, null_branch)
                        continue
                    _write_long(body, 1 - null_branch)
                elif val is None:
                    raise ValueError("NULL in non-nullable avro field")
                _write_value(body, val, typ)
        payload = body.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw DEFLATE per spec
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


def read_header(p: bytes) -> tuple[str, str, bytes, int]:
    """Parse the container header: (schema json, codec, sync, body offset)."""
    buf = io.BytesIO(p)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:  # negative count form: abs(count) entries + byte size
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_value(buf, "string")
            meta[k] = _read_value(buf, "bytes")
    sync = buf.read(16)
    avro_json = meta.get("avro.schema", b"").decode("utf-8")
    codec = meta.get("avro.codec", b"null").decode("utf-8") or "null"
    if not avro_json:
        raise ValueError("container missing avro.schema metadata")
    return avro_json, codec, sync, buf.tell()


def decode_container(p: bytes) -> tuple[str, list[tuple]]:
    """Decode a full container file into (schema json, rows)."""
    avro_json, codec, sync, off = read_header(p)
    _, plan = avro_json_to_schema(avro_json)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    buf = io.BytesIO(p)
    buf.seek(off)
    rows: list[tuple] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if len(payload) != size:
            raise ValueError("truncated avro block")
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        body = io.BytesIO(payload)
        for _ in range(count):
            row = []
            for name, typ, nullable, null_branch in plan:
                if nullable:
                    branch = _read_long(body)
                    if branch == null_branch:
                        row.append(None)
                        continue
                    if branch != 1 - null_branch:
                        raise ValueError(
                            f"invalid union branch {branch} for field {name}"
                        )
                row.append(_read_value(body, typ))
            rows.append(tuple(row))
        if buf.read(16) != sync:
            raise ValueError("avro block sync mismatch")
    return avro_json, rows


# --- Spark-level write / read ----------------------------------------------------


def write_avro(df: DataFrame, path: str, codec: str = "null") -> int:
    """Write ``df`` as one Avro container file per partition under
    ``path`` (part-<pid>.avro). mapInArrow, not mapInPandas: pandas
    widens nullable int64 columns to float64, which silently corrupts
    longs past 2^53 (hash64 columns are 60-bit) — Arrow keeps exact
    ints plus a null bitmap. Rows never collect to the driver.
    Returns the number of rows written.

    SHARED-FS CONTRACT: ``path`` is opened by the Python kernel on
    each EXECUTOR via plain ``os`` calls — it must resolve to the same
    filesystem on every executor (local mode trivially; on a real
    cluster use a mounted shared FS path, NOT a driver-local temp dir
    like tempfile.mkdtemp()). Object stores without rename semantics
    (raw S3) also break the os.replace crash-safety step."""
    avro_json = schema_to_avro_json(df.schema)
    names = [f.name for f in df.schema.fields]
    os.makedirs(path, exist_ok=True)

    def _write(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows: list[tuple] = []
        for b in batches:
            cols = [b.column(b.schema.get_field_index(n)).to_pylist() for n in names]
            rows.extend(zip(*cols) if cols else [])
        # crash-safe: encode to a dot-temp sibling, then atomically
        # os.replace into place — a task retry or mid-write crash can
        # never leave a truncated part-*.avro that read_avro rejects
        # (mirrors the streaming sinks' rename-aside discipline)
        target = os.path.join(path, f"part-{pid:05d}.avro")
        tmp = os.path.join(path, f".part-{pid:05d}.avro.tmp")
        with open(tmp, "wb") as fh:
            fh.write(encode_container(rows, avro_json, codec=codec))
        os.replace(tmp, target)
        yield pa.RecordBatch.from_arrays(
            [pa.array([target], pa.string()), pa.array([len(rows)], pa.int64())],
            names=["file", "n"],
        )

    report = df.mapInArrow(_write, "file string, n long")
    return int(report.agg({"n": "sum"}).collect()[0][0] or 0)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read Avro container files written by :func:`write_avro` (or any
    flat-primitive-record Avro file). One driver-side header read
    fixes the schema; file payloads decode Arrow-batched via the
    binaryFile source (one row per file — the container's split
    unit at file granularity)."""
    import glob as _glob

    import pandas as pd

    files = sorted(
        _glob.glob(os.path.join(path, "*.avro"))
        or ([path] if path.endswith(".avro") and os.path.isfile(path) else [])
    )
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        avro_json, _codec, _sync, _off = read_header(fh.read())
    schema, plan = avro_json_to_schema(avro_json)
    names = [f[0] for f in plan]

    def _decode(batches):
        for b in batches:
            for payload in b["content"]:
                _sc, rows = decode_container(bytes(payload))
                # object dtype: keeps 60-bit ints exact and None as a
                # real null (float64 widening would corrupt both)
                yield pd.DataFrame(rows, columns=names, dtype=object)

    binary = spark.read.format("binaryFile").load(files)
    return binary.select("content").mapInPandas(_decode, schema)
