"""Jar-less fallback readers: Avro object-container files and xlsx.

The scale path for Avro is the spark-avro package (JVM, vectorized,
splittable); this fallback exists so jar-less environments still read
Avro: the SCHEMA is parsed from one file header on the driver (a few
hundred bytes), then the file list is distributed and each executor
decodes its files' blocks with a pure-Python decoder inside Arrow-batched
``mapInPandas`` — per-file parallelism, no driver bottleneck.  The Avro
binary spec (zigzag varints, deflate codec via stdlib zlib) needs no
third-party library.

xlsx is a zip of XML (ECMA-376): ``zipfile`` + ``xml.etree`` parse
sheets and shared strings directly when no pandas engine (openpyxl) is
installed.  Excel files are driver-side by nature (small, single-block
zip) — same bridge shape as the pandas path it backs up.

Parity: reference reads avro/excel natively (src/polars_incremental/
sources/file.py:150-161); this re-expresses both Spark-first with the
JVM path preferred and a dependency-free fallback.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Avro binary decoding (spec: https://avro.apache.org/docs/current/spec.html)
# --------------------------------------------------------------------------

_AVRO_MAGIC = b"Obj\x01"


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def read(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("truncated avro data")
        self.pos += n
        return out

    def long(self) -> int:
        """Zigzag varint."""
        shift, acc = 0, 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        return self.read(self.long())


def _decode_value(r: _Reader, schema: Any) -> Any:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, dict):
        t = schema["type"]
    elif isinstance(schema, list):  # union
        return _decode_value(r, schema[r.long()])
    else:
        raise ValueError(f"bad avro schema node: {schema!r}")

    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.bytes_()
    if t == "string":
        return r.bytes_().decode("utf-8")
    if t == "record":
        return {f["name"]: _decode_value(r, f["type"]) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                r.long()
            for _ in range(n):
                out.append(_decode_value(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.bytes_().decode("utf-8")
                out[k] = _decode_value(r, schema["values"])
    raise NotImplementedError(f"avro type {t!r} not supported by the fallback reader")


def _read_container_header(data: bytes) -> tuple[dict, bytes, int]:
    """-> (parsed avro.schema, 16-byte sync marker, body offset)."""
    if data[:4] != _AVRO_MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    r = _Reader(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            key = r.bytes_().decode("utf-8")
            meta[key] = r.bytes_()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} not supported (null/deflate)")
    return {"schema": schema, "codec": codec}, sync, r.pos


def _iter_avro_records(data: bytes) -> Iterator[dict]:
    """All records of one container file (handles multi-block + deflate)."""
    import zlib

    header, sync, pos = _read_container_header(data)
    schema, codec = header["schema"], header["codec"]
    r = _Reader(data, pos)
    while r.pos < len(data):
        count = r.long()
        block = r.read(r.long())
        if codec == "deflate":  # raw deflate, no zlib header (spec)
            block = zlib.decompress(block, -15)
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch (corrupt block)")
        br = _Reader(block)
        for _ in range(count):
            yield _decode_value(br, schema)


def _avro_to_spark_type(schema: Any) -> T.DataType:
    if isinstance(schema, list):  # union: only [null, X] / [X, null] map cleanly
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise NotImplementedError(f"general avro union {schema!r} not supported")
        return _avro_to_spark_type(non_null[0])
    t = schema["type"] if isinstance(schema, dict) else schema
    simple = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
        "enum": T.StringType(),
        "fixed": T.BinaryType(),
        "null": T.NullType(),
    }
    if t in simple:
        return simple[t]
    if t == "record":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _avro_to_spark_type(f["type"]),
                    nullable=isinstance(f["type"], list) and "null" in f["type"],
                )
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(_avro_to_spark_type(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), _avro_to_spark_type(schema["values"]))
    raise NotImplementedError(f"avro type {t!r} not supported by the fallback reader")


def read_avro_fallback(spark: SparkSession, files: list[str]) -> DataFrame:
    """Distributed jar-less Avro read: schema from one header on the driver,
    per-file block decode on executors via Arrow-batched ``mapInPandas``.

    Files must share a schema (the multi-file contract every Spark format
    reader already imposes); the top-level type must be a record.
    """
    import pandas as pd

    try:
        with open(files[0], "rb") as fh:
            header, _sync, _pos = _read_container_header(fh.read(1 << 16))
    except ValueError:  # header (schema json) longer than 64 KiB — rare
        with open(files[0], "rb") as fh:
            header, _sync, _pos = _read_container_header(fh.read())
    schema = header["schema"]
    if not (isinstance(schema, dict) and schema["type"] == "record"):
        raise NotImplementedError("avro fallback requires a top-level record schema")
    spark_schema = _avro_to_spark_type(schema)
    field_names = [f.name for f in spark_schema.fields]

    paths_df = spark.createDataFrame([(p,) for p in files], "__path string")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["__path"]:
                with open(path, "rb") as fh:
                    rows = list(_iter_avro_records(fh.read()))
                yield pd.DataFrame(
                    {name: [row.get(name) for row in rows] for name in field_names}
                )

    # one file per task: files are the natural split unit here (the block-
    # splittable scale path is the spark-avro jar)
    return paths_df.repartition(len(files)).mapInPandas(_decode, spark_schema)


# --------------------------------------------------------------------------
# xlsx via stdlib (zip of ECMA-376 XML)
# --------------------------------------------------------------------------

_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'C7' -> 2 (0-based column)."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return idx - 1


def _read_xlsx_rows(path: str) -> list[list[Any]]:
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_XLSX_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
        sheet_names = sorted(
            n for n in zf.namelist() if n.startswith("xl/worksheets/sheet")
        )
        if not sheet_names:
            raise ValueError(f"{path}: xlsx has no worksheets")
        root = ET.fromstring(zf.read(sheet_names[0]))
    rows: list[list[Any]] = []
    for row_el in root.iter(f"{_XLSX_NS}row"):
        row: list[Any] = []
        for cell in row_el.findall(f"{_XLSX_NS}c"):
            ref, ctype = cell.get("r", ""), cell.get("t", "n")
            col = _col_index(ref) if ref else len(row)
            while len(row) <= col:
                row.append(None)
            if ctype == "inlineStr":
                val: Any = "".join(
                    t.text or "" for t in cell.iter(f"{_XLSX_NS}t")
                )
            else:
                v_el = cell.find(f"{_XLSX_NS}v")
                raw = v_el.text if v_el is not None else None
                if raw is None:
                    val = None
                elif ctype == "s":
                    val = shared[int(raw)]
                elif ctype == "str":
                    val = raw
                elif ctype == "b":
                    val = raw == "1"
                else:  # numeric
                    f = float(raw)
                    val = int(f) if f.is_integer() else f
            row[col] = val
        rows.append(row)
    return rows


def read_xlsx_fallback(spark: SparkSession, files: list[str]) -> DataFrame:
    """First row = header (pandas ``read_excel`` default); numeric cells
    that are whole numbers come back as longs, others as doubles, text as
    strings — mixed columns promote to string.  Driver-side per file, like
    the pandas bridge it backs up (excel files are small by construction).
    """
    all_rows: list[dict[str, Any]] = []
    header: list[str] | None = None
    for path in files:
        rows = _read_xlsx_rows(path)
        if not rows:
            continue
        file_header = [str(h) for h in rows[0]]
        if header is None:
            header = file_header
        elif file_header != header:
            raise ValueError(
                f"{path}: xlsx header {file_header} != first file's {header}"
            )
        for row in rows[1:]:
            padded = row + [None] * (len(header) - len(row))
            all_rows.append(dict(zip(header, padded)))
    if header is None:
        raise ValueError("no rows in any xlsx file")
    # promote mixed-type columns to string so createDataFrame can infer
    types_by_col = {
        h: {type(r[h]) for r in all_rows if r[h] is not None} for h in header
    }
    for h, seen in types_by_col.items():
        if len(seen - {int, float}) > 0 and seen != {str} and seen != {bool}:
            for r in all_rows:
                if r[h] is not None:
                    r[h] = str(r[h])
        elif seen == {int, float}:
            for r in all_rows:
                if r[h] is not None:
                    r[h] = float(r[h])
    return spark.createDataFrame(all_rows, schema=None)
