"""Round-trip tests for the jar-less avro and stdlib xlsx fallback readers.

Both encoders here are written from the public specs (Avro 1.11 binary
encoding; ECMA-376 spreadsheet XML) independently of the library decoders,
so a shared misreading can't cancel out.
"""

from __future__ import annotations

import struct
import zipfile
import zlib

import pytest

from polars_incremental_spark.sources.file import read_files

# --------------------------------------------------------------------------
# Avro encoder (spec-based, test-only)
# --------------------------------------------------------------------------

SYNC = bytes(range(16))

SCHEMA_JSON = """
{"type": "record", "name": "Doc", "fields": [
  {"name": "id", "type": "long"},
  {"name": "name", "type": "string"},
  {"name": "score", "type": ["null", "double"]},
  {"name": "tags", "type": {"type": "array", "items": "string"}},
  {"name": "props", "type": {"type": "map", "values": "long"}},
  {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}}
]}
"""


def _varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_long(n: int) -> bytes:
    return _varint((n << 1) ^ (n >> 63))


def _enc_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return _enc_long(len(b)) + b


def _enc_record(rec: dict) -> bytes:
    out = _enc_long(rec["id"]) + _enc_str(rec["name"])
    if rec["score"] is None:
        out += _enc_long(0)
    else:
        out += _enc_long(1) + struct.pack("<d", rec["score"])
    if rec["tags"]:
        out += _enc_long(len(rec["tags"]))
        for t in rec["tags"]:
            out += _enc_str(t)
    out += _enc_long(0)
    if rec["props"]:
        out += _enc_long(len(rec["props"]))
        for k, v in rec["props"].items():
            out += _enc_str(k) + _enc_long(v)
    out += _enc_long(0)
    out += _enc_long(["A", "B"].index(rec["kind"]))
    return out


def _avro_container(records: list[dict], codec: str = "null", block_size: int = 0) -> bytes:
    header = b"Obj\x01"
    header += _enc_long(2)
    header += _enc_str("avro.schema") + _enc_str(SCHEMA_JSON)
    header += _enc_str("avro.codec") + _enc_str(codec)
    header += _enc_long(0)
    header += SYNC
    blocks = (
        [records]
        if block_size == 0
        else [records[i : i + block_size] for i in range(0, len(records), block_size)]
    )
    body = b""
    for block in blocks:
        payload = b"".join(_enc_record(r) for r in block)
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            payload = comp.compress(payload) + comp.flush()
        body += _enc_long(len(block)) + _enc_long(len(payload)) + payload + SYNC
    return header + body


RECORDS = [
    {"id": 1, "name": "alpha", "score": 0.5, "tags": ["x", "y"], "props": {"a": 1}, "kind": "A"},
    {"id": -2, "name": "βeta", "score": None, "tags": [], "props": {}, "kind": "B"},
    {"id": 300, "name": "gamma", "score": -1.25, "tags": ["z"], "props": {"k": -7, "m": 9}, "kind": "A"},
    {"id": 2**40, "name": "", "score": 0.0, "tags": ["a", "b", "c"], "props": {"n": 2**33}, "kind": "B"},
]


def _check_avro_rows(rows):
    got = sorted((tuple(r) for r in rows), key=lambda t: t[0])
    want = sorted(
        (
            (r["id"], r["name"], r["score"], r["tags"], r["props"], r["kind"])
            for r in RECORDS
        ),
        key=lambda t: t[0],
    )
    assert got == want


def test_avro_fallback_null_codec_single_block(spark, tmp_path):
    p = tmp_path / "a.avro"
    p.write_bytes(_avro_container(RECORDS))
    df = read_files(spark, [str(p)], "avro")
    assert df.columns == ["id", "name", "score", "tags", "props", "kind"]
    assert dict(df.dtypes)["score"] == "double" and dict(df.dtypes)["id"] == "bigint"
    _check_avro_rows(df.collect())


def test_avro_fallback_deflate_multiblock_multifile(spark, tmp_path):
    """deflate codec + 2 records/block + records split across 2 files —
    the shape a real producer (Kafka connect, etc.) emits."""
    pa = tmp_path / "part0.avro"
    pb = tmp_path / "part1.avro"
    pa.write_bytes(_avro_container(RECORDS[:2], codec="deflate", block_size=1))
    pb.write_bytes(_avro_container(RECORDS[2:], codec="deflate", block_size=2))
    df = read_files(spark, [str(pa), str(pb)], "avro")
    _check_avro_rows(df.collect())


def test_avro_fallback_through_file_source_pipeline(spark, tmp_path):
    """The batch source contract: avro files land, plan_batch picks them up,
    read_batch decodes through the fallback."""
    from polars_incremental_spark import FilesSource, Pipeline

    land = tmp_path / "land"
    land.mkdir()
    (land / "b.avro").write_bytes(_avro_container(RECORDS, codec="deflate"))
    seen = []
    Pipeline(
        source=FilesSource(path=str(land), file_format="avro"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        writer=lambda df: seen.append(sorted(r["id"] for r in df.collect())),
    ).run(spark)
    assert seen == [sorted(r["id"] for r in RECORDS)]


def test_avro_sync_marker_mismatch_raises(spark, tmp_path):
    data = bytearray(_avro_container(RECORDS))
    data[-1] ^= 0xFF  # corrupt the final sync marker
    p = tmp_path / "bad.avro"
    p.write_bytes(bytes(data))
    with pytest.raises(Exception, match="sync marker|PythonException"):
        read_files(spark, [str(p)], "avro").collect()


# --------------------------------------------------------------------------
# xlsx encoder (spec-based, test-only)
# --------------------------------------------------------------------------

def _xlsx_bytes(header: list[str], rows: list[list], shared_strings: bool = True) -> bytes:
    """Minimal ECMA-376 workbook: one sheet, optional sharedStrings."""
    import io

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    strings: list[str] = []

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if shared_strings:
            if v not in strings:
                strings.append(v)
            return f'<c r="{ref}" t="s"><v>{strings.index(v)}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'

    def col_ref(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    body = []
    for rn, row in enumerate([header] + rows, start=1):
        cells = "".join(cell_xml(f"{col_ref(ci)}{rn}", v) for ci, v in enumerate(row))
        body.append(f'<row r="{rn}">{cells}</row>')
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    sst = (
        f'<?xml version="1.0"?><sst xmlns="{ns}" count="{len(strings)}" '
        f'uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in strings)
        + "</sst>"
    )
    workbook = (
        f'<?xml version="1.0"?><workbook xmlns="{ns}"><sheets>'
        '<sheet name="Sheet1" sheetId="1" r:id="rId1" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/>'
        "</sheets></workbook>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        if shared_strings:
            zf.writestr("xl/sharedStrings.xml", sst)
    return buf.getvalue()


def test_xlsx_fallback_roundtrip(spark, tmp_path):
    p = tmp_path / "book.xlsx"
    p.write_bytes(
        _xlsx_bytes(
            ["name", "qty", "price"],
            [["ada", 3, 1.5], ["grace", 10, 2.25], ["alan", 7, 0.75]],
        )
    )
    df = read_files(spark, [str(p)], "excel")
    got = sorted(map(tuple, df.select("name", "qty", "price").collect()))
    assert got == [("ada", 3.0, 1.5), ("alan", 7.0, 0.75), ("grace", 10.0, 2.25)]


def test_xlsx_fallback_inline_strings_sparse_cells(spark, tmp_path):
    """Inline-string cells + a skipped (empty) cell mid-row."""
    p = tmp_path / "sparse.xlsx"
    raw = _xlsx_bytes(
        ["a", "b", "c"], [["x", None, 2], ["y", "mid", 4]], shared_strings=False
    )
    p.write_bytes(raw)
    df = read_files(spark, [str(p)], "excel")
    got = sorted(map(tuple, df.select("a", "b", "c").collect()))
    assert got == [("x", None, 2), ("y", "mid", 4)]


def test_xlsx_fallback_multifile_same_header(spark, tmp_path):
    p1, p2 = tmp_path / "m1.xlsx", tmp_path / "m2.xlsx"
    p1.write_bytes(_xlsx_bytes(["k", "v"], [["a", 1]]))
    p2.write_bytes(_xlsx_bytes(["k", "v"], [["b", 2]]))
    df = read_files(spark, [str(p1), str(p2)], "excel")
    assert sorted(map(tuple, df.collect())) == [("a", 1), ("b", 2)]

    p3 = tmp_path / "m3.xlsx"
    p3.write_bytes(_xlsx_bytes(["different", "v"], [["c", 3]]))
    with pytest.raises(ValueError, match="header"):
        read_files(spark, [str(p1), str(p3)], "excel").collect()
