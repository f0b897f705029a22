"""Deletion-vector codec for the jar-less Delta path.

A deletion vector marks rows of a parquet file as deleted WITHOUT
rewriting the file — a small DELETE becomes a metadata-only commit.  The
row-index set is stored as a 64-bit roaring bitmap array:

    [u32 LE magic 1681511377]              (the "portable" format marker)
    [u64 LE number of 32-bit bitmaps]      (dense: bucket i = high 32 bits)
    per bucket: a standard 32-bit roaring bitmap in the interoperable
    RoaringFormatSpec portable layout (cookie 12346/12347, array/bitmap/
    run containers).

This module implements the 32-bit portable layout faithfully (encode:
array + bitmap containers; decode: array + bitmap + run), the 64-bit
wrapper, and the Z85 text encoding Delta uses to inline small DVs into
the log descriptor (``storageType='i'``).  Foreign DVs that don't parse
(file-backed 'u'/'p' storage, unknown magic) stay FAIL-CLOSED at the
reader gate — misapplying a deletion vector resurrects deleted rows.

Delta's own serialization is RoaringBitmapArray's portable format; the
layout here follows the published spec.  Interop is additionally pinned
by self-roundtrip property tests; if a future jar disagrees on the
wrapper, the magic check rejects rather than misreads.
"""

from __future__ import annotations

import struct

_MAGIC = 1681511377  # RoaringBitmapArray portable-format magic
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4

# ZeroMQ Z85 alphabet (the encoding Delta uses for inline DVs / DV names)
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """Z85 with zero-padding to a 4-byte boundary (the true byte length
    travels separately in the descriptor's sizeInBytes)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        n = struct.unpack(">I", data[i:i + 4])[0]
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[n % 85])
            n //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, size: int | None = None) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i:i + 5]:
            try:
                n = n * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if n > 0xFFFFFFFF:
            raise ValueError("z85 quintet overflows 32 bits")
        out.extend(struct.pack(">I", n))
    return bytes(out[:size]) if size is not None else bytes(out)


def _encode_roaring32(values: list[int]) -> bytes:
    """Standard portable 32-bit roaring bitmap (values sorted, distinct).
    Writes array containers (<= 4096 values) or bitmap containers; never
    run containers, which keeps the no-run cookie layout."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    bodies = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= 4096:
            bodies.append(struct.pack("<%dH" % len(vals), *vals))
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            bodies.append(bytes(bits))
    out = [struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))]
    for k in keys:
        out.append(struct.pack("<HH", k, len(containers[k]) - 1))
    # offset header (always present with the no-run cookie)
    offset = 8 + 4 * len(keys) + 4 * len(keys)
    for body in bodies:
        out.append(struct.pack("<I", offset))
        offset += len(body)
    out.extend(bodies)
    return b"".join(out)


def _decode_roaring32(data: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one portable 32-bit roaring bitmap at ``pos``; returns
    (values, next_pos).  Handles array, bitmap and run containers."""
    if pos + 4 > len(data):
        raise ValueError("truncated roaring bitmap (cookie)")
    cookie32 = struct.unpack_from("<I", data, pos)[0]
    cookie = cookie32 & 0xFFFF
    has_run_support = cookie == _SERIAL_COOKIE
    if cookie == _SERIAL_COOKIE_NO_RUN:
        size = struct.unpack_from("<I", data, pos + 4)[0]
        run_flags = b""
        header_at = pos + 8
    elif has_run_support:
        size = (cookie32 >> 16) + 1
        n_flag_bytes = (size + 7) // 8
        run_flags = data[pos + 4:pos + 4 + n_flag_bytes]
        header_at = pos + 4 + n_flag_bytes
    else:
        raise ValueError(f"unknown roaring cookie {cookie}")
    keys, cards = [], []
    at = header_at
    for _ in range(size):
        k, c = struct.unpack_from("<HH", data, at)
        keys.append(k)
        cards.append(c + 1)
        at += 4
    has_offsets = (not has_run_support) or size >= _NO_OFFSET_THRESHOLD
    if has_offsets:
        at += 4 * size  # offsets are redundant for sequential decode
    values: list[int] = []
    for i in range(size):
        is_run = bool(run_flags and (run_flags[i // 8] & (1 << (i % 8))))
        base = keys[i] << 16
        if is_run:
            n_runs = struct.unpack_from("<H", data, at)[0]
            at += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", data, at)
                at += 4
                values.extend(base | v for v in range(start, start + length + 1))
        elif cards[i] <= 4096:
            vals = struct.unpack_from("<%dH" % cards[i], data, at)
            at += 2 * cards[i]
            values.extend(base | v for v in vals)
        else:
            bits = data[at:at + 8192]
            at += 8192
            for byte_i, byte in enumerate(bits):
                while byte:
                    low = byte & (-byte)
                    values.append(base | (byte_i << 3 | low.bit_length() - 1))
                    byte ^= low
    return values, at


def encode_dv(positions: list[int]) -> bytes:
    """Row positions (any order, dedup'd here) -> serialized 64-bit
    roaring bitmap array (portable wrapper)."""
    values = sorted(set(positions))
    if any(v < 0 for v in values):
        raise ValueError("negative row position")
    buckets: dict[int, list[int]] = {}
    for v in values:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    if buckets and max(buckets) > 0xFFFFFFFF:
        raise ValueError("row position exceeds 2^64")
    n = (max(buckets) + 1) if buckets else 0
    out = [struct.pack("<IQ", _MAGIC, n)]
    for i in range(n):
        out.append(_encode_roaring32(buckets.get(i, [])))
    return b"".join(out)


def decode_dv(data: bytes) -> list[int]:
    """Serialized 64-bit roaring bitmap array -> sorted row positions.
    Unknown magic raises (fail closed — see module docstring)."""
    if len(data) < 12:
        raise ValueError("deletion vector too short")
    magic, n = struct.unpack_from("<IQ", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"unknown deletion-vector magic {magic}")
    pos = 12
    values: list[int] = []
    for i in range(n):
        vals, pos = _decode_roaring32(data, pos)
        values.extend((i << 32) | v for v in vals)
    return values


def inline_descriptor(positions: list[int]) -> dict:
    """Build an inline ('i') deletionVector descriptor for an add action."""
    payload = encode_dv(positions)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(payload),
        "sizeInBytes": len(payload),
        "cardinality": len(set(positions)),
    }


def descriptor_positions(descriptor: dict) -> list[int]:
    """Decode an add action's deletionVector descriptor into row
    positions.  Only inline storage is implemented; file-backed DVs
    ('u'/'p') raise so the reader gate stays fail-closed for them."""
    st = descriptor.get("storageType")
    if st != "i":
        raise ValueError(
            f"unsupported deletion-vector storage type {st!r} (inline only)"
        )
    payload = z85_decode(
        descriptor["pathOrInlineDv"], descriptor.get("sizeInBytes")
    )
    positions = decode_dv(payload)
    card = descriptor.get("cardinality")
    if card is not None and card != len(positions):
        raise ValueError(
            f"deletion-vector cardinality mismatch: descriptor says {card}, "
            f"bitmap holds {len(positions)}"
        )
    return positions
