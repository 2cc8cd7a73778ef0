"""Protobuf wire serde for the Msg envelope — dependency-free proto3.

Reference parity: protocol/msgpb/message.proto (Msg / DMLMsg / DDLMsg
with map<string, google.protobuf.Any> payloads) and
pkg/core/encoding/pb.go:27-103 (DataMapToPB / InterfaceValueToPB: the
Any-typing rules mapping runtime values to well-known wrapper types).

The container has no protobuf package, so this implements the proto3
WIRE FORMAT directly — it is a small public spec (varint tags,
little-endian fixed32/64, length-delimited submessages) and doing it by
hand keeps the codec importable everywhere. Bytes are canonical
protobuf: fields in ascending field-number order, default scalar values
omitted, map entries sorted by key (deterministic serialization — what
gogo/protobuf's Marshal emits for these messages modulo map order,
which proto leaves unspecified; sorting makes OUR bytes reproducible).

Any-typing (InterfaceValueToPB):
    int   -> google.protobuf.Int64Value     float -> DoubleValue
    bool  -> BoolValue                      str   -> StringValue
    bytes -> BytesValue                     datetime -> Timestamp
    None  -> Empty
(bool checked before int: Python bool subclasses int.)

Msg fields: version=1 database=2 table=3 msgType=4 timestamp=5
dmlMsg=6 ddlMsg=7; DMLMsg: op=1 data=2 old=3 pks=4; DDLMsg: SQL=2.
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone
from typing import Any, Mapping

_TYPE_PREFIX = "type.googleapis.com/google.protobuf."

# ---------------------------------------------------------------- varint


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _varint64(n: int) -> bytes:
    """proto int32/int64 encoding: negatives as 10-byte two's-complement."""
    return _uvarint(n & 0xFFFFFFFFFFFFFFFF)


def _read_uvarint(b: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        byte = b[i]
        i += 1
        n |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return n, i
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


# ------------------------------------------------------------- field emit


def _tag(field: int, wire: int) -> bytes:
    return _uvarint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field; proto3 omits empty submessages only when
    the caller decides — map values and Any payloads keep empties."""
    return _tag(field, 2) + _uvarint(len(payload)) + payload


def _str_field(field: int, s: str | None) -> bytes:
    if not s:
        return b""  # proto3 default omission
    return _ld(field, s.encode("utf-8"))


def _varint_field(field: int, n: int) -> bytes:
    if n == 0:
        return b""
    return _tag(field, 0) + _varint64(n)


# ------------------------------------------------------------ Any codec


def interface_to_any(v: Any) -> bytes:
    """Serialize a runtime value as a google.protobuf.Any message
    (pb.go InterfaceValueToPB)."""
    if v is None:
        url, payload = "Empty", b""
    elif isinstance(v, bool):  # before int: bool is an int subclass
        url, payload = "BoolValue", _varint_field(1, 1 if v else 0)
    elif isinstance(v, int):
        url = "Int64Value"
        payload = b"" if v == 0 else _tag(1, 0) + _varint64(v)
    elif isinstance(v, float):
        url = "DoubleValue"
        payload = (
            b""
            if v == 0.0 and not _is_neg_zero(v)
            else _tag(1, 1) + struct.pack("<d", v)
        )
    elif isinstance(v, str):
        url, payload = "StringValue", _str_field(1, v)
    elif isinstance(v, (bytes, bytearray)):
        url, payload = "BytesValue", (_ld(1, bytes(v)) if v else b"")
    elif isinstance(v, datetime):
        ts = v if v.tzinfo else v.replace(tzinfo=timezone.utc)
        seconds = int(ts.replace(microsecond=0).timestamp())
        nanos = ts.microsecond * 1000
        url = "Timestamp"
        payload = _varint_field(1, seconds) + _varint_field(2, nanos)
    else:
        raise TypeError(f"unknown type for pb Any: {type(v)!r}")
    return _str_field(1, _TYPE_PREFIX + url) + _ld(2, payload)


def _is_neg_zero(v: float) -> bool:
    return v == 0.0 and struct.pack("<d", v) != struct.pack("<d", 0.0)


def any_to_interface(b: bytes) -> Any:
    """Inverse of interface_to_any (pb.go PbToInterface)."""
    url, payload = "", b""
    i = 0
    while i < len(b):
        tag, i = _read_uvarint(b, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            ln, i = _read_uvarint(b, i)
            url = b[i : i + ln].decode("utf-8")
            i += ln
        elif field == 2 and wire == 2:
            ln, i = _read_uvarint(b, i)
            payload = b[i : i + ln]
            i += ln
        else:
            i = _skip(b, i, wire)
    kind = url.rsplit(".", 1)[-1]
    if kind == "Empty":
        return None
    fields = _parse_fields(payload)
    if kind in ("Int32Value", "Int64Value"):
        return _signed64(fields.get((1, 0), 0))
    if kind in ("UInt32Value", "UInt64Value"):
        return fields.get((1, 0), 0)
    if kind == "BoolValue":
        return bool(fields.get((1, 0), 0))
    if kind == "DoubleValue":
        return struct.unpack("<d", fields.get((1, 1), struct.pack("<d", 0.0)))[0]
    if kind == "FloatValue":
        return struct.unpack("<f", fields.get((1, 5), struct.pack("<f", 0.0)))[0]
    if kind == "StringValue":
        return fields.get((1, 2), b"").decode("utf-8")
    if kind == "BytesValue":
        return fields.get((1, 2), b"")
    if kind == "Timestamp":
        seconds = _signed64(fields.get((1, 0), 0))
        nanos = fields.get((2, 0), 0)
        return datetime.fromtimestamp(seconds + nanos / 1e9, tz=timezone.utc)
    raise ValueError(f"unknown Any type url: {url!r}")


def _skip(b: bytes, i: int, wire: int) -> int:
    if wire == 0:
        _, i = _read_uvarint(b, i)
        return i
    if wire == 1:
        return i + 8
    if wire == 2:
        ln, i = _read_uvarint(b, i)
        return i + ln
    if wire == 5:
        return i + 4
    raise ValueError(f"unsupported wire type {wire}")


def _parse_fields(b: bytes) -> dict[tuple[int, int], Any]:
    """Parse a flat message into {(field, wire): raw_value} (varints as
    ints, fixed/ld as bytes). Last occurrence wins, per proto3."""
    out: dict[tuple[int, int], Any] = {}
    i = 0
    while i < len(b):
        tag, i = _read_uvarint(b, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_uvarint(b, i)
        elif wire == 1:
            v, i = b[i : i + 8], i + 8
        elif wire == 2:
            ln, i = _read_uvarint(b, i)
            v, i = b[i : i + ln], i + ln
        elif wire == 5:
            v, i = b[i : i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        out[(field, wire)] = v
    return out


# ------------------------------------------------------------- map<str,Any>


def _map_field(field: int, m: Mapping[str, Any] | None) -> bytes:
    if not m:
        return b""
    out = bytearray()
    for k in sorted(m):  # deterministic bytes; proto map order is unspecified
        entry = _str_field(1, k) + _ld(2, interface_to_any(m[k]))
        out += _ld(field, entry)
    return bytes(out)


def _parse_map_entry(b: bytes) -> tuple[str, Any]:
    fields = _parse_fields(b)
    key = fields.get((1, 2), b"").decode("utf-8")
    return key, any_to_interface(fields.get((2, 2), b""))


# ---------------------------------------------------------------- Msg


def encode_msg(msg: Mapping[str, Any]) -> bytes:
    """Serialize an envelope dict as a msgpb.Msg.

    Accepted keys: version, database, table, msg_type, timestamp
    (datetime), dml {op, data, old, pks}, ddl {sql}.
    """
    out = bytearray()
    out += _str_field(1, msg.get("version"))
    out += _str_field(2, msg.get("database"))
    out += _str_field(3, msg.get("table"))
    out += _str_field(4, msg.get("msg_type"))
    ts = msg.get("timestamp")
    if ts is not None:
        tz = ts if ts.tzinfo else ts.replace(tzinfo=timezone.utc)
        seconds = int(tz.replace(microsecond=0).timestamp())
        payload = _varint_field(1, seconds) + _varint_field(2, tz.microsecond * 1000)
        out += _ld(5, payload)
    dml = msg.get("dml")
    if dml is not None:
        body = _str_field(1, dml.get("op"))
        body += _map_field(2, dml.get("data"))
        body += _map_field(3, dml.get("old"))
        body += _map_field(4, dml.get("pks"))
        out += _ld(6, body)
    ddl = msg.get("ddl")
    if ddl is not None:
        out += _ld(7, _str_field(2, ddl.get("sql")))
    return bytes(out)


def decode_msg(b: bytes) -> dict[str, Any]:
    """Inverse of encode_msg. Absent string fields decode to '' (proto3
    cannot distinguish unset from empty for scalars); absent
    timestamp/dml/ddl decode to None."""
    msg: dict[str, Any] = {
        "version": "",
        "database": "",
        "table": "",
        "msg_type": "",
        "timestamp": None,
        "dml": None,
        "ddl": None,
    }
    i = 0
    while i < len(b):
        tag, i = _read_uvarint(b, i)
        field, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, i = _read_uvarint(b, i)
            payload, i = b[i : i + ln], i + ln
            if field == 1:
                msg["version"] = payload.decode("utf-8")
            elif field == 2:
                msg["database"] = payload.decode("utf-8")
            elif field == 3:
                msg["table"] = payload.decode("utf-8")
            elif field == 4:
                msg["msg_type"] = payload.decode("utf-8")
            elif field == 5:
                f = _parse_fields(payload)
                seconds = _signed64(f.get((1, 0), 0))
                nanos = f.get((2, 0), 0)
                msg["timestamp"] = datetime.fromtimestamp(
                    seconds + nanos / 1e9, tz=timezone.utc
                )
            elif field == 6:
                msg["dml"] = _decode_dml(payload)
            elif field == 7:
                f = _parse_fields(payload)
                msg["ddl"] = {"sql": f.get((2, 2), b"").decode("utf-8")}
        else:
            i = _skip(b, i, wire)
    return msg


def _decode_dml(b: bytes) -> dict[str, Any]:
    dml: dict[str, Any] = {"op": "", "data": {}, "old": {}, "pks": {}}
    slot = {2: "data", 3: "old", 4: "pks"}
    i = 0
    while i < len(b):
        tag, i = _read_uvarint(b, i)
        field, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, i = _read_uvarint(b, i)
            payload, i = b[i : i + ln], i + ln
            if field == 1:
                dml["op"] = payload.decode("utf-8")
            elif field in slot:
                k, v = _parse_map_entry(payload)
                dml[slot[field]][k] = v
        else:
            i = _skip(b, i, wire)
    return dml
