"""Minimal TensorBoard event-file writer (scalars), dependency-free.

The reference logs ``train/*`` scalars per optimizer step and ``val/*`` per
epoch through torch's SummaryWriter (reference: training.py:77-78, 121-127,
153-159). This framework writes the same event-file format directly —
TFRecord framing (length + masked CRC32C) around hand-encoded ``Event``
protobufs with ``Summary.Value{tag, simple_value}`` — so the run dir's
``tensorboard_logs/`` loads in stock TensorBoard with identical tags, without
pulling torch/tensorflow into the framework.

Wire format references: tensorflow/core/util/event.proto,
tensorflow/core/framework/summary.proto, TFRecord spec (RFC-less but stable
since TF 1.0).
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional

# --- CRC32C (Castagnoli, reflected poly 0x82F63B78), table-driven -----------

_CRC_TABLE = []


def _build_crc_table():
    poly = 0x82F63B78
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        _CRC_TABLE.append(crc)


_build_crc_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = (_CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)) & 0xFFFFFFFF
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- minimal protobuf encoding ---------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _pb_double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _pb_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _pb_int64(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _pb_bytes(field: int, v: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(v)) + v


def _encode_scalar_event(tag: str, value: float, step: int,
                         wall_time: float) -> bytes:
    value_msg = _pb_bytes(1, tag.encode("utf-8")) + _pb_float(2, float(value))
    summary = _pb_bytes(1, value_msg)
    return (_pb_double(1, wall_time) + _pb_int64(2, int(step))
            + _pb_bytes(5, summary))


def _encode_file_version(wall_time: float) -> bytes:
    return _pb_double(1, wall_time) + _pb_bytes(3, b"brain.Event:2")


class SummaryWriter:
    """Scalar-only SummaryWriter with the torch/TB file layout and API subset
    the reference uses (``add_scalar``, ``flush``, ``close``)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{socket.gethostname()}.{os.getpid()}.0")
        self.path = os.path.join(log_dir, fname)
        self._f = open(self.path, "ab")
        self._write_record(_encode_file_version(time.time()))
        self.flush()

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, scalar_value: float, global_step: int,
                   wall_time: Optional[float] = None) -> None:
        self._write_record(_encode_scalar_event(
            tag, float(scalar_value), int(global_step),
            wall_time if wall_time is not None else time.time()))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        if not self._f.closed:
            self._f.flush()
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_scalars(path: str):
    """Parse scalar events back out of an event file (for tests/tooling).
    Returns [(step, tag, value)]."""
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            f.read(4)  # header crc
            data = f.read(length)
            f.read(4)  # data crc
            out.extend(_parse_event(data))
    return out


def _parse_event(data: bytes):
    """Tiny protobuf walker for Event{step=2, summary=5{value=1{tag=1,
    simple_value=2}}}."""
    step, results = 0, []
    i = 0
    summary = None
    while i < len(data):
        key, i = _read_varint(data, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(data, i)
            if field == 2:
                step = v
        elif wire == 1:
            i += 8
        elif wire == 5:
            i += 4
        elif wire == 2:
            ln, i = _read_varint(data, i)
            chunk = data[i:i + ln]
            i += ln
            if field == 5:
                summary = chunk
        else:
            break
    if summary is not None:
        i = 0
        while i < len(summary):
            key, i = _read_varint(summary, i)
            field, wire = key >> 3, key & 7
            if wire == 2:
                ln, i = _read_varint(summary, i)
                value_msg = summary[i:i + ln]
                i += ln
                if field == 1:
                    tag, val = _parse_value(value_msg)
                    if tag is not None:
                        results.append((step, tag, val))
            elif wire == 0:
                _, i = _read_varint(summary, i)
            elif wire == 1:
                i += 8
            elif wire == 5:
                i += 4
    return results


def _parse_value(data: bytes):
    tag, val = None, None
    i = 0
    while i < len(data):
        key, i = _read_varint(data, i)
        field, wire = key >> 3, key & 7
        if wire == 2:
            ln, i = _read_varint(data, i)
            if field == 1:
                tag = data[i:i + ln].decode("utf-8")
            i += ln
        elif wire == 5:
            if field == 2:
                (val,) = struct.unpack("<f", data[i:i + 4])
            i += 4
        elif wire == 0:
            _, i = _read_varint(data, i)
        elif wire == 1:
            i += 8
    return tag, val


def _read_varint(data: bytes, i: int):
    result, shift = 0, 0
    while True:
        b = data[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


class NullWriter:
    """No-op SummaryWriter for non-coordinator processes on pods (the
    reference writes TB on rank 0 only, training.py:77-78)."""

    path = None

    def add_scalar(self, tag, value, step):
        pass

    def flush(self):
        pass

    def close(self):
        pass
