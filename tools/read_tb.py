"""Read scalars back out of our tensorboard_logs event files.

Dependency-free decoder for the subset of the TFRecord/Event wire
format that utils/tb.py writes (scalar ``Summary.Value{tag,
simple_value}`` events) — the analysis half of that writer, used for
run post-mortems (throughput percentiles, learning curves) without
installing TensorBoard.

Usage:
  python tools/read_tb.py <run_dir>/tensorboard_logs [tag-substring]

Prints per-tag count / median / p10 / p90 (and for
``train/images_per_sec`` the sustained-throughput summary used by the
streaming stall measurements in BASELINE.md).
"""

from __future__ import annotations

import glob
import os
import statistics
import struct
import sys


def _read_records(path):
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off + 12 <= len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        start = off + 12
        if start + length + 4 > len(data):
            return  # truncated tail (live run) — stop cleanly
        yield data[start:start + length]
        off = start + length + 4


def _varint(data, off):
    n = shift = 0
    while True:
        b = data[off]
        off += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, off
        shift += 7


def _fields(data):
    """Yield (field_number, wire_type, value) over one message."""
    off = 0
    while off < len(data):
        key, off = _varint(data, off)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, off = _varint(data, off)
        elif wire == 1:
            v = data[off:off + 8]
            off += 8
        elif wire == 2:
            ln, off = _varint(data, off)
            v = data[off:off + ln]
            off += ln
        elif wire == 5:
            v = data[off:off + 4]
            off += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def read_scalars(log_dir):
    """[(tag, step, value, wall_time)] from every event file in dir."""
    out = []
    for path in sorted(glob.glob(os.path.join(log_dir, "events.out.*"))):
        for rec in _read_records(path):
            wall = 0.0
            step = 0
            summary = None
            for field, wire, v in _fields(rec):
                if field == 1 and wire == 1:
                    (wall,) = struct.unpack("<d", v)
                elif field == 2 and wire == 0:
                    step = v
                elif field == 5 and wire == 2:
                    summary = v
            if summary is None:
                continue
            for field, wire, v in _fields(summary):
                if field != 1 or wire != 2:
                    continue
                tag = None
                val = None
                for f2, w2, v2 in _fields(v):
                    if f2 == 1 and w2 == 2:
                        tag = v2.decode("utf-8")
                    elif f2 == 2 and w2 == 5:
                        (val,) = struct.unpack("<f", v2)
                if tag is not None and val is not None:
                    out.append((tag, step, val, wall))
    return out


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    log_dir = sys.argv[1]
    want = sys.argv[2] if len(sys.argv) > 2 else ""
    by_tag = {}
    for tag, step, val, wall in read_scalars(log_dir):
        if want in tag:
            by_tag.setdefault(tag, []).append((step, val, wall))
    for tag, rows in sorted(by_tag.items()):
        vals = [v for _, v, _ in rows]
        q = lambda p: statistics.quantiles(vals, n=10)[p] if len(vals) >= 10 else float("nan")
        print(f"{tag:28s} n={len(vals):5d} last={vals[-1]:10.4f} "
              f"median={statistics.median(vals):10.4f} "
              f"p10={q(0):10.4f} p90={q(8):10.4f}")


if __name__ == "__main__":
    main()
