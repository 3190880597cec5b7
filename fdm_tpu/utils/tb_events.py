"""Pure-python TensorBoard event-file writer (no TF / torch dependency).

Writes scalar summaries in the TFRecord-of-Event-protos format TensorBoard
loads (`events.out.tfevents.*`). Parity surface: the reference streams
scalars through torch's SummaryWriter (reference
train/train_mead_vqvae.py:100-102, train/train_diffusion_mead.py:109-111).

The two formats involved are tiny and hand-encoded here:

  * TFRecord framing: [len u64le][masked crc32c(len) u32le][payload]
    [masked crc32c(payload) u32le], mask(c) = ((c>>15 | c<<17) + 0xa282ead8).
  * Event proto: wall_time (field 1, double), step (field 2, varint),
    file_version (field 3, string — first record only) and summary
    (field 5) -> Summary.value (field 1) -> {tag (field 1, string),
    simple_value (field 2, float32)}.
"""

from __future__ import annotations

import os
import struct
import time
from typing import Iterator, List, Optional, Tuple

_CRC_TABLE: List[int] = []


def _crc32c_table() -> List[int]:
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78  # Castagnoli, reflected
        table = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table.append(c)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc32c_table()
    c = 0xFFFFFFFF
    for b in data:
        c = table[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    if n < 0:
        # proto encodes negative int64 as 10-byte two's complement; no
        # caller here legitimately passes one (steps/lengths/tags), and
        # Python's arithmetic shift would loop forever below
        raise ValueError(f"varint requires a non-negative int, got {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _scalar_summary(tag: str, value: float) -> bytes:
    v = (
        _len_delim(1, tag.encode("utf-8"))
        + _field(2, 5) + struct.pack("<f", float(value))
    )
    return _len_delim(1, v)  # Summary.value is field 1


def encode_event(
    wall_time: float,
    step: int = 0,
    file_version: Optional[str] = None,
    scalars: Optional[List[Tuple[str, float]]] = None,
) -> bytes:
    ev = _field(1, 1) + struct.pack("<d", wall_time)
    if step:
        ev += _field(2, 0) + _varint(step)
    if file_version is not None:
        ev += _len_delim(3, file_version.encode("utf-8"))
    if scalars:
        summary = b"".join(_scalar_summary(t, v) for t, v in scalars)
        ev += _len_delim(5, summary)
    return ev


def frame_record(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (
        header
        + struct.pack("<I", _masked_crc(header))
        + payload
        + struct.pack("<I", _masked_crc(payload))
    )


class EventFileWriter:
    """Minimal SummaryWriter-compatible scalar writer. One file per run:
    `<log_dir>/events.out.tfevents.<time>.<host>`."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        name = f"events.out.tfevents.{int(time.time())}.{os.uname().nodename}"
        self.path = os.path.join(log_dir, name)
        self._fh = open(self.path, "ab")
        self._fh.write(
            frame_record(
                encode_event(time.time(), file_version="brain.Event:2")
            )
        )
        self._fh.flush()

    def add_scalar(self, tag: str, value: float, step: int = 0):
        self._fh.write(
            frame_record(
                encode_event(time.time(), step=step, scalars=[(tag, value)])
            )
        )

    def flush(self):
        self._fh.flush()

    def close(self):
        self._fh.flush()
        self._fh.close()


def read_records(path: str) -> Iterator[bytes]:
    """Iterate raw Event payloads from an event file, verifying CRCs —
    used by tests and available for offline inspection."""
    with open(path, "rb") as fh:
        while True:
            header = fh.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            hcrc_raw = fh.read(4)
            if len(hcrc_raw) < 4:
                return  # truncated tail (crashed writer): keep the prefix
            (hcrc,) = struct.unpack("<I", hcrc_raw)
            if hcrc != _masked_crc(header):
                raise ValueError(f"{path}: corrupt length crc")
            payload = fh.read(length)
            pcrc_raw = fh.read(4)
            if len(payload) < length or len(pcrc_raw) < 4:
                return  # truncated tail: the complete records stand
            (pcrc,) = struct.unpack("<I", pcrc_raw)
            if pcrc != _masked_crc(payload):
                raise ValueError(f"{path}: corrupt payload crc")
            yield payload
