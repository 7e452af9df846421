"""Dependency-free TFRecord framing reader/writer.

The reference's Waymo extraction iterates TFRecords through TensorFlow
(tf.data.TFRecordDataset, e.g. preprocessing/waymo_data/testset/
time_stamp.py:37-42). TF is absent in this image, and all the extraction
actually needs from it is the record framing, which is a tiny fixed
format — per record:

    uint64  length           (little-endian)
    uint32  masked_crc32c(length bytes)
    bytes   payload[length]
    uint32  masked_crc32c(payload)

crc32c is the Castagnoli CRC; the mask is rot-right-15 plus a constant.
Verification is optional (off by default: the python byte loop is slow on
multi-MB lidar records, and corrupt records still fail proto parsing).
"""
from __future__ import annotations

import os
import struct
from typing import Iterator

_POLY = 0x82F63B78
_MASK_DELTA = 0xA282EAD8
_TABLE: list[int] = []


def _table() -> list[int]:
    if not _TABLE:
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ (_POLY if c & 1 else 0)
            _TABLE.append(c)
    return _TABLE


def _crc32c_py(data: bytes, crc: int = 0) -> int:
    t = _table()
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = t[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def crc32c(data: bytes, crc: int = 0) -> int:
    """Dispatches to the native C++ kernel (runtime/src/host_ops.cpp) when
    the library is built; pure-python table loop otherwise."""
    try:
        from .. import runtime

        if runtime.available():
            return int(runtime._lib.crc32c(bytes(data), len(data), crc))
    except Exception:
        pass
    return _crc32c_py(data, crc)


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def read_tfrecord(path: str, verify_crc: bool = False) -> Iterator[bytes]:
    """Yield raw record payloads from a TFRecord file."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        while f.tell() < size:
            hdr = f.read(12)
            if len(hdr) < 12:
                raise IOError(f"truncated TFRecord header in {path}")
            (length,) = struct.unpack("<Q", hdr[:8])
            if verify_crc:
                (crc_len,) = struct.unpack("<I", hdr[8:12])
                if masked_crc(hdr[:8]) != crc_len:
                    raise IOError(f"length CRC mismatch in {path}")
            payload = f.read(length)
            if len(payload) < length:
                raise IOError(f"truncated TFRecord payload in {path}")
            tail = f.read(4)
            if verify_crc:
                (crc_data,) = struct.unpack("<I", tail)
                if masked_crc(payload) != crc_data:
                    raise IOError(f"payload CRC mismatch in {path}")
            yield payload


def write_tfrecord(path: str, payloads) -> None:
    """Write payload byte strings with correct framing + CRCs."""
    with open(path, "wb") as f:
        for p in payloads:
            hdr = struct.pack("<Q", len(p))
            f.write(hdr)
            f.write(struct.pack("<I", masked_crc(hdr)))
            f.write(p)
            f.write(struct.pack("<I", masked_crc(p)))
