"""RGL ``tensor_file`` binary format reader/writer
(src/core/tensor.cpp:7-53; header 'tensor_file', u8 version[2],
u32 field count, then per field: u16 name_len, name, u16 ndim,
u8 dtype, u64 offset, u64 shape[ndim]).

Used by the measured BSDF (.bsdf files from rgl.epfl.ch/materials) and
by the test suite, which bakes analytic BRDFs into the same format.
"""

from __future__ import annotations

import struct as _struct

import numpy as np

_MAGIC = b"tensor_file\x00"

# Struct::Type enum (core/struct.h:25-37)
_DTYPES = {
    1: np.uint8, 2: np.int8, 3: np.uint16, 4: np.int16,
    5: np.uint32, 6: np.int32, 7: np.uint64, 8: np.int64,
    9: np.float16, 10: np.float32, 11: np.float64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def read_tensor_file(path: str) -> dict:
    """Parse a .bsdf/.tensor file -> {name: ndarray}."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:12] != _MAGIC:
        raise ValueError(f"{path}: not a tensor_file")
    n_fields, = _struct.unpack_from("<I", raw, 14)
    pos = 18
    out = {}
    for _ in range(n_fields):
        name_len, = _struct.unpack_from("<H", raw, pos)
        pos += 2
        name = raw[pos:pos + name_len].decode("utf-8")
        pos += name_len
        ndim, = _struct.unpack_from("<H", raw, pos)
        pos += 2
        dtype_code, = _struct.unpack_from("<B", raw, pos)
        pos += 1
        offset, = _struct.unpack_from("<Q", raw, pos)
        pos += 8
        shape = _struct.unpack_from(f"<{ndim}Q", raw, pos)
        pos += 8 * ndim
        dt = _DTYPES.get(dtype_code)
        if dt is None:
            raise ValueError(f"{path}: field {name}: bad dtype "
                             f"{dtype_code}")
        count = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(raw, dtype=dt, count=count, offset=offset)
        out[name] = arr.reshape(shape).copy()
    return out


def write_tensor_file(path: str, fields: dict):
    """Write {name: ndarray} in the reference's layout (for tests and
    data baking)."""
    names = list(fields)
    header = bytearray()
    header += _MAGIC
    header += bytes([1, 0])                      # version
    header += _struct.pack("<I", len(names))
    # first pass: compute header size
    hsize = len(header)
    for name in names:
        arr = np.ascontiguousarray(fields[name])
        hsize += 2 + len(name.encode()) + 2 + 1 + 8 + 8 * arr.ndim
    # second pass: emit
    body = bytearray()
    offset = hsize
    for name in names:
        arr = np.ascontiguousarray(fields[name])
        code = _DTYPE_CODES.get(arr.dtype)
        if code is None:
            raise ValueError(f"{name}: unsupported dtype {arr.dtype}")
        nb = name.encode()
        header += _struct.pack("<H", len(nb)) + nb
        header += _struct.pack("<H", arr.ndim)
        header += _struct.pack("<B", code)
        header += _struct.pack("<Q", offset)
        header += _struct.pack(f"<{arr.ndim}Q", *arr.shape)
        body += arr.tobytes()
        offset += arr.nbytes
    with open(path, "wb") as f:
        f.write(bytes(header) + bytes(body))
