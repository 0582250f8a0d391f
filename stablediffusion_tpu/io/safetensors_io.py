"""First-party safetensors codec.

The reference gets this from the `safetensors` Rust wheel
(ref: requirements.txt:152; LoRA save/load models/stable_diffusion.py:258-295,
train_lora_pipeline.py:514-528).  The format is deliberately simple — an
8-byte little-endian header length, a JSON header mapping tensor names to
{dtype, shape, data_offsets}, then raw contiguous little-endian tensor bytes —
so this is a standalone implementation (numpy + mmap; a C++ fast path can
slot under the same API).  bfloat16 is supported via ml_dtypes, which JAX
guarantees present.

Validated against the upstream `safetensors` library in
tests/test_safetensors_io.py for byte-exact interchange.
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Dict, Mapping, Optional, Tuple

import numpy as np

try:  # ml_dtypes ships with jax
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
    _FP8_E4M3 = np.dtype(ml_dtypes.float8_e4m3fn)
    _FP8_E5M2 = np.dtype(ml_dtypes.float8_e5m2)
except ImportError:  # pragma: no cover
    _BFLOAT16 = _FP8_E4M3 = _FP8_E5M2 = None

_STR_TO_DTYPE: Dict[str, np.dtype] = {
    "F64": np.dtype("<f8"),
    "F32": np.dtype("<f4"),
    "F16": np.dtype("<f2"),
    "I64": np.dtype("<i8"),
    "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"),
    "I8": np.dtype("i1"),
    "U64": np.dtype("<u8"),
    "U32": np.dtype("<u4"),
    "U16": np.dtype("<u2"),
    "U8": np.dtype("u1"),
    "BOOL": np.dtype("bool"),
}
if _BFLOAT16 is not None:
    _STR_TO_DTYPE["BF16"] = _BFLOAT16
    _STR_TO_DTYPE["F8_E4M3"] = _FP8_E4M3
    _STR_TO_DTYPE["F8_E5M2"] = _FP8_E5M2

_DTYPE_TO_STR = {v: k for k, v in _STR_TO_DTYPE.items()}

_MAX_HEADER = 100 * 1024 * 1024  # sanity bound on header size


class SafetensorsFile:
    """Lazy, mmap-backed reader.

    >>> with SafetensorsFile(path) as f:
    ...     names = f.keys()
    ...     arr = f.tensor("model.diffusion_model.out.2.weight")
    """

    def __init__(self, path: str | os.PathLike):
        self.path = os.fspath(path)
        self._file = open(self.path, "rb")
        try:
            head = self._file.read(8)
            if len(head) != 8:
                raise ValueError(f"{self.path}: truncated safetensors header")
            (header_len,) = struct.unpack("<Q", head)
            if header_len > _MAX_HEADER:
                raise ValueError(f"{self.path}: header length {header_len} too large")
            header = json.loads(self._file.read(header_len))
        except Exception:
            self._file.close()
            raise
        self.metadata: Dict[str, str] = header.pop("__metadata__", {}) or {}
        self._entries: Dict[str, dict] = header
        self._data_start = 8 + header_len
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)

    # -- container protocol -------------------------------------------------
    def keys(self):
        return self._entries.keys()

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __iter__(self):
        return iter(self._entries)

    def __len__(self) -> int:
        return len(self._entries)

    def shape(self, name: str) -> Tuple[int, ...]:
        return tuple(self._entries[name]["shape"])

    def dtype(self, name: str) -> np.dtype:
        return _STR_TO_DTYPE[self._entries[name]["dtype"]]

    def tensor(self, name: str) -> np.ndarray:
        """Zero-copy view into the mmap (read-only)."""
        e = self._entries[name]
        dt = _STR_TO_DTYPE[e["dtype"]]
        start, end = e["data_offsets"]
        shape = tuple(e["shape"])
        n = int(np.prod(shape)) if shape else 1
        expected = n * dt.itemsize
        if end - start != expected:
            raise ValueError(
                f"{self.path}:{name}: offsets span {end - start} bytes, "
                f"expected {expected}"
            )
        buf = self._mm[self._data_start + start : self._data_start + end]
        arr = np.frombuffer(buf, dtype=dt, count=n).reshape(shape)
        arr.flags.writeable = False
        return arr

    def __getitem__(self, name: str) -> np.ndarray:
        return self.tensor(name)

    def close(self):
        self._mm.close()
        self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_safetensors(path: str | os.PathLike) -> Dict[str, np.ndarray]:
    """Eagerly load every tensor (copies out of the mmap)."""
    with SafetensorsFile(path) as f:
        return {name: np.array(f.tensor(name)) for name in f.keys()}


def save_safetensors(
    tensors: Mapping[str, np.ndarray],
    path: str | os.PathLike,
    metadata: Optional[Mapping[str, str]] = None,
) -> None:
    """Write a safetensors file (sorted keys, contiguous little-endian data)."""
    entries = {}
    offset = 0
    names = sorted(tensors.keys())
    arrays = []
    for name in names:
        arr = np.ascontiguousarray(tensors[name])
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        key = np.dtype(arr.dtype)
        if key not in _DTYPE_TO_STR:
            raise TypeError(f"{name}: unsupported dtype {arr.dtype}")
        nbytes = arr.nbytes
        entries[name] = {
            "dtype": _DTYPE_TO_STR[key],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        arrays.append(arr)
        offset += nbytes

    header: Dict[str, object] = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    header.update(entries)
    blob = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # pad header to 8-byte alignment with spaces (matches upstream behavior)
    pad = (8 - (len(blob) + 8) % 8) % 8
    blob += b" " * pad

    tmp = f"{os.fspath(path)}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(struct.pack("<Q", len(blob)))
        fh.write(blob)
        for arr in arrays:
            fh.write(arr.tobytes())
    os.replace(tmp, path)
