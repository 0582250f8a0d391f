"""Safetensors codec parity vs the upstream `safetensors` library."""

import numpy as np
import pytest

from stablediffusion_tpu.io.safetensors_io import (
    SafetensorsFile,
    load_safetensors,
    save_safetensors,
)

safetensors_np = pytest.importorskip("safetensors.numpy")
import ml_dtypes  # noqa: E402


def _sample_tensors(rng):
    return {
        "a.weight": rng.standard_normal((4, 8)).astype(np.float32),
        "a.bias": rng.standard_normal((8,)).astype(np.float16),
        "b.ids": np.arange(12, dtype=np.int64).reshape(3, 4),
        "c.flag": np.array([True, False]),
        "d.scalar": np.array(3.5, dtype=np.float32),
        "e.bf16": rng.standard_normal((16, 2)).astype(ml_dtypes.bfloat16),
    }


def test_roundtrip_ours(tmp_path, rng):
    t = _sample_tensors(rng)
    p = tmp_path / "x.safetensors"
    save_safetensors(t, p, metadata={"format": "pt"})
    back = load_safetensors(p)
    assert set(back) == set(t)
    for k in t:
        assert back[k].dtype == t[k].dtype
        np.testing.assert_array_equal(back[k], t[k])
    with SafetensorsFile(p) as f:
        assert f.metadata == {"format": "pt"}
        assert f.shape("a.weight") == (4, 8)


def test_ours_readable_by_upstream(tmp_path, rng):
    t = _sample_tensors(rng)
    p = tmp_path / "x.safetensors"
    save_safetensors(t, p)
    theirs = safetensors_np.load_file(str(p))
    for k in t:
        if t[k].dtype == ml_dtypes.bfloat16:
            # upstream numpy API views bf16 at its own discretion; compare bytes
            np.testing.assert_array_equal(
                theirs[k].view(np.uint16).reshape(t[k].shape), t[k].view(np.uint16)
            )
        else:
            np.testing.assert_array_equal(theirs[k], t[k])


def test_upstream_readable_by_ours(tmp_path, rng):
    t = {k: v for k, v in _sample_tensors(rng).items() if v.dtype != ml_dtypes.bfloat16}
    p = tmp_path / "y.safetensors"
    safetensors_np.save_file(t, str(p))
    back = load_safetensors(p)
    for k in t:
        np.testing.assert_array_equal(back[k], t[k])


def test_bad_offsets_rejected(tmp_path):
    import json
    import struct

    header = {"t": {"dtype": "F32", "shape": [2, 2], "data_offsets": [0, 8]}}
    blob = json.dumps(header).encode()
    p = tmp_path / "bad.safetensors"
    p.write_bytes(struct.pack("<Q", len(blob)) + blob + b"\x00" * 16)
    with SafetensorsFile(p) as f:
        with pytest.raises(ValueError):
            f.tensor("t")
