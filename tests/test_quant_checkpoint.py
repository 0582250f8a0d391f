"""int8-on-disk checkpoints: save_sd_model/save_sd3_model(quantize=...) ->
load transparently -> bit-identical to the in-memory quantize transform.

TPU-native extension attacking cold-start transfer (the tunnel/HBM floor is
bytes; int8 halves them — benchmarks/bench_coldstart.py --quantize).  The
reference serves fp16 torch with no quantized path
(/root/reference/pipelines/sd_unified_pipeline.py:465-523)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from helpers import make_tiny_model  # noqa: E402
from test_loader import _write_tokenizer_files  # noqa: E402

from stablediffusion_tpu.io.loader import (  # noqa: E402
    load_sd_model,
    save_sd_model,
)
from stablediffusion_tpu.pipelines.unified import (  # noqa: E402
    StableDiffusionUnifiedPipeline,
)


def _folder_bytes(d):
    total = 0
    for root, _, files in os.walk(d):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


from test_quant import _leaf_count  # noqa: E402


@pytest.mark.parametrize("mode", ["w8", "w8a8"])
def test_sd_quantized_checkpoint_roundtrip(tmp_path, mode):
    src = make_tiny_model("sd15")
    src.quant_min_size = 1  # tiny fixture: quantize everything eligible

    d = str(tmp_path / f"tiny-{mode}")
    save_sd_model(src, d, quantize=mode)
    _write_tokenizer_files(os.path.join(d, "tokenizer"))

    loaded = load_sd_model(d, variant=None)
    assert loaded.quant_mode == mode
    assert loaded.quant_frozen
    assert _leaf_count(loaded.unet_params, "weight_int8") > 0
    assert _leaf_count(loaded.unet_params, f"{mode}_scale") > 0

    # generation matches the in-memory quantize transform bit-exactly
    src.quantize(mode)
    pipe = StableDiffusionUnifiedPipeline()
    kw = dict(prompt="a cat", height=32, width=32, num_inference_steps=2,
              seed=3)
    a = np.asarray(pipe(src, **kw).images)
    b = np.asarray(pipe(loaded, **kw).images)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sd_quantized_checkpoint_smaller_and_frozen(tmp_path):
    src = make_tiny_model("sd15")
    src.quant_min_size = 1

    fp_dir = str(tmp_path / "fp")
    q_dir = str(tmp_path / "q")
    save_sd_model(src, fp_dir)
    save_sd_model(src, q_dir, quantize="w8")
    for d in (fp_dir, q_dir):
        _write_tokenizer_files(os.path.join(d, "tokenizer"))

    # the quantized UNet shrinks (int8 + per-channel scales vs fp32 tiny
    # fixture weights)
    fp_unet = _folder_bytes(os.path.join(fp_dir, "unet"))
    q_unet = _folder_bytes(os.path.join(q_dir, "unet"))
    assert q_unet < 0.6 * fp_unet, (q_unet, fp_unet)

    loaded = load_sd_model(q_dir, variant=None)
    # no fp base on disk: LoRA fusion and re-quantization must raise
    with pytest.raises(ValueError, match="int8-quantized checkpoint"):
        loaded.load_lora_weights("a", {"unet": {}})
    with pytest.raises(ValueError, match="int8-quantized checkpoint"):
        loaded.quantize("w8a8")
    # re-saving at the same mode round-trips; fp save is refused
    resave = str(tmp_path / "resave")
    save_sd_model(loaded, resave, quantize="w8")
    with pytest.raises(ValueError, match="quantized in memory"):
        save_sd_model(loaded, resave)
    with pytest.raises(ValueError, match="cannot write"):
        save_sd_model(loaded, resave, quantize="w8a8")


def test_quantize_cli_roundtrip(tmp_path):
    from stablediffusion_tpu.io.quantize_cli import main as qmain

    src = make_tiny_model("sd15")
    src.quant_min_size = 1
    fp_dir = str(tmp_path / "fp")
    save_sd_model(src, fp_dir)
    _write_tokenizer_files(os.path.join(fp_dir, "tokenizer"))

    q_dir = str(tmp_path / "q")
    qmain([fp_dir, q_dir, "--mode", "w8", "--min_size", "1",
           "--variant", ""])
    loaded = load_sd_model(q_dir, variant=None)
    assert loaded.quant_mode == "w8" and loaded.quant_frozen
    assert os.path.isdir(os.path.join(q_dir, "tokenizer"))  # copied over
    out = StableDiffusionUnifiedPipeline()(
        loaded, prompt="x", height=32, width=32, num_inference_steps=2,
        seed=1)
    assert np.isfinite(out.images).all()


def test_sd3_quantized_checkpoint_roundtrip(tmp_path):
    import dataclasses

    from test_sd3 import make_tiny_sd3_model

    from stablediffusion_tpu.io.loader import load_sd3_model, save_sd3_model
    from stablediffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline

    # T5-free configuration (the established save/load comparison pattern,
    # test_sd3.py::test_sd3_save_load_roundtrip)
    src = dataclasses.replace(
        make_tiny_sd3_model(), text_encoder_3_config=None,
        text_encoder_3_params=None, tokenizer_3=None)
    src.quant_min_size = 1
    d = str(tmp_path / "sd3-w8")
    save_sd3_model(src, d, quantize="w8")
    for sub in ("tokenizer", "tokenizer_2"):
        _write_tokenizer_files(os.path.join(d, sub))

    loaded = load_sd3_model(d, variant=None)
    assert loaded.quant_mode == "w8" and loaded.quant_frozen
    assert _leaf_count(loaded.transformer_params, "weight_int8") > 0

    src.quantize("w8")
    pipe = StableDiffusion3Pipeline()
    kw = dict(num_inference_steps=2, height=16, width=16, seed=5,
              max_sequence_length=16)
    a = np.asarray(pipe(src, "a cat", **kw).images)
    b = np.asarray(pipe(loaded, "a cat", **kw).images)
    np.testing.assert_allclose(a, b, atol=1e-5)
    with pytest.raises(ValueError, match="int8-quantized checkpoint"):
        loaded.load_lora_weights("a", {"transformer": {}})


def test_int8_checkpoint_through_serving(tmp_path):
    """int8-on-disk checkpoint hot-loads transparently through the serving
    handler (model dir registry convention), generates, and surfaces the
    LoRA-on-frozen-base error through the request error channel."""
    from stablediffusion_tpu.serve.handler import Handler

    src = make_tiny_model("sd15")
    src.quant_min_size = 1
    d = str(tmp_path / "sd15_TinyW8")
    save_sd_model(src, d, quantize="w8")
    _write_tokenizer_files(os.path.join(d, "tokenizer"))

    h = Handler(model_dir=str(tmp_path))
    req = dict(prompt="a cat", height=32, width=32, num_inference_steps=2,
               seed=5, model={"type": "sd15", "name": "TinyW8"})
    resp = h(req, "req-q1")
    assert "error" not in resp, resp.get("traceback")
    assert h.model.quant_frozen and h.model.quant_mode == "w8"

    # same-mode quantize request: no-op, still serves
    resp = h({**req, "model": {"type": "sd15", "name": "TinyW8",
                               "quantize": "w8"}}, "req-q2")
    assert "error" not in resp, resp.get("traceback")

    # LoRA fusion on the frozen base is a request error, not a crash
    resp = h({**req, "model": {"type": "sd15", "name": "TinyW8",
                               "loras": {"x": 1.0}}}, "req-q3")
    assert "error" in resp
    assert "int8-quantized checkpoint" in resp["error"]


def test_mixed_mode_string_roundtrip(tmp_path):
    """"w8a8:N" (mixed wide-N int8-MXU) flows through quantize -> save ->
    load -> serving idempotency as one mode string."""
    src = make_tiny_model("sd15")
    src.quant_min_size = 1
    src.quantize("w8a8:100000")  # absurd threshold -> every leaf falls to w8
    assert _leaf_count(src.unet_params, "w8_scale") > 0
    assert _leaf_count(src.unet_params, "w8a8_scale") == 0
    src.quantize("w8a8:32")  # most tiny widths >= 16 -> some w8a8 leaves
    assert _leaf_count(src.unet_params, "w8a8_scale") > 0
    src.quantize(None)

    d = str(tmp_path / "mixed")
    save_sd_model(src, d, quantize="w8a8:32")
    _write_tokenizer_files(os.path.join(d, "tokenizer"))
    loaded = load_sd_model(d, variant=None)
    assert loaded.quant_mode == "w8a8:32" and loaded.quant_frozen
    assert _leaf_count(loaded.unet_params, "w8a8_scale") > 0
    assert _leaf_count(loaded.unet_params, "w8_scale") > 0

    out = StableDiffusionUnifiedPipeline()(
        loaded, prompt="x", height=32, width=32, num_inference_steps=2,
        seed=2)
    assert np.isfinite(out.images).all()

    # serving: same mode string is a no-op, unknown base rejected
    from stablediffusion_tpu.serve.handler import Handler

    h = Handler(model=loaded)
    resp = h(dict(prompt="x", height=32, width=32, num_inference_steps=2,
                  seed=1, model={"quantize": "w8a8:32"}), "req-m1")
    assert "error" not in resp, resp.get("traceback")
    # frozen base: any re-quantization request is refused with that reason
    resp = h(dict(prompt="x", height=32, width=32, num_inference_steps=2,
                  model={"quantize": "int4:16"}), "req-m2")
    assert "error" in resp and "int8-quantized checkpoint" in resp["error"]
    # non-frozen model: a bad mode string is rejected BEFORE mutating state
    h2 = Handler(model=make_tiny_model("sd15"))
    resp = h2(dict(prompt="x", height=32, width=32, num_inference_steps=2,
                   model={"quantize": "int4:16"}), "req-m3")
    assert "error" in resp and "unknown quant mode" in resp["error"]
    assert h2.model.quant_mode is None  # state untouched by the bad request
