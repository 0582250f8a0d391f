"""Web UI template: renders and carries every control the serving layer
understands (a field silently dropped from the page is invisible breakage —
the UI posts plain JSON, so this is the only contract)."""

from stablediffusion_tpu.serve.webapp import index_html


def test_template_renders_with_all_controls():
    h = index_html()
    for field in (
        "model_type", "model_name", "loras", "ti", "scheduler", "quantize",
        "prompt", "negative_prompt", "steps", "cfg", "clip_skip", "seed",
        "width", "height", "nimg", "vae_tiling", "prompt_weighting",
        "hires_scale", "hires_strength", "strength", "image", "mask_image",
        "train_data_dir", "train_rank", "train_steps", "train_res",
    ):
        assert f"id=\"{field}\"" in h, field
    # model-block JS posts the right keys
    for key in ("textual_inversion", "loras", "scheduler",
                "hires_scale", "prompt_weighting"):
        assert key in h, key
    # .format left no unexpanded placeholders
    import re

    assert not re.search(r"\{sched_options\}", h)


def test_build_ui_request_full_mapping():
    """The gradio variant's request construction (pure, no gradio needed):
    every UI control lands on the serving JSON schema key the HTML UI
    posts — the two front-ends must stay interchangeable."""
    import numpy as np
    import pytest

    from stablediffusion_tpu.serve.webapp import (
        build_train_request,
        build_ui_request,
        parse_lora_spec,
        parse_ti_spec,
    )

    assert parse_lora_spec("style:0.7, detail") == {"style": 0.7, "detail": 1.0}
    assert parse_ti_spec("embeds/x.pt:tok, y.safetensors") == [
        {"path": "embeds/x.pt", "token": "tok"},
        {"path": "y.safetensors"},
    ]

    img = np.zeros((64, 64, 3), np.uint8)
    req = build_ui_request(
        "inpaint", "a cat", negative_prompt="bad", steps=12, cfg=5.5,
        seed=42, width=512, height=768, num_images=2, clip_skip=2,
        strength=0.6, scheduler="euler", model_type="sdxl",
        checkpoint="ckpt", loras="style:0.7", textual_inversions="e.pt:t",
        lora_te_scale=0.5, image=img, mask_image=img,
        prompt_weighting=True, vae_tiling=True, hires_scale=2.0,
        quantize="w8a8",
    )
    assert req["prompt"] == "a cat" and req["negative_prompt"] == "bad"
    assert req["num_inference_steps"] == 12 and req["guidance_scale"] == 5.5
    assert req["seed"] == 42 and req["clip_skip"] == 2
    assert (req["width"], req["height"]) == (512, 768)
    assert req["num_images_per_prompt"] == 2
    assert req["prompt_weighting"] and req["vae_tiling"]
    assert req["hires_scale"] == 2.0 and "hires_strength" in req
    assert req["cross_attention_kwargs"] == {"scale": 0.5}
    assert req["model"] == {
        "type": "sdxl", "name": "ckpt", "scheduler": "euler",
        "loras": {"style": 0.7},
        "textual_inversion": [{"path": "e.pt", "token": "t"}],
        "quantize": "w8a8",
    }
    assert req["image"] is img and req["mask_image"] is img
    assert req["strength"] == 0.6

    # txt2img drops image keys; seed -1 means random (absent)
    req2 = build_ui_request("txt2img", "x", seed=-1)
    assert "image" not in req2 and "seed" not in req2 and "model" not in req2

    with pytest.raises(ValueError, match="init image"):
        build_ui_request("img2img", "x")
    with pytest.raises(ValueError, match="mask"):
        build_ui_request("inpaint", "x", image=img)

    t = build_train_request("/data/d", 16, 500, 512, "out")
    assert t["mode"] == "train" and t["train"]["rank"] == 16
    with pytest.raises(ValueError):
        build_train_request("", 16, 500, 512, "out")


def test_build_ui_request_drives_handler(tmp_path):
    """End-to-end: a gradio-built request through the REAL Handler on the
    tiny model (the exact call the gradio Generate button makes)."""
    import sys

    sys.path.insert(0, "tests")
    from helpers import make_tiny_model

    from stablediffusion_tpu.serve.handler import Handler
    from stablediffusion_tpu.serve.webapp import build_ui_request

    h = Handler(model=make_tiny_model("sd15"))
    req = build_ui_request("txt2img", "a cat", steps=2, width=32, height=32,
                           seed=7, scheduler="euler")
    resp = h(req, "gradio-test")
    assert "error" not in resp, resp
    assert len(resp["images"]) == 1 and resp["seed"] == 7
