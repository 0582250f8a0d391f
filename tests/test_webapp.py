"""Web UI template: renders and carries every control the serving layer
understands (a field silently dropped from the page is invisible breakage —
the UI posts plain JSON, so this is the only contract)."""

from stablediffusion_tpu.serve.webapp import index_html


def test_template_renders_with_all_controls():
    h = index_html()
    for field in (
        "model_type", "model_name", "loras", "ti", "scheduler",
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
