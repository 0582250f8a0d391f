"""A1111 prompt editing [from:to:when] + alternation [a|b] (part of the
opt-in A1111 prompt mode): per-step realization, interval schedules, unique
-variant dedup, and the step-selected embedding stack inside the compiled
denoise scan — including head-sliced (strength) plans."""

import numpy as np
import pytest

from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline
from stablediffusion_tpu.utils.prompt_edit import (
    realize_at,
    schedule_prompts,
    unique_variants,
)

from helpers import make_tiny_model


def _sched_one(text, steps):
    got = schedule_prompts([text], steps)
    return None if got is None else [(s, v[0]) for s, v in zip(*got)]


@pytest.mark.parametrize(
    "text,steps,expected",
    [
        ("a [cat:dog:0.5] x", 10, [(0, "a cat x"), (5, "a dog x")]),
        ("a [winter:4] scene", 10, [(0, "a  scene"), (4, "a winter scene")]),
        # absolute step; two edits realize on union boundaries
        ("[a:b:2] [c:d:0.8]", 10, [(0, "a c"), (2, "b c"), (8, "b d")]),
        # emphasis weight inside a segment doesn't confuse the fields
        ("a [(cat:1.3):dog:0.5]", 10, [(0, "a (cat:1.3)"), (5, "a dog")]),
        # boundary at/after the end never fires (>=1 is an ABSOLUTE step,
        # so 1.0 means step 1 — A1111 semantics; use >= steps to disable)
        ("a [cat:dog:10] x", 10, [(0, "a cat x")]),
        ("a [cat:dog:1.0] x", 10, [(0, "a cat x"), (1, "a dog x")]),
    ],
)
def test_edit_schedules(text, steps, expected):
    assert _sched_one(text, steps) == expected


def test_attention_brackets_are_not_edits():
    assert schedule_prompts(["a [cat] x"], 10) is None
    assert schedule_prompts(["x [a:b] y"], 10) is None  # no numeric when
    assert schedule_prompts(["plain"], 10) is None


def test_batch_merges_on_union_of_boundaries():
    got = schedule_prompts(["a [cat:dog:0.5]", "plain"], 10)
    assert got == ([0, 5], [["a cat", "plain"], ["a dog", "plain"]])


def test_realize_at_and_alternation_schedule():
    assert realize_at("a [cat|dog] x", 0, 4) == "a cat x"
    assert realize_at("a [cat|dog] x", 1, 4) == "a dog x"
    assert realize_at("a [cat|dog] x", 2, 4) == "a cat x"
    # attention brackets survive verbatim; edits still switch
    assert realize_at("[keep] [a:b:2]", 3, 4) == "[keep] b"
    got = schedule_prompts(["a [cat|dog]"], 4)
    assert got == (
        [0, 1, 2, 3],
        [["a cat"], ["a dog"], ["a cat"], ["a dog"]],
    )
    # collapsed edit -> single realized variant
    assert schedule_prompts(["a [cat:dog:10]"], 4) == ([0], [["a cat"]])


def test_unique_variants_dedup():
    starts, variants = schedule_prompts(["a [cat|dog]"], 6)
    uniq, idx_map = unique_variants(variants)
    assert uniq == [["a cat"], ["a dog"]]
    assert idx_map == [0, 1, 0, 1, 0, 1]
    assert len(starts) == 6


@pytest.fixture(scope="module")
def model():
    return make_tiny_model("sd15")


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusionUnifiedPipeline()


def test_pipeline_edit_interpolates_between_endpoints(model, pipe):
    kw = dict(height=32, width=32, num_inference_steps=4, seed=11,
              prompt_weighting=True)
    cat = pipe(model, prompt="a cat", **kw)
    dog = pipe(model, prompt="a dog", **kw)
    mid = pipe(model, prompt="a [cat:dog:0.5]", **kw)
    # the edited run differs from both constant-prompt runs
    assert np.abs(mid.images - cat.images).max() > 1e-7
    assert np.abs(mid.images - dog.images).max() > 1e-7
    # boundary at 0 == pure target prompt (every step uses 'dog')
    all_dog = pipe(model, prompt="a [cat:dog:0]", **kw)
    np.testing.assert_allclose(all_dog.images, dog.images, atol=1e-6)
    # boundary past the end == pure source prompt
    all_cat = pipe(model, prompt="a [cat:dog:4]", **kw)
    np.testing.assert_allclose(all_cat.images, cat.images, atol=1e-6)


def test_pipeline_edit_without_weighting_is_literal(model, pipe):
    kw = dict(height=32, width=32, num_inference_steps=2, seed=3)
    lit = pipe(model, prompt="a [cat:dog:0.5]", **kw)
    # default mode: the bracket text is literal tokens, still runs fine
    assert np.isfinite(lit.images).all()


def test_pipeline_edit_batch_mixed(model, pipe):
    out = pipe(model, prompt=["a [cat:dog:0.5]", "a cat"],
               height=32, width=32, num_inference_steps=4,
               seed=[7, 8], prompt_weighting=True)
    assert out.images.shape == (2, 32, 32, 3)
    # the un-edited batch member matches its solo render (composition
    # invariance with per-sample seeds)
    solo = pipe(model, prompt="a cat", height=32, width=32,
                num_inference_steps=4, seed=[8], prompt_weighting=True)
    np.testing.assert_allclose(out.images[1], solo.images[0], atol=1e-5)


def test_pipeline_alternation_runs_and_differs(model, pipe):
    kw = dict(height=32, width=32, num_inference_steps=4, seed=13,
              prompt_weighting=True)
    alt = pipe(model, prompt="a [cat|dog]", **kw)
    cat = pipe(model, prompt="a cat", **kw)
    assert np.isfinite(alt.images).all()
    assert np.abs(alt.images - cat.images).max() > 1e-7


def test_edit_boundary_respects_strength_slice(model, pipe):
    """img2img with strength: the scan runs only the tail of the schedule —
    a boundary in the already-dropped head means the TARGET text is active
    for every local step (full-schedule step units, shifted by the slice)."""
    img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    kw = dict(height=32, width=32, num_inference_steps=4, seed=17,
              image=img, strength=0.5, prompt_weighting=True)
    # boundary at full-step 2 == first local step of the 2-step slice
    edited = pipe(model, prompt="a [cat:dog:0.5]", **kw)
    pure_dog = pipe(model, prompt="a dog", **kw)
    np.testing.assert_allclose(edited.images, pure_dog.images, atol=1e-6)
    # boundary past the slice end -> pure source
    edited2 = pipe(model, prompt="a [cat:dog:4]", **kw)
    pure_cat = pipe(model, prompt="a cat", **kw)
    np.testing.assert_allclose(edited2.images, pure_cat.images, atol=1e-6)


def test_edit_with_long_negative_prompt(model, pipe):
    """A >75-token negative raises the main encode's chunk count; the edit
    variants must share that floor (regression: stack concat crashed)."""
    long_neg = "a cat " * 40
    out = pipe(model, prompt="a [cat:dog:0.5]", negative_prompt=long_neg,
               height=32, width=32, num_inference_steps=4, seed=19,
               prompt_weighting=True)
    assert np.isfinite(out.images).all()


def test_sd3_pipeline_edit_and_alternation():
    from test_sd3 import make_tiny_sd3_model

    from stablediffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline

    m = make_tiny_sd3_model()
    p3 = StableDiffusion3Pipeline()
    kw = dict(height=32, width=32, num_inference_steps=4, seed=6,
              prompt_weighting=True)
    cat = p3(m, prompt="a cat", **kw)
    dog = p3(m, prompt="a dog", **kw)
    mid = p3(m, prompt="a [cat:dog:0.5]", **kw)
    assert np.abs(mid.images - cat.images).max() > 1e-7
    assert np.abs(mid.images - dog.images).max() > 1e-7
    all_dog = p3(m, prompt="a [cat:dog:0]", **kw)
    np.testing.assert_allclose(all_dog.images, dog.images, atol=1e-6)
    alt = p3(m, prompt="a [cat|dog]", **kw)
    assert np.isfinite(alt.images).all()


def test_sd3_edit_boundary_respects_strength_slice():
    from test_sd3 import make_tiny_sd3_model

    from stablediffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline

    m = make_tiny_sd3_model()
    p3 = StableDiffusion3Pipeline()
    img = np.random.default_rng(1).uniform(size=(32, 32, 3)).astype(np.float32)
    kw = dict(height=32, width=32, num_inference_steps=4, seed=23,
              image=img, strength=0.5, prompt_weighting=True)
    edited = p3(m, prompt="a [cat:dog:0.5]", **kw)
    pure_dog = p3(m, prompt="a dog", **kw)
    np.testing.assert_allclose(edited.images, pure_dog.images, atol=1e-6)


def test_edit_combines_with_hires_fix(model, pipe):
    out = pipe(model, prompt="a [cat:dog:0.5]", height=64, width=64,
               num_inference_steps=4, seed=21, prompt_weighting=True,
               hires_scale=2.0, hires_strength=0.6)
    assert out.images.shape == (1, 64, 64, 3)
    assert np.isfinite(out.images).all()


def test_pipeline_edit_order2_scheduler(pipe):
    """Heun spends plan.order scan indices per sampler step, so edit
    boundaries (sampler-step units) must scale by the order: the exact
    endpoint identities of test_pipeline_edit_interpolates_between_endpoints
    must hold unchanged under an order-2 plan."""
    heun = make_tiny_model("sd15", scheduler_name="heun")
    kw = dict(height=32, width=32, num_inference_steps=4, seed=11,
              prompt_weighting=True)
    cat = pipe(heun, prompt="a cat", **kw)
    dog = pipe(heun, prompt="a dog", **kw)
    mid = pipe(heun, prompt="a [cat:dog:0.5]", **kw)
    assert np.abs(mid.images - cat.images).max() > 1e-7
    assert np.abs(mid.images - dog.images).max() > 1e-7
    all_dog = pipe(heun, prompt="a [cat:dog:0]", **kw)
    np.testing.assert_allclose(all_dog.images, dog.images, atol=1e-6)
    all_cat = pipe(heun, prompt="a [cat:dog:4]", **kw)
    np.testing.assert_allclose(all_cat.images, cat.images, atol=1e-6)
