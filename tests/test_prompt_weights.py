"""A1111 prompt-emphasis syntax (utils/prompt_weights.py): parser semantics,
token/weight alignment, embedding-scaling invariants, pipeline + serving
plumbing.  Beyond-parity (the reference/diffusers treat brackets literally),
default-off so the parity path stays bit-identical."""

import jax.numpy as jnp
import numpy as np
import pytest

from stablediffusion_tpu.utils.prompt_weights import (
    apply_token_weights,
    encode_with_weights,
    parse_weighted_prompt,
    strip_weight_markup,
)

from helpers import make_tiny_model, tiny_tokenizer


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "text,expected",
    [
        ("a cat", [("a cat", 1.0)]),
        ("a (cat)", [("a ", 1.0), ("cat", 1.1)]),
        ("a ((cat))", [("a ", 1.0), ("cat", 1.1 * 1.1)]),
        ("a [cat]", [("a ", 1.0), ("cat", 1 / 1.1)]),
        ("a (cat:1.5)", [("a ", 1.0), ("cat", 1.5)]),
        ("a (cat:0.25) dog", [("a ", 1.0), ("cat", 0.25), (" dog", 1.0)]),
        # nesting multiplies; explicit weight overrides only its own paren
        ("((a (b:2.0)) c)", [("a ", 1.1 * 1.1), ("b", 2.0 * 1.1 * 1.1),
                             (" c", 1.1)]),
        # escapes are literal
        (r"a \(cat\)", [("a (cat)", 1.0)]),
        (r"\[lo\]", [("[lo]", 1.0)]),
        # unmatched closers are literal text
        ("a) b]", [("a) b]", 1.0)]),
        # unmatched opener emphasizes the rest
        ("a (cat dog", [("a ", 1.0), ("cat dog", 1.1)]),
        # a colon outside brackets / non-numeric weight is literal
        ("a: cat", [("a: cat", 1.0)]),
        ("(a:b)", [("a:b", 1.1)]),
        ("", [("", 1.0)]),
    ],
)
def test_parse(text, expected):
    got = parse_weighted_prompt(text)
    assert len(got) == len(expected), got
    for (gt, gw), (et, ew) in zip(got, expected):
        assert gt == et, got
        assert gw == pytest.approx(ew), got


def test_strip_markup():
    assert strip_weight_markup("a ((cat:1.3)) [dog] \\(x\\)") == "a cat dog (x)"


# ---------------------------------------------------------------------------
# tokenization alignment
# ---------------------------------------------------------------------------


def test_ids_match_plain_tokenizer_and_weights_align():
    tok = tiny_tokenizer()
    ids, w = encode_with_weights(tok, ["a (cat:1.5) dog"])
    plain = tok(["a cat dog"])
    np.testing.assert_array_equal(ids, plain)
    # the "cat" token(s) carry 1.5; bos/eos/pad carry 1.0
    cat_ids = tok.tokenize("cat")
    row_ids, row_w = list(ids[0]), list(w[0])
    for cid in cat_ids:
        assert row_w[row_ids.index(cid)] == pytest.approx(1.5)
    assert row_w[0] == 1.0 and row_w[-1] == 1.0


def test_unweighted_markup_free_prompt_is_all_ones():
    tok = tiny_tokenizer()
    ids, w = encode_with_weights(tok, ["a cat dog"])
    assert (w == 1.0).all()
    np.testing.assert_array_equal(ids, tok(["a cat dog"]))


def test_truncation_keeps_alignment():
    tok = tiny_tokenizer()
    long = "(cat:2.0) " * 200
    ids, w = encode_with_weights(tok, [long])
    assert ids.shape == w.shape == (1, tok.model_max_length)


# ---------------------------------------------------------------------------
# embedding scaling
# ---------------------------------------------------------------------------


def test_apply_token_weights_mean_preserved():
    h = jnp.asarray(np.random.default_rng(0).standard_normal((2, 7, 16)),
                    jnp.float32)
    w = np.ones((2, 7), np.float32)
    w[:, 3] = 1.8
    out = apply_token_weights(h, w)
    np.testing.assert_allclose(
        np.asarray(out.mean(axis=(1, 2))), np.asarray(h.mean(axis=(1, 2))),
        rtol=1e-5,
    )
    # weighted token moved relative to its neighbors
    assert float(jnp.abs(out[:, 3] - h[:, 3]).max()) > 0


def test_all_ones_weights_are_identity():
    h = jnp.asarray(np.random.default_rng(1).standard_normal((1, 5, 8)),
                    jnp.float32)
    out = apply_token_weights(h, np.ones((1, 5), np.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(h), rtol=1e-6)


# ---------------------------------------------------------------------------
# pipeline integration
# ---------------------------------------------------------------------------


def test_pipeline_weighting_changes_output_only_when_marked():
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    model = make_tiny_model("sd15")
    pipe = StableDiffusionUnifiedPipeline()
    kw = dict(height=32, width=32, num_inference_steps=2, seed=7)

    base = pipe(model, prompt="a cat", **kw)
    # markup-free prompt: weighting flag is a numeric no-op
    same = pipe(model, prompt="a cat", prompt_weighting=True, **kw)
    np.testing.assert_array_equal(base.images, same.images)
    # emphasized prompt diverges
    heavy = pipe(model, prompt="a (cat:1.8)", prompt_weighting=True, **kw)
    assert np.abs(heavy.images - base.images).max() > 1e-7
    # default (parity) path treats brackets literally -> differs from both
    literal = pipe(model, prompt="a (cat:1.8)", **kw)
    assert np.abs(literal.images - heavy.images).max() > 1e-7


def test_sd3_pipeline_weighting_smoke():
    from test_sd3 import make_tiny_sd3_model  # reuse tiny SD3 fixture

    from stablediffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline

    model = make_tiny_sd3_model()
    pipe = StableDiffusion3Pipeline()
    kw = dict(height=32, width=32, num_inference_steps=2, seed=3)
    base = pipe(model, prompt="a cat", **kw)
    heavy = pipe(model, prompt="a (cat:1.8)", prompt_weighting=True, **kw)
    assert np.isfinite(heavy.images).all()
    assert np.abs(heavy.images - base.images).max() > 1e-7


def test_serving_arg_key_registered():
    from stablediffusion_tpu.serve.handler import INFERENCE_ARG_KEYS

    assert "prompt_weighting" in INFERENCE_ARG_KEYS


# ---------------------------------------------------------------------------
# long-prompt chunking (A1111 >75-token mode)
# ---------------------------------------------------------------------------


def test_num_chunks_and_chunk_layout():
    from stablediffusion_tpu.utils.prompt_weights import (
        encode_chunked,
        num_chunks,
    )

    tok = tiny_tokenizer()
    assert num_chunks(tok, "a cat") == 1
    long = "(cat:1.5) " * 100  # 100 content tokens -> 2 windows of 75
    assert num_chunks(tok, long) == 2
    ids, w = encode_chunked(tok, [long, "a cat"], k=2)
    assert ids.shape == w.shape == (2, 2, tok.model_max_length)
    # every chunk starts with BOS; EOS follows its content
    assert (ids[:, :, 0] == tok.bos_token_id).all()
    assert (w[:, :, 0] == 1.0).all()
    # long prompt: both chunks carry weighted content
    assert (w[0, 0] == 1.5).sum() > 0 and (w[0, 1] == 1.5).sum() > 0
    # short prompt: chunk 1 is an empty (BOS EOS PAD...) window
    assert ids[1, 1, 1] == tok.eos_token_id
    # chunk 0 of the short prompt matches the plain single-window encode
    from stablediffusion_tpu.utils.prompt_weights import encode_with_weights

    plain, _ = encode_with_weights(tok, ["a cat"])
    np.testing.assert_array_equal(ids[1, 0], plain[0])


def test_pipeline_long_prompt_chunks_through():
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    model = make_tiny_model("sd15")
    pipe = StableDiffusionUnifiedPipeline()
    kw = dict(height=32, width=32, num_inference_steps=2, seed=5)
    long = "a cat " * 40 + "(dog:1.4)"  # >75 tokens; tail only in chunk 2
    trunc = pipe(model, prompt=long, **kw)  # default: truncated at 77
    chunked = pipe(model, prompt=long, prompt_weighting=True, **kw)
    # the chunked encoding sees the tail tokens the truncated one lost
    assert np.abs(chunked.images - trunc.images).max() > 1e-7
    assert np.isfinite(chunked.images).all()


def test_pipeline_long_prompt_sdxl_smoke():
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    model = make_tiny_model("sdxl")
    pipe = StableDiffusionUnifiedPipeline()
    long = "a cat " * 40 + "(dog:1.4)"
    out = pipe(model, prompt=long, prompt_weighting=True, height=32,
               width=32, num_inference_steps=2, seed=5)
    assert np.isfinite(out.images).all()


def test_weighted_requests_take_the_serial_path():
    """A1111 chunk count depends on the longest prompt in the encoded batch,
    so prompt_weighting requests must never merge (composition invariance)."""
    from stablediffusion_tpu.serve.batcher import _batchable

    base = {"prompt": "a cat", "seed": 1}
    assert _batchable(dict(base))
    assert not _batchable({**base, "prompt_weighting": True})
    # falsy value doesn't needlessly lose batching
    assert _batchable({**base, "prompt_weighting": False})


def test_apply_token_weights_degenerate_mean_skips_renorm():
    # craft hidden states whose weighted mean cancels to ~0
    h = jnp.asarray([[[1.0], [-1.0]]], jnp.float32)  # mean 0 already
    w = np.asarray([[1.0, 1.0]], np.float32) * 3.0
    out = np.asarray(apply_token_weights(h, w))
    # mean1 == 0 -> no renormalization: output is just the scaled values
    np.testing.assert_allclose(out, np.asarray(h) * 3.0, rtol=1e-6)
