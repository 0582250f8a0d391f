"""CLIP text encoder parity vs transformers (torch CPU), through the real
checkpoint-conversion path (state_dict -> canonical pytree)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from stablediffusion_tpu.core.config import CLIPTextConfig, tiny_clip_config
from stablediffusion_tpu.io.torch_convert import convert_state_dict
from stablediffusion_tpu.models import clip


def _hf_model(with_projection: bool):
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel, CLIPTextModelWithProjection

    cfg = tiny_clip_config(with_projection)
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="quick_gelu",
        projection_dim=cfg.projection_dim,
        eos_token_id=cfg.eos_token_id,
        bos_token_id=0,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    cls = CLIPTextModelWithProjection if with_projection else CLIPTextModel
    return cls(hf_cfg).eval(), cfg


def _ids(cfg, batch=2):
    rng = np.random.default_rng(1)
    ids = rng.integers(2, cfg.vocab_size - 1, size=(batch, 77))
    ids[:, 0] = 0  # bos
    ids[0, 10] = cfg.eos_token_id
    ids[0, 11:] = cfg.eos_token_id  # pad-with-eos like CLIPTokenizer
    ids[1, 30] = cfg.eos_token_id
    ids[1, 31:] = cfg.eos_token_id
    return ids.astype(np.int32)


@pytest.mark.parametrize("with_projection", [False, True])
def test_clip_parity(with_projection):
    model, cfg = _hf_model(with_projection)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_state_dict(sd)
    ids = _ids(cfg)

    with torch.no_grad():
        hf = model(torch.from_numpy(ids.astype(np.int64)), output_hidden_states=True)
    ours = clip.apply(params, cfg, jnp.asarray(ids))

    # all hidden states
    assert len(ours.hidden_states) == cfg.num_hidden_layers + 1
    for i, h in enumerate(ours.hidden_states):
        np.testing.assert_allclose(
            np.asarray(h), hf.hidden_states[i].numpy(), atol=2e-5, err_msg=f"layer {i}"
        )
    np.testing.assert_allclose(
        np.asarray(ours.last_hidden_state), hf.last_hidden_state.numpy(), atol=2e-5
    )
    if with_projection:
        np.testing.assert_allclose(
            np.asarray(ours.projected_pooled), hf.text_embeds.numpy(), atol=2e-5
        )
    else:
        np.testing.assert_allclose(
            np.asarray(ours.pooled_output), hf.pooler_output.numpy(), atol=2e-5
        )


def test_clip_skip_selection():
    model, cfg = _hf_model(False)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_state_dict(sd)
    ids = _ids(cfg)
    out = clip.apply(params, cfg, jnp.asarray(ids))
    # SDXL convention: clip_skip=0 -> penultimate hidden state
    np.testing.assert_array_equal(
        np.asarray(out.skip_layer(0)), np.asarray(out.hidden_states[-2])
    )
    # SD1.5 convention: final_layer_norm re-applied to the skipped layer
    renormed = clip.final_layer_norm(params, cfg, out.hidden_states[-2])
    with torch.no_grad():
        hf_h = model(
            torch.from_numpy(ids.astype(np.int64)), output_hidden_states=True
        ).hidden_states[-2]
        hf_renorm = model.text_model.final_layer_norm(hf_h)
    np.testing.assert_allclose(np.asarray(renormed), hf_renorm.numpy(), atol=2e-5)


def test_init_params_structure_matches_loader():
    import jax

    cfg = tiny_clip_config(True)
    init = clip.init_params(jax.random.key(0), cfg)
    model, _ = _hf_model(True)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    loaded = convert_state_dict(sd)

    init_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(init)}
    load_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(loaded)}
    assert {str(p) for p in init_paths} == {str(p) for p in load_paths}
