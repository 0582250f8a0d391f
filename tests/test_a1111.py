"""A1111/LDM converter: synthetic LDM checkpoints -> diffusers naming.

Ground truth is built by inverse-mapping a tiny diffusers-format model into
LDM key naming (test-local inverse), converting back with the real converter,
and requiring exact dict equality — any drift in block indexing, resnet
renames or attention squeezes breaks it.
"""

import os

import numpy as np
import pytest

from stablediffusion_tpu.core.config import tiny_unet_config, tiny_vae_config
from stablediffusion_tpu.io.a1111 import (
    convert_a1111_checkpoint,
    convert_ldm_clip,
    convert_ldm_unet,
    convert_ldm_vae,
    convert_open_clip,
    create_unet_config,
    detect_model_type,
    extract_ema,
    infer_unet_params_from_state,
)
from stablediffusion_tpu.io.torch_convert import deconvert_tensor, flatten
from stablediffusion_tpu.models import unet as unet_model
from stablediffusion_tpu.models import vae as vae_model

import jax

_RESNET_INV = {
    "norm1": "in_layers.0",
    "conv1": "in_layers.2",
    "time_emb_proj": "emb_layers.1",
    "norm2": "out_layers.0",
    "conv2": "out_layers.3",
    "conv_shortcut": "skip_connection",
}


def _diffusers_flat(params):
    return {
        k: deconvert_tensor(k, np.asarray(v)) for k, v in flatten(params).items()
    }


def _unet_to_ldm(flat, cfg):
    """Inverse map: diffusers UNet keys -> LDM keys."""
    import re

    L = cfg.layers_per_block
    n = len(cfg.block_out_channels)
    out = {}
    for key, val in flat.items():
        if key.startswith("conv_in."):
            nk = "input_blocks.0.0." + key[len("conv_in."):]
        elif key.startswith("time_embedding.linear_1."):
            nk = "time_embed.0." + key.split(".")[-1]
        elif key.startswith("time_embedding.linear_2."):
            nk = "time_embed.2." + key.split(".")[-1]
        elif key.startswith("conv_norm_out."):
            nk = "out.0." + key.split(".")[-1]
        elif key.startswith("conv_out."):
            nk = "out.2." + key.split(".")[-1]
        elif m := re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(\w+)\.(.*)", key):
            i, j, part, r = int(m.group(1)), int(m.group(2)), m.group(3), m.group(4)
            nk = f"input_blocks.{1 + i*(L+1) + j}.0.{_RESNET_INV[part]}.{r}"
        elif m := re.match(r"down_blocks\.(\d+)\.attentions\.(\d+)\.(.*)", key):
            i, j, r = int(m.group(1)), int(m.group(2)), m.group(3)
            nk = f"input_blocks.{1 + i*(L+1) + j}.1.{r}"
        elif m := re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)", key):
            i, r = int(m.group(1)), m.group(2)
            nk = f"input_blocks.{1 + i*(L+1) + L}.0.op.{r}"
        elif m := re.match(r"mid_block\.resnets\.(\d)\.(\w+)\.(.*)", key):
            j, part, r = int(m.group(1)), m.group(2), m.group(3)
            nk = f"middle_block.{0 if j == 0 else 2}.{_RESNET_INV[part]}.{r}"
        elif m := re.match(r"mid_block\.attentions\.0\.(.*)", key):
            nk = f"middle_block.1.{m.group(1)}"
        elif m := re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.(\w+)\.(.*)", key):
            i, j, part, r = int(m.group(1)), int(m.group(2)), m.group(3), m.group(4)
            nk = f"output_blocks.{i*(L+1) + j}.0.{_RESNET_INV[part]}.{r}"
        elif m := re.match(r"up_blocks\.(\d+)\.attentions\.(\d+)\.(.*)", key):
            i, j, r = int(m.group(1)), int(m.group(2)), m.group(3)
            nk = f"output_blocks.{i*(L+1) + j}.1.{r}"
        elif m := re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)", key):
            i, r = int(m.group(1)), m.group(2)
            slot = 2 if cfg.up_block_types[i] == "CrossAttnUpBlock2D" else 1
            nk = f"output_blocks.{i*(L+1) + L}.{slot}.conv.{r}"
        elif key.startswith("add_embedding.linear_1."):
            nk = "label_emb.0.0." + key.split(".")[-1]
        elif key.startswith("add_embedding.linear_2."):
            nk = "label_emb.0.2." + key.split(".")[-1]
        else:
            raise AssertionError(f"inverse map missing for {key}")
        out["model.diffusion_model." + nk] = val
    return out


def _vae_to_ldm(flat):
    import re

    n_up = 2  # tiny vae: 2 blocks
    out = {}
    for key, val in flat.items():
        if key.startswith(("quant_conv.", "post_quant_conv.")):
            out["first_stage_model." + key] = val
            continue
        side, rest = key.split(".", 1)
        if rest.startswith(("conv_in.", "conv_out.")):
            nk = rest
        elif rest.startswith("conv_norm_out."):
            nk = "norm_out." + rest[len("conv_norm_out."):]
        elif m := re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", rest):
            r = m.group(3).replace("conv_shortcut", "nin_shortcut")
            nk = f"down.{m.group(1)}.block.{m.group(2)}.{r}"
        elif m := re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)", rest):
            nk = f"down.{m.group(1)}.downsample.conv.{m.group(2)}"
        elif m := re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", rest):
            r = m.group(3).replace("conv_shortcut", "nin_shortcut")
            nk = f"up.{n_up - 1 - int(m.group(1))}.block.{m.group(2)}.{r}"
        elif m := re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)", rest):
            nk = f"up.{n_up - 1 - int(m.group(1))}.upsample.conv.{m.group(2)}"
        elif m := re.match(r"mid_block\.resnets\.(\d)\.(.*)", rest):
            nk = f"mid.block_{int(m.group(1)) + 1}.{m.group(2)}"
        elif m := re.match(r"mid_block\.attentions\.0\.(\w+(?:\.0)?)\.(.*)", rest):
            part, r = m.group(1), m.group(2)
            inv = {"group_norm": "norm", "to_q": "q", "to_k": "k",
                   "to_v": "v", "to_out.0": "proj_out"}[part]
            # LDM stores attention projections as 1x1 convs
            if r == "weight" and inv != "norm" and val.ndim == 2:
                val = val[:, :, None, None]
            nk = f"mid.attn_1.{inv}.{r}"
        else:
            raise AssertionError(f"inverse map missing for {key}")
        out[f"first_stage_model.{side}.{nk}"] = val
    return out


@pytest.fixture(scope="module")
def tiny_state():
    ucfg = tiny_unet_config()
    vcfg = tiny_vae_config()
    up = unet_model.init_params(jax.random.key(0), ucfg)
    vp = vae_model.init_params(jax.random.key(1), vcfg)
    uflat = _diffusers_flat(up)
    vflat = _diffusers_flat(vp)
    state = {}
    state.update(_unet_to_ldm(uflat, ucfg))
    state.update(_vae_to_ldm(vflat))
    return state, uflat, vflat, ucfg


def test_unet_key_mapping_exact(tiny_state):
    state, uflat, _, ucfg = tiny_state
    cfg = dict(
        block_out_channels=list(ucfg.block_out_channels),
        layers_per_block=ucfg.layers_per_block,
        down_block_types=list(ucfg.down_block_types),
        up_block_types=list(ucfg.up_block_types),
    )
    got = convert_ldm_unet(state, cfg)
    assert set(got) == set(uflat)
    for k in uflat:
        np.testing.assert_array_equal(got[k], uflat[k], err_msg=k)


def test_vae_key_mapping_exact(tiny_state):
    state, _, vflat, _ = tiny_state
    got = convert_ldm_vae(state)
    assert set(got) == set(vflat)
    for k in vflat:
        np.testing.assert_array_equal(got[k], vflat[k], err_msg=k)


def test_infer_unet_params(tiny_state):
    state, _, _, ucfg = tiny_state
    p = infer_unet_params_from_state(state)
    assert p["model_channels"] == 16
    assert p["channel_mult"] == (1, 2)
    assert p["num_res_blocks"] == 1
    assert p["attention_resolutions"] == [1]
    assert p["context_dim"] == ucfg.cross_attention_dim
    cfg = create_unet_config(p)
    assert cfg["down_block_types"] == list(ucfg.down_block_types)
    assert cfg["up_block_types"] == list(ucfg.up_block_types)
    assert cfg["block_out_channels"] == list(ucfg.block_out_channels)


def test_clip_conversion():
    from transformers import CLIPTextConfig as HFC, CLIPTextModel
    import torch

    torch.manual_seed(0)
    hf = CLIPTextModel(HFC(vocab_size=100, hidden_size=16, intermediate_size=32,
                           num_hidden_layers=1, num_attention_heads=2))
    sd = {f"cond_stage_model.transformer.{k}": v.numpy()
          for k, v in hf.state_dict().items()}
    got = convert_ldm_clip(sd)
    want = {k: v.numpy() for k, v in hf.state_dict().items()
            if not k.endswith("position_ids")}
    assert set(got) == set(want)


def test_open_clip_qkv_split(rng):
    H = 8
    q = rng.standard_normal((H, H)).astype(np.float32)
    k = rng.standard_normal((H, H)).astype(np.float32)
    v = rng.standard_normal((H, H)).astype(np.float32)
    proj = rng.standard_normal((H, 4)).astype(np.float32)
    state = {
        "conditioner.embedders.1.model.transformer.resblocks.0.attn.in_proj_weight":
            np.concatenate([q, k, v], axis=0),
        "conditioner.embedders.1.model.transformer.resblocks.0.attn.in_proj_bias":
            np.zeros(3 * H, np.float32),
        "conditioner.embedders.1.model.transformer.resblocks.0.attn.out_proj.weight":
            q,
        "conditioner.embedders.1.model.transformer.resblocks.0.ln_1.weight":
            np.ones(H, np.float32),
        "conditioner.embedders.1.model.token_embedding.weight":
            rng.standard_normal((10, H)).astype(np.float32),
        "conditioner.embedders.1.model.positional_embedding":
            rng.standard_normal((77, H)).astype(np.float32),
        "conditioner.embedders.1.model.text_projection": proj,
        "conditioner.embedders.1.model.ln_final.weight": np.ones(H, np.float32),
    }
    got = convert_open_clip(state)
    np.testing.assert_array_equal(
        got["text_model.encoder.layers.0.self_attn.q_proj.weight"], q
    )
    np.testing.assert_array_equal(
        got["text_model.encoder.layers.0.self_attn.v_proj.weight"], v
    )
    np.testing.assert_array_equal(got["text_projection.weight"], proj.T)
    assert "text_model.embeddings.position_embedding.weight" in got


def test_detect_model_type(tiny_state):
    state, _, _, _ = tiny_state
    assert detect_model_type(state) == "sd15"
    assert detect_model_type({"conditioner.embedders.1.model.x": 0}) == "sdxl"
    assert detect_model_type({"cond_stage_model.model.x": 0}) == "sd2"


def test_extract_ema(tiny_state):
    state, _, _, _ = tiny_state
    key = "model.diffusion_model.input_blocks.0.0.weight"
    ema_key = "model_ema." + key[len("model."):].replace(".", "")
    ema_val = np.full_like(state[key], 7.0)
    state2 = {**state, ema_key: ema_val}
    out = extract_ema(state2)
    np.testing.assert_array_equal(out[key], ema_val)
    # non-EMA untouched without extract
    assert extract_ema(state)[key] is state[key]


def test_full_checkpoint_conversion(tiny_state):
    from transformers import CLIPTextConfig as HFC, CLIPTextModel
    import torch

    state, uflat, vflat, _ = tiny_state
    torch.manual_seed(0)
    hf = CLIPTextModel(HFC(vocab_size=100, hidden_size=16, intermediate_size=32,
                           num_hidden_layers=1, num_attention_heads=2))
    full = dict(state)
    full.update({
        f"cond_stage_model.transformer.{k}": v.numpy()
        for k, v in hf.state_dict().items()
    })
    weights, configs = convert_a1111_checkpoint(full)
    assert configs["model_type"] == "sd15"
    assert set(weights) == {"unet", "vae", "text_encoder"}
    assert set(weights["unet"]) == set(uflat)
    assert set(weights["vae"]) == set(vflat)


@pytest.mark.parametrize("scheduler_type", ["ddim", "heun", "lms"])
def test_convert_cli_output_loads_and_runs(tiny_state, tmp_path,
                                           scheduler_type):
    """Full loop: synthetic LDM single-file -> CLI convert -> load -> generate
    (BASELINE config 3).  Parametrized over --scheduler_type so converted
    checkpoints recording heun/lms actually construct and RUN those samplers
    (ref builds the matching classes, convert_from_A1111.py:946-1003)."""
    import json

    from transformers import CLIPTextConfig as HFC, CLIPTextModel
    import torch

    from stablediffusion_tpu.io.convert_cli import convert
    from stablediffusion_tpu.io.loader import load_sd_model
    from stablediffusion_tpu.io.safetensors_io import save_safetensors
    from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline
    from helpers import tiny_tokenizer

    state, _, _, _ = tiny_state
    torch.manual_seed(0)
    # text encoder must match tiny_clip_config for the tokenizer/eos to work
    from stablediffusion_tpu.core.config import tiny_clip_config

    tc = tiny_clip_config()
    hf = CLIPTextModel(HFC(
        vocab_size=tc.vocab_size, hidden_size=tc.hidden_size,
        intermediate_size=tc.intermediate_size,
        num_hidden_layers=tc.num_hidden_layers,
        num_attention_heads=tc.num_attention_heads,
        eos_token_id=tc.eos_token_id, bos_token_id=0, pad_token_id=1,
        hidden_act="quick_gelu",
    ))
    full = dict(state)
    full.update({
        f"cond_stage_model.transformer.{k}": v.numpy()
        for k, v in hf.state_dict().items()
    })
    ckpt = tmp_path / "model.safetensors"
    save_safetensors({k: np.ascontiguousarray(v) for k, v in full.items()}, ckpt)

    out_dir = str(tmp_path / "converted")
    mtype = convert(str(ckpt), out_dir, scheduler_type=scheduler_type)
    assert mtype == "sd15"

    # converter does not ship tokenizer files (they come from the CLIP vocab);
    # provide the tiny test tokenizer
    import os

    tok_dir = os.path.join(out_dir, "tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    tok = tiny_tokenizer()
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(tok.vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(
            f"{a} {b}" for (a, b), _ in
            sorted(tok.bpe_ranks.items(), key=lambda kv: kv[1])))

    model = load_sd_model(out_dir, variant=None)
    # the recorded --scheduler_type resolves to the registry sampler
    expected = {"ddim": "DDIM", "heun": "heun", "lms": "lms"}[scheduler_type]
    assert model.scheduler_name == expected
    from stablediffusion_tpu.schedulers import make_scheduler

    assert type(model.scheduler) is type(
        make_scheduler(expected, model.scheduler_config)
    )
    # head count and norm groups are not recoverable from shapes; real
    # checkpoints use the LDM defaults (8 heads / 32 groups) — tiny uses 2 / 8
    import dataclasses

    model.unet_config = dataclasses.replace(
        model.unet_config, num_attention_heads=2, norm_num_groups=8
    )
    model.vae_config = dataclasses.replace(model.vae_config, norm_num_groups=4)
    pipe = StableDiffusionUnifiedPipeline()
    out = pipe(model, prompt="a cat", height=32, width=32,
               num_inference_steps=2, seed=1)
    assert out.images.shape == (1, 32, 32, 3)
    assert np.isfinite(out.images).all()


def test_controlnet_conversion(tiny_state):
    from stablediffusion_tpu.io.a1111 import convert_controlnet

    state, uflat, _, ucfg = tiny_state
    # synthesize a controlnet: unet trunk (down+mid only) + hint block + zero convs
    ctrl = {}
    for k, v in state.items():
        rest = k[len("model.diffusion_model."):]
        if rest.startswith(("time_embed", "input_blocks", "middle_block")):
            ctrl["control_model." + rest] = v
    ctrl["control_model.input_hint_block.0.weight"] = np.zeros((16, 3, 3, 3), np.float32)
    ctrl["control_model.input_hint_block.0.bias"] = np.zeros(16, np.float32)
    ctrl["control_model.input_hint_block.14.weight"] = np.zeros((16, 16, 3, 3), np.float32)
    ctrl["control_model.zero_convs.0.0.weight"] = np.zeros((16, 16, 1, 1), np.float32)
    ctrl["control_model.zero_convs.0.0.bias"] = np.zeros(16, np.float32)
    ctrl["control_model.middle_block_out.0.weight"] = np.zeros((32, 32, 1, 1), np.float32)

    cfg = dict(
        block_out_channels=list(ucfg.block_out_channels),
        layers_per_block=ucfg.layers_per_block,
        down_block_types=list(ucfg.down_block_types),
        up_block_types=list(ucfg.up_block_types),
    )
    got = convert_controlnet(ctrl, cfg)
    assert "controlnet_cond_embedding.conv_in.weight" in got
    assert "controlnet_cond_embedding.conv_out.weight" in got
    assert "controlnet_down_blocks.0.weight" in got
    assert "controlnet_mid_block.weight" in got
    # trunk mapped like the unet
    assert "down_blocks.0.resnets.0.conv1.weight" in got
    assert "time_embedding.linear_1.weight" in got


def test_model_card(tmp_path):
    from stablediffusion_tpu.train.model_card import save_model_card

    path = save_model_card(
        str(tmp_path),
        base_model="sd15_Test",
        prompt="a cat",
        images=[np.zeros((8, 8, 3), np.float32)],
        train_info={"rank": 4, "steps": 100},
    )
    text = open(path).read()
    assert "sd15_Test" in text and "rank" in text and "image_0" in text
    assert (tmp_path / "image_0.png").exists()


def test_controlnet_convert_load_run_loop(tiny_state, tmp_path):
    """Full ControlNet loop: synthetic LDM controlnet -> CLI convert ->
    load_controlnet -> generation (zero convs => exact no-op)."""
    import json

    import jax

    from helpers import make_tiny_model
    from stablediffusion_tpu.io.convert_cli import convert
    from stablediffusion_tpu.io.safetensors_io import save_safetensors
    from stablediffusion_tpu.models import controlnet as controlnet_model
    from stablediffusion_tpu.io.torch_convert import deconvert_tensor, flatten
    from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline

    state, _, _, ucfg = tiny_state
    # synthesize LDM controlnet keys: trunk (down+mid from the tiny unet)
    ctrl = {}
    for k, v in state.items():
        rest = k[len("model.diffusion_model."):]
        if rest.startswith(("time_embed", "input_blocks", "middle_block")):
            ctrl["control_model." + rest] = np.ascontiguousarray(v)
    # hint block + zero convs from our init (converted to LDM naming)
    cn = controlnet_model.init_params(jax.random.key(0), ucfg)
    ce = flatten({"x": cn["controlnet_cond_embedding"]})
    for k, v in ce.items():
        rest = k[2:]  # strip "x."
        arr = deconvert_tensor(k, np.asarray(v))
        if rest.startswith("conv_in."):
            ctrl["control_model.input_hint_block.0." + rest.split(".")[-1]] = arr
        elif rest.startswith("conv_out."):
            ctrl["control_model.input_hint_block.14." + rest.split(".")[-1]] = arr
        elif rest.startswith("blocks."):
            n = int(rest.split(".")[1])
            ctrl[f"control_model.input_hint_block.{2*(n+1)}." + rest.split(".")[-1]] = arr
    for i, (kk, vv) in enumerate(sorted(cn["controlnet_down_blocks"].items(),
                                        key=lambda kv: int(kv[0]))):
        for pname, pv in vv.items():
            ctrl[f"control_model.zero_convs.{kk}.0.{pname}"] = deconvert_tensor(
                f"x.{pname}", np.asarray(pv))
    for pname, pv in cn["controlnet_mid_block"].items():
        ctrl[f"control_model.middle_block_out.0.{pname}"] = deconvert_tensor(
            f"x.{pname}", np.asarray(pv))

    ck = tmp_path / "cn.safetensors"
    save_safetensors(ctrl, ck)
    out_dir = str(tmp_path / "cn-converted")
    assert convert(str(ck), out_dir, controlnet=True) == "controlnet"

    model = make_tiny_model("sd15")
    model.load_controlnet(out_dir)
    import dataclasses

    # head/group counts not recoverable from shapes (tiny model quirk)
    model.controlnet_config = dataclasses.replace(
        model.controlnet_config, num_attention_heads=2, norm_num_groups=8
    )
    # trunk weights in the converted net differ from the model's unet (they
    # came from tiny_state's random init) — fine: zero convs => no-op either way
    pipe = StableDiffusionUnifiedPipeline()
    kw = dict(prompt="a cat", height=32, width=32, num_inference_steps=2, seed=31)
    base = pipe(model, **kw)
    control = np.zeros((1, 32, 32, 3), np.float32)
    with_cn = pipe(model, **kw, control_image=control)
    np.testing.assert_allclose(with_cn.images, base.images, atol=1e-5)


def test_sd2_text_encoder_conversion(tiny_state, rng):
    """SD2.x single-file: OpenCLIP tower under cond_stage_model.model."""
    state, _, _, _ = tiny_state
    H = 16
    full = dict(state)
    prefix = "cond_stage_model.model."
    full.update({
        prefix + "transformer.resblocks.0.attn.in_proj_weight":
            rng.standard_normal((3 * H, H)).astype(np.float32),
        prefix + "transformer.resblocks.0.attn.in_proj_bias":
            np.zeros(3 * H, np.float32),
        prefix + "transformer.resblocks.0.attn.out_proj.weight":
            rng.standard_normal((H, H)).astype(np.float32),
        prefix + "transformer.resblocks.0.attn.out_proj.bias":
            np.zeros(H, np.float32),
        prefix + "transformer.resblocks.0.ln_1.weight": np.ones(H, np.float32),
        prefix + "transformer.resblocks.0.ln_1.bias": np.zeros(H, np.float32),
        prefix + "transformer.resblocks.0.ln_2.weight": np.ones(H, np.float32),
        prefix + "transformer.resblocks.0.ln_2.bias": np.zeros(H, np.float32),
        prefix + "transformer.resblocks.0.mlp.c_fc.weight":
            rng.standard_normal((2 * H, H)).astype(np.float32),
        prefix + "transformer.resblocks.0.mlp.c_fc.bias":
            np.zeros(2 * H, np.float32),
        prefix + "transformer.resblocks.0.mlp.c_proj.weight":
            rng.standard_normal((H, 2 * H)).astype(np.float32),
        prefix + "transformer.resblocks.0.mlp.c_proj.bias":
            np.zeros(H, np.float32),
        prefix + "token_embedding.weight":
            rng.standard_normal((50, H)).astype(np.float32),
        prefix + "positional_embedding":
            rng.standard_normal((77, H)).astype(np.float32),
        prefix + "text_projection": rng.standard_normal((H, 8)).astype(np.float32),
        prefix + "ln_final.weight": np.ones(H, np.float32),
        prefix + "ln_final.bias": np.zeros(H, np.float32),
    })
    assert detect_model_type(full) == "sd2"
    weights, configs = convert_a1111_checkpoint(full)
    assert configs["model_type"] == "sd2"
    te = weights["text_encoder"]
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in te
    assert "text_projection.weight" not in te  # plain CLIPTextModel for SD2
    assert configs["text_encoder"]["num_hidden_layers"] == 1


def _tiny_single_file(tiny_state, tmp_path):
    """Synthetic LDM single-file checkpoint + tokenizer folder -> paths."""
    import json as _json

    from transformers import CLIPTextConfig as HFC, CLIPTextModel
    import torch

    from stablediffusion_tpu.core.config import tiny_clip_config
    from stablediffusion_tpu.io.safetensors_io import save_safetensors
    from helpers import tiny_tokenizer

    state, _, _, _ = tiny_state
    torch.manual_seed(0)
    tc = tiny_clip_config()
    hf = CLIPTextModel(HFC(
        vocab_size=tc.vocab_size, hidden_size=tc.hidden_size,
        intermediate_size=tc.intermediate_size,
        num_hidden_layers=tc.num_hidden_layers,
        num_attention_heads=tc.num_attention_heads,
        eos_token_id=tc.eos_token_id, bos_token_id=0, pad_token_id=1,
        hidden_act="quick_gelu",
    ))
    full = dict(state)
    full.update({
        f"cond_stage_model.transformer.{k}": v.numpy()
        for k, v in hf.state_dict().items()
    })
    ckpt = tmp_path / "model.safetensors"
    save_safetensors({k: np.ascontiguousarray(v) for k, v in full.items()}, ckpt)
    tiny_tokenizer().save_pretrained(str(tmp_path / "tokenizer"))
    return str(ckpt)


def test_load_sd_single_file(tiny_state, tmp_path):
    """from_single_file analog: A1111 .safetensors -> SDModel in memory ->
    generate (no diffusers-folder roundtrip)."""
    import dataclasses

    from stablediffusion_tpu.io.loader import load_sd_single_file
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    ckpt = _tiny_single_file(tiny_state, tmp_path)
    model = load_sd_single_file(ckpt, tokenizer_dir=str(tmp_path))
    assert model.model_type == "sd15" and model.tokenizer is not None
    assert model.path == os.path.abspath(ckpt)
    # heads/groups are not shape-recoverable; tiny uses 2/8 + vae 4
    model.unet_config = dataclasses.replace(
        model.unet_config, num_attention_heads=2, norm_num_groups=8
    )
    model.vae_config = dataclasses.replace(model.vae_config, norm_num_groups=4)
    out = StableDiffusionUnifiedPipeline()(
        model, prompt="a cat", height=32, width=32,
        num_inference_steps=2, seed=1,
    )
    assert np.isfinite(out.images).all()
    # no tokenizer dir -> warns, still loads
    m2 = load_sd_single_file(ckpt)
    assert m2.tokenizer is None and m2.unet_params


def test_resolve_checkpoint_single_file(tiny_state, tmp_path):
    from stablediffusion_tpu.io.loader import resolve_checkpoint

    ckpt = _tiny_single_file(tiny_state, tmp_path)
    assert resolve_checkpoint("sd15", ckpt) == ckpt
    # bare filename resolves under the cache dir
    got = resolve_checkpoint("sd15", "model.safetensors",
                             cache_dir=str(tmp_path))
    assert got == os.path.join(str(tmp_path), "model.safetensors")
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint("sd15", "nope.safetensors", cache_dir=str(tmp_path))


def test_serving_loads_single_file(tiny_state, tmp_path):
    from stablediffusion_tpu.serve.handler import Handler

    ckpt = _tiny_single_file(tiny_state, tmp_path)
    h = Handler(model_dir=str(tmp_path))
    h.maybe_reload_model({"type": "sd15", "name": "model.safetensors"})
    assert h.model is not None
    assert h.model.path == os.path.abspath(ckpt)
    assert h.model.tokenizer is not None  # found tmp_path/tokenizer
    gen = h.model
    # idempotent: same name does not reload
    h.maybe_reload_model({"type": "sd15", "name": "model.safetensors"})
    assert h.model is gen


def test_single_file_prediction_type_override(tiny_state, tmp_path):
    from stablediffusion_tpu.io.loader import load_sd_single_file

    ckpt = _tiny_single_file(tiny_state, tmp_path)
    m = load_sd_single_file(ckpt, tokenizer_dir=str(tmp_path),
                            prediction_type="v_prediction")
    assert m.scheduler_config.prediction_type == "v_prediction"


def test_serving_sd3_single_file_clear_error(tiny_state, tmp_path):
    from stablediffusion_tpu.serve.handler import Handler

    ckpt = _tiny_single_file(tiny_state, tmp_path)
    h = Handler(model_dir=str(tmp_path))
    with pytest.raises(ValueError, match="SD3 single-file"):
        h.maybe_reload_model({"type": "sd3", "name": "model.safetensors"})


def test_single_file_sdxl_tokenizer2_fallback(tmp_path):
    """An SDXL single file with only a tokenizer/ folder next to it loads —
    tower 2 reuses tower 1's vocab/merges with the OpenCLIP pad (!, id 0)."""
    from helpers import make_tiny_model, tiny_tokenizer

    from stablediffusion_tpu.io.loader import load_sd_single_file, save_sd_model

    # build an SDXL LDM-style single file via the deconversion helpers is
    # heavy; instead exercise tok() indirectly: the loader's tokenizer
    # resolution is what this test pins, using a monkeypatched converter
    import stablediffusion_tpu.io.loader as loader_mod

    tiny_tokenizer().save_pretrained(str(tmp_path / "tokenizer"))
    model = make_tiny_model("sdxl")

    import numpy as np

    from stablediffusion_tpu.io.torch_convert import deconvert_tensor, flatten

    def fake_convert(state, extract_ema_weights=False, scaling_factor=None):
        weights = {
            comp: {
                k: deconvert_tensor(k, np.asarray(v))
                for k, v in flatten(tree).items()
            }
            for comp, tree in (
                ("unet", model.unet_params), ("vae", model.vae_params),
                ("text_encoder", model.text_encoder_params),
                ("text_encoder_2", model.text_encoder_2_params),
            )
        }
        import dataclasses as dc

        def cfgd(c):
            return {f.name: getattr(c, f.name) for f in dc.fields(c)}

        configs = {
            "model_type": "sdxl",
            "unet": loader_mod._unet_cfg_dict(model.unet_config),
            "vae": loader_mod._vae_cfg_dict(model.vae_config),
            "text_encoder": loader_mod._clip_cfg_dict(model.text_encoder_config),
            "text_encoder_2": loader_mod._clip_cfg_dict(
                model.text_encoder_2_config),
        }
        return weights, configs

    import stablediffusion_tpu.io.a1111 as a1111_mod

    f = tmp_path / "sdxl.safetensors"
    from stablediffusion_tpu.io.safetensors_io import save_safetensors

    save_safetensors({"dummy": np.zeros(1, np.float32)}, f)
    orig = a1111_mod.convert_a1111_checkpoint
    a1111_mod.convert_a1111_checkpoint = fake_convert
    try:
        m = load_sd_single_file(str(f), tokenizer_dir=str(tmp_path))
    finally:
        a1111_mod.convert_a1111_checkpoint = orig
    assert m.tokenizer is not None and m.tokenizer_2 is not None
    assert m.tokenizer_2.pad_token_id == 0  # OpenCLIP "!" pad


def test_single_file_reload(tiny_state, tmp_path):
    from stablediffusion_tpu.io.loader import load_sd_single_file

    ckpt = _tiny_single_file(tiny_state, tmp_path)
    m = load_sd_single_file(ckpt, tokenizer_dir=str(tmp_path),
                            prediction_type="v_prediction")
    tok = m.tokenizer
    m.reload()
    assert m.tokenizer is tok  # kept (single files carry no tokenizer)
    assert m.scheduler_config.prediction_type == "v_prediction"


def test_serving_prediction_type_applies_without_reload(tiny_state, tmp_path):
    from stablediffusion_tpu.serve.handler import Handler

    ckpt = _tiny_single_file(tiny_state, tmp_path)
    h = Handler(model_dir=str(tmp_path))
    h.maybe_reload_model({"type": "sd15", "name": "model.safetensors"})
    assert h.model.scheduler_config.prediction_type == "epsilon"
    gen = h.model
    h.maybe_reload_model({"type": "sd15", "name": "model.safetensors",
                          "prediction_type": "v_prediction"})
    assert h.model is gen  # no reload
    assert h.model.scheduler_config.prediction_type == "v_prediction"
    assert h.model.scheduler.config.prediction_type == "v_prediction"
