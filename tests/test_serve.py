"""Serving layer: router modes, seed echo, model hot-swap, HTTP worker."""

import base64
import json
import threading

import numpy as np
import pytest

from stablediffusion_tpu.serve.handler import (
    Handler,
    decode_image_b64,
    encode_images_b64,
)

from helpers import make_tiny_model

ARGS = dict(prompt="a cat", height=32, width=32, num_inference_steps=2)


@pytest.fixture(scope="module")
def handler():
    return Handler(model=make_tiny_model("sd15"))


def test_inference_mode(handler):
    resp = handler({**ARGS, "seed": 7}, "req-1")
    assert "error" not in resp, resp.get("traceback")
    assert resp["seed"] == 7
    assert len(resp["images"]) == 1
    img = decode_image_b64(resp["images"][0])
    assert img.shape == (32, 32, 3)


def test_auto_seed_echo(handler):
    resp = handler(dict(ARGS), "req-2")
    assert isinstance(resp["seed"], int) and 0 <= resp["seed"] < 1e9


def test_params_merge(handler):
    resp = handler({"prompt": "x", "params": {**ARGS, "seed": 3}}, "req-3")
    assert resp["seed"] == 3


def test_img2img_base64_roundtrip(handler):
    first = handler({**ARGS, "seed": 1}, "r")
    resp = handler(
        {**ARGS, "seed": 2, "image": first["images"][0], "strength": 0.5},
        "req-4",
    )
    assert "error" not in resp, resp.get("traceback")
    assert len(resp["images"]) == 1


def test_scheduler_swap_via_model_block(handler):
    resp = handler(
        {**ARGS, "seed": 1, "model": {"scheduler": "euler"}}, "req-5"
    )
    assert "error" not in resp
    assert handler.model.scheduler_name == "euler"
    handler.model.set_scheduler("DDIM")


def test_inference_wandb_mode_without_wandb(handler):
    resp = handler({**ARGS, "seed": 5, "mode": "inference_wandb"}, "req-6")
    assert "error" not in resp, resp.get("traceback")
    assert resp["config"]["seed"] == 5
    assert resp["config"]["scheduler"] == "DDIM"
    assert resp["wandb_url"] is None  # package absent -> inline config


def test_constructor_mode_grid(handler):
    resp = handler(
        {
            **ARGS,
            "mode": "constructor",
            "seed": 1,
            "params": {
                "schedulers": ["DDIM", "euler"],
                "steps_grid": [2],
                "guidance_grid": [5.0, 9.0],
            },
        },
        "req-7",
    )
    assert "error" not in resp, resp.get("traceback")
    assert len(resp["grid"]) == 4  # 2 schedulers x 1 steps x 2 cfg
    assert {g["scheduler"] for g in resp["grid"]} == {"DDIM", "euler"}


def test_unknown_mode_is_error(handler):
    resp = handler({**ARGS, "mode": "nope"}, "req-8")
    assert "error" in resp and "unknown mode" in resp["error"]


def test_missing_model():
    h = Handler(model=None)
    resp = h(dict(ARGS), "req-9")
    assert "error" in resp and "no model" in resp["error"]


def test_http_worker_roundtrip(handler):
    """Drive the real HTTP surface on a local port."""
    import http.client

    from http.server import ThreadingHTTPServer

    import stablediffusion_tpu.serve.worker as worker

    worker.HANDLER = handler
    server = ThreadingHTTPServer(("127.0.0.1", 0), worker._HTTPHandler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok"

        body = json.dumps({"id": "job-1", "input": {**ARGS, "seed": 9}})
        conn.request("POST", "/", body=body,
                     headers={"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert resp["seed"] == 9 and len(resp["images"]) == 1

        # malformed json -> 400
        conn.request("POST", "/", body="{not json",
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        r.read()
    finally:
        server.shutdown()


def test_ui_endpoint(handler):
    import http.client
    from http.server import ThreadingHTTPServer

    import stablediffusion_tpu.serve.worker as worker

    worker.HANDLER = handler
    server = ThreadingHTTPServer(("127.0.0.1", 0), worker._HTTPHandler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/ui")
        r = conn.getresponse()
        assert r.status == 200
        html = r.read().decode()
        assert "Generate" in html and "DPM++ 2M Karras" in html
    finally:
        server.shutdown()


def test_train_mode(handler, tmp_path):
    rng2 = np.random.default_rng(0)
    from PIL import Image

    d = tmp_path / "tdata"
    d.mkdir()
    for i in range(2):
        Image.fromarray(
            (rng2.uniform(size=(40, 40, 3)) * 255).astype(np.uint8)
        ).save(d / f"{i}.jpg")
        (d / f"{i}.txt").write_text("a cat")
    resp = handler(
        {
            "mode": "train",
            "prompt": "unused",
            "train": {
                "data_dir": str(d),
                "train_batch_size": 2,
                "max_train_steps": 1,
                "rank": 2,
                "resolution": 32,
                "mixed_precision": "no",
                "train_text_encoder": False,
                "lr_scheduler": "constant",
                "lr_warmup_steps": 0,
                "output_dir": str(tmp_path / "tout"),
            },
        },
        "req-train",
    )
    assert "error" not in resp, resp.get("traceback")
    import os

    assert os.path.exists(resp["lora_path"])


def test_train_mode_requires_data_dir(handler):
    resp = handler({"mode": "train", "train": {}}, "req-train2")
    assert "error" in resp and "data_dir" in resp["error"]


def test_bucket_upload_sink(handler, tmp_path, monkeypatch):
    """BUCKET_ENDPOINT_URL-gated image sink (ref handler_logic.py:32-51):
    when configured, inference responses carry URLs instead of base64."""
    import os

    from stablediffusion_tpu.serve.upload import make_uploader

    root = str(tmp_path / "bucket")
    monkeypatch.setenv("BUCKET_ENDPOINT_URL", root)
    assert make_uploader() is not None
    monkeypatch.delenv("BUCKET_ENDPOINT_URL")
    assert make_uploader() is None  # fallback: base64 branch

    h = Handler(model=handler.model, uploader=make_uploader(root))
    resp = h({**ARGS, "seed": 7}, "job-42")
    assert "error" not in resp, resp.get("traceback")
    (url,) = resp["images"]
    assert url.startswith("file://") and url.endswith("/0.jpg")
    path = url[len("file://"):]
    assert os.path.exists(path) and "job-42" in path
    from PIL import Image

    assert Image.open(path).size == (32, 32)


def test_upload_scheme_dispatch():
    from stablediffusion_tpu.serve import upload

    assert isinstance(upload.make_uploader("/tmp/x"), upload.FileUploader)
    assert isinstance(upload.make_uploader("file:///tmp/x"), upload.FileUploader)
    assert isinstance(
        upload.make_uploader("http://bucket.example/up"), upload.HTTPUploader
    )
    assert upload.make_uploader("s3://b/p") is None  # boto3 absent -> warn
    assert upload.make_uploader(None) is None


# -- SD3 family through the router (beyond-parity) ---------------------------

SD3_ARGS = dict(
    prompt="a cat", height=16, width=16, num_inference_steps=2,
    max_sequence_length=16,
)


@pytest.fixture(scope="module")
def sd3_handler():
    from test_sd3 import make_tiny_sd3_model

    return Handler(model=make_tiny_sd3_model())


def test_sd3_inference_mode(sd3_handler):
    resp = sd3_handler({**SD3_ARGS, "seed": 7}, "sd3-1")
    assert "error" not in resp, resp.get("traceback")
    assert resp["seed"] == 7
    img = decode_image_b64(resp["images"][0])
    assert img.shape == (16, 16, 3)


def test_sd3_scheduler_and_prompt3(sd3_handler):
    resp = sd3_handler(
        {**SD3_ARGS, "seed": 1, "prompt_3": "detailed fur",
         "model": {"scheduler": "FlowMatchEuler"}},
        "sd3-2",
    )
    assert "error" not in resp, resp.get("traceback")
    assert sd3_handler.model.scheduler_name == "FlowMatchEuler"


def test_sd3_lora_via_model_block(sd3_handler, tmp_path):
    """Train-format (transformer.*) LoRA file loads + fuses through the
    router's model block, and deleting adapters restores pristine params."""
    import jax

    from stablediffusion_tpu.lora.core import init_lora
    from stablediffusion_tpu.lora.formats import save_lora_file
    from stablediffusion_tpu.train.sd3_train import MMDIT_TARGET_SUFFIXES

    model = sd3_handler.model
    lora = init_lora(
        jax.random.key(0), model.transformer_params, 2, MMDIT_TARGET_SUFFIXES
    )
    # non-zero up so fusion visibly changes the weights
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    save_lora_file(
        {"transformer": lora}, str(tmp_path / "sd3_style.safetensors")
    )

    sd3_handler.lora_dir = str(tmp_path)
    ref = model.transformer_params
    resp = sd3_handler(
        {**SD3_ARGS, "seed": 2, "model": {"loras": {"style": 0.8}}}, "sd3-3"
    )
    assert "error" not in resp, resp.get("traceback")
    assert model.get_list_adapters() == {"style": 0.8}
    q = "transformer_blocks.0.attn.to_q.weight"

    def get(tree, dotted):
        for part in dotted.split("."):
            tree = tree[part]
        return tree

    assert not jax.numpy.allclose(
        get(model.transformer_params, q), get(ref, q)
    )
    resp = sd3_handler(
        {**SD3_ARGS, "seed": 2, "model": {"loras": []}}, "sd3-4"
    )
    assert "error" not in resp
    assert model.get_list_adapters() == {}
    assert get(model.transformer_params, q) is get(ref, q)


def test_ip_adapter_via_model_block(tmp_path):
    """Model block {"ip_adapter": <path>} loads/unloads the adapter through
    the router (beyond-parity: reference serving has no IP-Adapter)."""
    import numpy as np

    from helpers import make_tiny_model
    from stablediffusion_tpu.io.safetensors_io import save_safetensors
    from test_ip_adapter import _make_ip_sd

    model = make_tiny_model("sd15")
    cfg = model.unet_config
    rng = np.random.default_rng(7)
    flat = {f"ip_adapter.{k}": v for k, v in _make_ip_sd(cfg, rng).items()}
    tokens, clip_dim = 4, 16
    flat["image_proj.proj.weight"] = (
        rng.standard_normal((tokens * cfg.cross_attention_dim, clip_dim))
        .astype(np.float32) * 0.05
    )
    flat["image_proj.proj.bias"] = np.zeros(
        tokens * cfg.cross_attention_dim, np.float32
    )
    flat["image_proj.norm.weight"] = np.ones(cfg.cross_attention_dim, np.float32)
    flat["image_proj.norm.bias"] = np.zeros(cfg.cross_attention_dim, np.float32)
    path = str(tmp_path / "ip.safetensors")
    save_safetensors(flat, path)

    h = Handler(model=model)
    resp = h(
        {**ARGS, "seed": 3, "model": {"ip_adapter": path}, "ip_adapter_scale": 0.5},
        "ip-1",
    )
    assert "error" not in resp, resp.get("traceback")
    assert model.ip_adapter is not None and model.ip_adapter.num_tokens == 4
    resp = h({**ARGS, "seed": 3, "model": {"ip_adapter": None}}, "ip-2")
    assert "error" not in resp, resp.get("traceback")
    assert model.ip_adapter is None


# -- dynamic micro-batching (serve/batcher.py, beyond-parity) ----------------


def test_batcher_merges_and_is_composition_invariant(handler):
    """Concurrent same-bucket requests merge into ONE pipeline call, and each
    request's image is bit-identical to what it gets when batched alone
    (per-sample seed streams)."""
    import threading

    from stablediffusion_tpu.serve.batcher import Batcher

    b = Batcher(handler, max_batch=4, window_ms=200.0, adaptive=False)
    results = {}

    def go(seed):
        results[seed] = b.submit({**ARGS, "seed": seed}, f"b{seed}")

    threads = [threading.Thread(target=go, args=(s,)) for s in (101, 202, 303)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert b.merged_calls == 1, b.merged_calls
    for s in (101, 202, 303):
        r = results[s]
        assert "error" not in r, r.get("traceback")
        assert r["seed"] == s and r["batched"] == 3

    solo = b.submit({**ARGS, "seed": 202}, "solo")
    assert solo["batched"] == 1
    assert solo["images"][0] == results[202]["images"][0], (
        "batched result differs from solo result for the same seed"
    )
    b.close()


def test_batcher_buckets_and_serial_fallthrough(handler):
    from stablediffusion_tpu.serve.batcher import Batcher, _batchable

    b = Batcher(handler, max_batch=4, window_ms=50.0)
    # different shapes -> different buckets, both succeed
    r1 = b.submit({**ARGS, "seed": 1}, "s1")
    r2 = b.submit({**ARGS, "height": 64, "width": 64, "seed": 1}, "s2")
    assert "error" not in r1 and "error" not in r2

    # non-batchable inputs take the serial handler path
    assert not _batchable({**ARGS, "model": {"scheduler": "DDIM"}})
    assert not _batchable({**ARGS, "mode": "constructor"})
    assert not _batchable({**ARGS, "image": "abc"})
    assert not _batchable({**ARGS, "seed": [1, 2]})
    assert not _batchable({**ARGS, "num_images_per_prompt": 2})
    r3 = b.submit({**ARGS, "seed": 5, "model": {"scheduler": "DDIM"}}, "s3")
    assert "error" not in r3 and "batched" not in r3
    b.close()


def test_batcher_error_channel(handler):
    from stablediffusion_tpu.serve.batcher import Batcher

    b = Batcher(handler, max_batch=2, window_ms=10.0)
    r = b.submit({**ARGS, "seed": 1, "clip_skip": 99}, "bad")
    assert "error" in r
    b.close()


def test_batcher_survives_malformed_and_filters_args(handler):
    """A request that errors inside the merged call (or has unhashable args)
    must return a per-request error WITHOUT killing the singleton batch
    thread; extra client keys and 'mode' are filtered like the serial path."""
    from stablediffusion_tpu.serve.batcher import Batcher

    b = Batcher(handler, max_batch=4, window_ms=10.0)
    r = b.submit({**ARGS, "seed": 1, "sigmas": {"0": 1}}, "bad")
    assert "error" in r
    r = b.submit(
        {**ARGS, "seed": 2, "mode": "inference", "webhook": "http://x"}, "ok"
    )
    assert "error" not in r, r.get("traceback")
    b.close()


def test_batcher_sd3(sd3_handler):
    """SD3 requests batch too (per-sample seed lists in pipelines/sd3.py):
    merged results are bit-identical to solo results for the same seed."""
    import threading

    from stablediffusion_tpu.serve.batcher import Batcher

    b = Batcher(sd3_handler, max_batch=4, window_ms=200.0, adaptive=False)
    results = {}

    def go(seed):
        results[seed] = b.submit({**SD3_ARGS, "seed": seed}, f"s{seed}")

    threads = [threading.Thread(target=go, args=(s,)) for s in (11, 22)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for s in (11, 22):
        assert "error" not in results[s], results[s].get("traceback")
        assert results[s]["seed"] == s and results[s]["batched"] == 2
    solo = b.submit({**SD3_ARGS, "seed": 22}, "solo")
    assert solo["batched"] == 1
    assert solo["images"][0] == results[22]["images"][0]
    b.close()

def test_bucket_keys_partition():
    """Every handler inference arg must be classified: merged per-request,
    non-batchable (forces the serial path), or part of the bucket key.  The
    bucket key is DERIVED (INFERENCE_ARG_KEYS minus the other two classes) so
    a new pipeline arg automatically splits batches instead of silently
    applying request #1's value to a merged group."""
    from stablediffusion_tpu.serve.batcher import (
        _MERGED_KEYS,
        _NON_BATCHABLE,
        _bucket_keys,
    )
    from stablediffusion_tpu.serve.handler import INFERENCE_ARG_KEYS

    merged = set(_MERGED_KEYS)
    nonbatch = set(_NON_BATCHABLE) & set(INFERENCE_ARG_KEYS)
    bucket = set(_bucket_keys())
    # three-way partition: total, pairwise disjoint
    assert merged | nonbatch | bucket == set(INFERENCE_ARG_KEYS)
    assert not (merged & nonbatch) and not (merged & bucket)
    assert not (nonbatch & bucket)
    # the graph/value-shaping args must be bucket keys (a regression here
    # would merge requests with different compiled graphs or scalars)
    for k in ("height", "width", "num_inference_steps", "guidance_scale",
              "clip_skip", "timesteps", "sigmas"):
        assert k in bucket, k


def test_batcher_overload_shedding(handler):
    from stablediffusion_tpu.serve.batcher import Batcher

    b = Batcher(handler, max_batch=2, window_ms=10.0, max_queue=0)
    r = b.submit({**ARGS, "seed": 1}, "shed")
    assert "error" in r and "Overloaded" in r["error"]
    assert b.shed_requests == 1
    b.close()


def test_batcher_stale_generation_falls_back_serial(handler):
    """A model reconfiguration between enqueue and the merged call must NOT
    let queued requests render under the new model state silently: items
    whose generation snapshot is stale re-run through the full serial
    handler under the lock (advisor round-2 medium finding)."""
    from stablediffusion_tpu.serve.batcher import Batcher, _Pending

    b = Batcher(handler, max_batch=4, window_ms=10.0)
    gen0 = handler.model_generation
    try:
        stale = _Pending({**ARGS, "seed": 9}, "stale", generation=gen0)
        handler.model_generation = gen0 + 1  # concurrent model block applied
        fresh = _Pending(
            {**ARGS, "seed": 10}, "fresh", generation=gen0 + 1
        )
        b._run_group([stale, fresh])
        # the merged item's fetch+encode rides the postprocess thread now
        assert stale.event.wait(30) and fresh.event.wait(30)
        # stale item went through the serial handler (no 'batched' marker)
        assert "error" not in stale.result, stale.result
        assert "batched" not in stale.result
        # fresh item still rode the merged path
        assert fresh.result.get("batched") == 1, fresh.result
    finally:
        handler.model_generation = gen0
        b.close()


def test_batcher_abandoned_items_are_dropped(handler):
    """Timed-out (abandoned) requests must not burn TPU time: the worker
    drops them from groups instead of generating unread results."""
    from stablediffusion_tpu.serve.batcher import Batcher, _Pending

    b = Batcher(handler, max_batch=4, window_ms=10.0)
    try:
        it = _Pending({**ARGS, "seed": 1}, "gone",
                      generation=handler.model_generation)
        it.abandoned = True
        before = b.merged_calls
        b._run_group([it])
        assert b.merged_calls == before  # no pipeline call happened
        assert not it.event.is_set()
    finally:
        b.close()


def test_batcher_adaptive_single_client_skips_window(handler):
    """adaptive=True (the default): a lone request dispatches immediately
    instead of waiting out window_ms (the serving p50 at 1 client)."""
    import time

    from stablediffusion_tpu.serve.batcher import Batcher

    b = Batcher(handler, max_batch=4, window_ms=60_000.0)
    try:
        t0 = time.monotonic()
        r = b.submit({**ARGS, "seed": 7}, "solo")
        dt = time.monotonic() - t0
        assert "error" not in r, r.get("traceback")
        assert r["batched"] == 1
        assert dt < 30.0, f"single request waited the merge window ({dt:.1f}s)"
    finally:
        b.close()


def test_batcher_cold_burst_grace_merges_first_batch(handler):
    """From an IDLE state (_last_gather == 1, hysteresis not yet armed), a
    racer arriving within grace_ms must join the first request's batch —
    without the grace floor the first racer of a fresh concurrent burst is
    dispatched alone and the rest become a padded second batch (measured
    {"1":1,"7":7} composition at 8 clients on TPU)."""
    import threading

    from stablediffusion_tpu.serve.batcher import Batcher

    # grace == window == huge: the ONLY way this test finishes quickly is
    # batch-full dispatch at max_batch=2, i.e. the second submit joined the
    # first gather instead of the worker early-breaking on the lone item
    b = Batcher(handler, max_batch=2, window_ms=60_000.0, grace_ms=60_000.0)
    try:
        results = {}

        def go(seed, delay):
            if delay:
                threading.Event().wait(delay)
            results[seed] = b.submit({**ARGS, "seed": seed}, f"g{seed}")

        t1 = threading.Thread(target=go, args=(601, 0.0))
        t2 = threading.Thread(target=go, args=(602, 0.05))
        t1.start()
        t2.start()
        t1.join(timeout=120)
        t2.join(timeout=120)
        for s in (601, 602):
            assert "error" not in results[s], results[s].get("traceback")
            assert results[s]["batched"] == 2, results[s]
    finally:
        b.close()


def test_batcher_adaptive_still_merges_queued_backlog(handler):
    """Adaptive mode must still coalesce: requests that queue up while the
    worker is busy merge into one call when it frees (gate the handler so
    the backlog forms deterministically)."""
    import threading

    from stablediffusion_tpu.serve.batcher import Batcher

    ev_started, ev_release = threading.Event(), threading.Event()

    class GateHandler:
        # the merged path goes through handler._generate; gate THAT
        def __init__(self, inner):
            self.inner = inner

        def __getattr__(self, k):
            return getattr(self.inner, k)

        def __call__(self, *a, **kw):
            return self.inner(*a, **kw)

        def _generate(self, args, output_type="uint8"):
            ev_started.set()
            assert ev_release.wait(60)
            return self.inner._generate(args, output_type=output_type)

    b = Batcher(GateHandler(handler), max_batch=4, window_ms=200.0)
    try:
        results = {}

        def go(seed):
            results[seed] = b.submit({**ARGS, "seed": seed}, f"a{seed}")

        t0 = threading.Thread(target=go, args=(501,))
        t0.start()
        assert ev_started.wait(60)  # worker is inside the gated call
        backlog = [threading.Thread(target=go, args=(s,))
                   for s in (502, 503, 504)]
        for t in backlog:
            t.start()
        deadline = threading.Event()  # poll until all three are queued
        for _ in range(500):
            if b._q.qsize() >= 3:
                break
            deadline.wait(0.01)
        assert b._q.qsize() >= 3
        ev_release.set()
        t0.join(timeout=120)
        for t in backlog:
            t.join(timeout=120)
        assert results[501]["batched"] == 1
        for s in (502, 503, 504):
            assert "error" not in results[s], results[s].get("traceback")
            assert results[s]["batched"] == 3, results[s]
    finally:
        ev_release.set()
        b.close()


def test_batcher_pads_partial_batches_to_pow2(handler):
    """A merged group of 3 must reach the pipeline as a batch of 4 (next
    power of two): every compiled XLA batch shape must come from the tiny
    {1,2,4,...,max_batch} set — a novel shape (e.g. a 7-of-8 partial batch)
    recompiles for minutes through the TPU tunnel (bench_serving measured a
    94 s p99 from exactly that).  The pad rows are duplicates of the last
    request and are sliced off; per-sample seed streams keep real outputs
    bit-identical (test_batcher_merges_and_is_composition_invariant)."""
    import threading

    from stablediffusion_tpu.serve.batcher import Batcher

    seen_batch_sizes = []
    real_generate = handler._generate

    def spy_generate(args, output_type="uint8"):
        seen_batch_sizes.append(len(args["prompt"]))
        return real_generate(args, output_type=output_type)

    handler._generate = spy_generate
    b = Batcher(handler, max_batch=8, window_ms=500.0, adaptive=False)
    try:
        results = {}

        def go(seed):
            results[seed] = b.submit({**ARGS, "seed": seed}, f"p{seed}")

        threads = [threading.Thread(target=go, args=(s,))
                   for s in (11, 22, 33)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert b.merged_calls == 1
        assert seen_batch_sizes == [4], seen_batch_sizes  # 3 padded to 4
        assert b.padded_samples == 1
        for s in (11, 22, 33):
            assert "error" not in results[s], results[s].get("traceback")
            assert results[s]["seed"] == s
            assert results[s]["batched"] == 3  # real group size, not padded
    finally:
        handler._generate = real_generate
        b.close()


def test_batcher_adaptive_hysteresis_after_merged_batch(handler):
    """After a multi-request gather, the adaptive early break is disabled
    for the next full window: when a merged batch completes, its N clients
    re-submit within milliseconds of each other, and an eager break would
    dispatch the first racer alone (1+7 split → a cold batch-7 compile on
    the real chip)."""
    import threading

    from stablediffusion_tpu.serve.batcher import Batcher

    b = Batcher(handler, max_batch=4, window_ms=300.0)  # adaptive default on
    try:
        results = {}

        def go(seed):
            results[seed] = b.submit({**ARGS, "seed": seed}, f"h{seed}")

        # simulate "a merged batch just completed" (setting the gather size
        # directly keeps the test deterministic — reaching it through a real
        # concurrent burst races against the adaptive break)
        b._last_gather = 4
        calls_before = b.merged_calls
        # a re-submit burst with a straggler — the first request alone in
        # the queue must NOT dispatch solo while its batch-mates are
        # milliseconds behind (hysteresis holds the window open)
        t_first = threading.Thread(target=go, args=(10,))
        t_first.start()
        deadline = threading.Event()
        deadline.wait(0.05)  # straggler lag << window_ms
        t_second = threading.Thread(target=go, args=(20,))
        t_second.start()
        t_first.join(timeout=120)
        t_second.join(timeout=120)
        assert b.merged_calls == calls_before + 1  # ONE merged call, not 1+1
        assert results[10]["batched"] == 2 and results[20]["batched"] == 2
    finally:
        b.close()


def test_model_generation_bumps(handler):
    g0 = handler.model_generation
    handler({**ARGS, "seed": 1, "model": {"scheduler": "DDIM"}}, "g1")
    assert handler.model_generation == g0 + 1
    handler({**ARGS, "seed": 1}, "g2")  # plain inference: no bump
    assert handler.model_generation == g0 + 1

def test_mesh_serving_http_batch_bit_identical():
    """SURVEY §2.10 'shard batch across chips for throughput serving': an
    HTTP batch of 8 merged by the Batcher on a mesh-backed Handler shards
    over 8 virtual devices, and every request's image is BIT-IDENTICAL to
    its solo, meshless render (per-sample seed streams + DP sharding are
    both invisible to clients)."""
    import threading

    import jax

    from stablediffusion_tpu.parallel.mesh import make_mesh
    from stablediffusion_tpu.serve.batcher import Batcher

    mesh = make_mesh(data=8, tensor=1, devices=jax.devices()[:8])
    model = make_tiny_model("sd15")
    h_mesh = Handler(model=model, mesh=mesh)
    b = Batcher(h_mesh, max_batch=8, window_ms=1000.0, adaptive=False)
    seeds = list(range(1, 9))
    results = {}

    def go(s):
        results[s] = b.submit({**ARGS, "seed": s}, f"m{s}")

    threads = [threading.Thread(target=go, args=(s,)) for s in seeds]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    b.close()
    for s in seeds:
        assert "error" not in results[s], results[s].get("traceback")
        assert results[s]["seed"] == s
    assert b.merged_calls == 1 and results[1]["batched"] == 8

    h_solo = Handler(model=model)  # single-device, serial
    for s in (1, 5, 8):
        solo = h_solo({**ARGS, "seed": s}, f"solo{s}")
        assert solo["images"][0] == results[s]["images"][0], (
            f"mesh-batched result differs from solo render for seed {s}"
        )


def test_build_serving_mesh():
    import jax

    from stablediffusion_tpu.serve.worker import build_serving_mesh

    mesh = build_serving_mesh(-1)
    assert mesh is not None and mesh.shape["data"] == len(jax.devices())
    mesh = build_serving_mesh(4)
    assert mesh.shape["data"] == 4
    with pytest.raises(ValueError):
        build_serving_mesh(999)


def test_warmup_precompiles_hot_path(handler):
    """Handler.warmup runs one generation per batch size through the same
    _generate path requests use (so the compiled programs match), and a
    following real request succeeds."""
    dt = handler.warmup(steps=2, size=32, batches=(1, 2))
    assert dt > 0
    resp = handler({**ARGS, "seed": 3}, "req-warm")
    assert "error" not in resp, resp.get("traceback")


def test_worker_warmup_only_exits(handler, monkeypatch):
    """--warmup_only warms then returns without serving (the bake-the-
    compile-cache-into-the-image pattern)."""
    from stablediffusion_tpu.serve import worker

    called = {}
    monkeypatch.setattr(worker, "get_handler", lambda **kw: handler)
    monkeypatch.setattr(
        handler, "warmup",
        lambda **kw: called.setdefault("warmup", kw) or 1.0)
    monkeypatch.setattr(
        worker, "serve_http",
        lambda *a, **kw: (_ for _ in ()).throw(AssertionError("served")))
    worker.main(["--warmup_only", "--warmup_steps", "2", "--max_batch", "4"])
    assert called["warmup"]["batches"] == (1, 2, 4)


def test_sd3_inpaint_through_handler(sd3_handler):
    """SD3 inpaint over the serving surface: b64 image + mask decode, the
    signature filter passes mask_image through to the SD3 pipeline."""
    import numpy as np

    rng = np.random.default_rng(0)
    img01 = rng.random((1, 16, 16, 3)).astype(np.float32)  # [0,1]
    img_b64 = encode_images_b64(img01)[0]
    mask01 = np.zeros((1, 16, 16, 3), np.float32)
    mask01[:, :, 8:] = 1.0
    mask_b64 = encode_images_b64(mask01, fmt="PNG")[0]
    resp = sd3_handler(
        {
            **SD3_ARGS,
            "seed": 7,
            "image": img_b64,
            "mask_image": mask_b64,
            "strength": 1.0,
        },
        "sd3-inpaint",
    )
    assert "error" not in resp, resp.get("traceback")
    img = decode_image_b64(resp["images"][0])
    assert img.shape == (16, 16, 3)


def test_tp_serving_identical_to_solo():
    """A 4x2 (data x tensor) serving mesh: attention/MLP kernels shard over
    `tensor`, requests shard over `data`, and per-request images are
    bit-identical to a single-device render; re-fusing LoRA state (which
    replaces param trees) re-triggers TP placement."""
    import jax

    from stablediffusion_tpu.parallel.mesh import make_mesh
    from stablediffusion_tpu.serve.worker import build_serving_mesh

    mesh = make_mesh(data=4, tensor=2, devices=jax.devices()[:8])
    model = make_tiny_model("sd15")
    h_tp = Handler(model=model, mesh=mesh)
    resp = h_tp({**ARGS, "seed": 11}, "tp-1")
    assert "error" not in resp, resp.get("traceback")
    # kernels actually sharded after the first request
    w = model.unet_params["down_blocks"]["0"]["attentions"]["0"][
        "transformer_blocks"]["0"]["attn1"]["to_q"]["weight"]
    assert not w.sharding.is_fully_replicated

    h_solo = Handler(model=make_tiny_model("sd15"))
    solo = h_solo({**ARGS, "seed": 11}, "solo-1")
    assert resp["images"][0] == solo["images"][0]

    # worker-level mesh builder
    m = build_serving_mesh(4, 2)
    assert m.shape["data"] == 4 and m.shape["tensor"] == 2
    m = build_serving_mesh(-1, 2)
    assert m.shape["tensor"] == 2 and m.shape["data"] == len(jax.devices()) // 2
    with pytest.raises(ValueError):
        build_serving_mesh(8, 2)


def test_tp_placement_survives_lora_fuse():
    """In-request set_adapters (constructor sweeps, LoRA model blocks)
    replaces param trees AFTER the generation counter was bumped at entry —
    placement must key on tree identity, or every later request silently
    runs unsharded."""
    import jax

    from stablediffusion_tpu.lora.core import UNET_TARGET_SUFFIXES, init_lora
    from stablediffusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, tensor=2, devices=jax.devices()[:8])
    model = make_tiny_model("sd15")
    h = Handler(model=model, mesh=mesh)
    assert "error" not in h({**ARGS, "seed": 1}, "tp-a")

    lora = init_lora(jax.random.key(0), model.unet_params, 2,
                     UNET_TARGET_SUFFIXES, store_alpha=False)
    model.load_lora_weights("t", {"unet": lora})
    model.set_adapters({"t": 0.5})  # replicated trees replace sharded ones

    resp = h({**ARGS, "seed": 1}, "tp-b")
    assert "error" not in resp, resp.get("traceback")
    w = model.unet_params["down_blocks"]["0"]["attentions"]["0"][
        "transformer_blocks"]["0"]["attn1"]["to_q"]["weight"]
    assert not w.sharding.is_fully_replicated


def test_worker_startup_quantize(handler, monkeypatch):
    """--quantize applies the int8 mode to the preloaded model before
    warmup (so the warmed programs are the quantized ones) and before
    serving."""
    from stablediffusion_tpu.serve import worker

    order = []
    monkeypatch.setattr(worker, "get_handler", lambda **kw: handler)
    monkeypatch.setattr(
        handler, "warmup",
        lambda **kw: order.append(("warmup", handler.model.quant_mode)) or 1.0)
    handler.model.quant_min_size = 1
    # no --model_name: the fixture handler already has a model preloaded
    worker.main(["--warmup_only", "--quantize", "w8a8:32"])
    assert handler.model.quant_mode == "w8a8:32"
    assert order and order[0] == ("warmup", "w8a8:32")
    handler.model.quantize(None)  # restore the shared fixture


def test_batcher_partial_gather_waits_for_release_burst(handler):
    """Burst cohesion (round 5): while a multi-request release burst is in
    flight (postprocess encoding responses), a PARTIAL gather must hold its
    window open so the burst's resubmits coalesce instead of dispatching a
    shredded batch — and requests arriving during the hold merge."""
    import threading
    import time as _time

    from stablediffusion_tpu.serve.batcher import Batcher

    b = Batcher(handler, max_batch=4, window_ms=10.0, adaptive=True)
    try:
        # simulate an in-flight release burst
        with b._pending_lock:
            b._post_inflight += 1
        results = {}

        def go(seed, delay):
            _time.sleep(delay)
            results[seed] = b.submit({**ARGS, "seed": seed}, f"p{seed}")

        threads = [
            threading.Thread(target=go, args=(41, 0.0)),
            # arrives well past the 10 ms window — only the cohesion hold
            # can merge it into the first request's batch
            threading.Thread(target=go, args=(42, 0.25)),
        ]
        t0 = _time.monotonic()
        for t in threads:
            t.start()
        _time.sleep(0.5)  # hold the burst marker through both arrivals
        with b._pending_lock:
            b._post_inflight -= 1
            b._last_release = float("-inf")  # skip the turnaround bridge
        for t in threads:
            t.join(timeout=120)
        held = _time.monotonic() - t0
        for s in (41, 42):
            assert "error" not in results[s], results[s]
            assert results[s]["batched"] == 2, results[s]
        assert held >= 0.5  # the gather really waited out the hold
    finally:
        b.close()


def test_batcher_full_batch_dispatches_despite_release_burst(handler):
    """The cohesion hold only delays PARTIAL gathers: a full batch exits by
    size immediately even while a release burst is marked in flight."""
    import threading

    from stablediffusion_tpu.serve.batcher import Batcher

    b = Batcher(handler, max_batch=2, window_ms=10.0, adaptive=True)
    try:
        with b._pending_lock:
            b._post_inflight += 1  # never cleared during the submits
        results = {}

        def go(seed):
            results[seed] = b.submit({**ARGS, "seed": seed}, f"p{seed}")

        threads = [threading.Thread(target=go, args=(s,)) for s in (51, 52)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)  # completes: the full batch never waited
        for s in (51, 52):
            assert "error" not in results[s], results[s]
            assert results[s]["batched"] == 2
    finally:
        with b._pending_lock:
            b._post_inflight -= 1
        b.close()
