"""Serverless-style worker (rp_handler analog).

The reference wires Handler into runpod.serverless
(runpod-worker/rp_handler.py:44-63).  Here the same handler is exposed two
ways:
  * `trigger_fn(request)` — the job-queue entry point, signature-compatible
    with runpod's {id, input} schema; if the `runpod` package is present it
    is registered with runpod.serverless.start, otherwise
  * a built-in threaded HTTP server (POST / with the same JSON schema),
    usable standalone:  python -m stablediffusion_tpu.serve.worker --port 8000

Requests are handled one at a time (single-writer model slot; SURVEY.md §5.2).
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from stablediffusion_tpu.core.compile_cache import enable_compilation_cache
from stablediffusion_tpu.serve.handler import Handler

logger = logging.getLogger(__name__)

_LOCK = threading.Lock()
HANDLER: Optional[Handler] = None
BATCHER = None  # serve/batcher.Batcher when HTTP micro-batching is enabled


class _Server(ThreadingHTTPServer):
    # stdlib default accept backlog is 5: a 32-client burst on a busy
    # single-core host overflows it and clients see ECONNRESET (observed in
    # bench_serving clients32); size it for serving under load
    request_queue_size = 128


def make_server(addr) -> ThreadingHTTPServer:
    return _Server(addr, _HTTPHandler)


def get_handler(**kw) -> Handler:
    global HANDLER
    if HANDLER is None:
        enable_compilation_cache()
        HANDLER = Handler(**kw)
    return HANDLER


def build_serving_mesh(dp: int, tp: int = 1):
    """`--mesh_dp N [--mesh_tp K]` support: a Mesh over the first N*K local
    devices.  Merged request batches shard over the `data` axis
    (SURVEY §2.10 "shard batch across chips for throughput serving"); with
    tp > 1 the model's attention/MLP kernels additionally shard over the
    `tensor` axis (parallel/tp.py — latency scaling for big models).  The
    per-sample seed streams keep every request's image bit-identical to its
    single-chip render, so meshing is invisible to clients."""
    import jax

    from stablediffusion_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    tp = max(int(tp or 1), 1)
    if dp in (0, 1) and tp == 1 and len(devices) == 1:
        return None  # single chip: no mesh overhead
    n = len(devices) // tp if dp in (-1, 0) else dp
    if n < 1 or n * tp > len(devices):
        raise ValueError(
            f"--mesh_dp {dp} --mesh_tp {tp}: only {len(devices)} devices"
        )
    return make_mesh(data=n, tensor=tp, devices=devices[: n * tp])


def trigger_fn(request: Dict[str, Any]) -> Dict[str, Any]:
    """Job entry: {id, input: {mode?, model?, params?, prompt...}}
    (ref schema: rp_handler.py:48-60)."""
    handler = get_handler()
    with _LOCK:  # serialize: the model slot is single-writer
        return handler(request.get("input") or {}, request.get("id", ""))


class _HTTPHandler(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802
        length = int(self.headers.get("Content-Length", 0))
        try:
            request = json.loads(self.rfile.read(length) or b"{}")
        except json.JSONDecodeError as e:
            self._reply(400, {"error": f"bad json: {e}"})
            return
        if BATCHER is not None:
            result = BATCHER.submit(
                request.get("input") or {}, request.get("id", "")
            )
        else:
            result = trigger_fn(request)
        self._reply(200 if "error" not in result else 500, result)

    def do_GET(self):  # noqa: N802 — health check + UI
        if self.path.rstrip("/") == "/ui":
            from stablediffusion_tpu.serve.webapp import index_html

            body = index_html().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        self._reply(200, {"status": "ok", "model": getattr(
            get_handler().model, "model_type", None)})

    def _reply(self, code: int, obj: Dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):
        logger.info("%s " + fmt, self.client_address[0], *args)


def serve_http(
    port: int = 8000,
    max_batch: int = 8,
    batch_window_ms: float = 25.0,
    **handler_kw,
):
    """Threaded HTTP server with dynamic micro-batching (serve/batcher.py):
    concurrent same-shape txt2img requests merge into one pipeline call.
    max_batch=1 restores the reference's strictly serial behavior."""
    global BATCHER
    handler = get_handler(**handler_kw)
    # quantize="auto" resolves against the merge-batch regime the server
    # actually runs (b>=8 → full w8a8, else mixed w8a8:2048)
    handler.expected_batch = max(1, int(max_batch))
    if max_batch > 1:
        from stablediffusion_tpu.serve.batcher import Batcher

        BATCHER = Batcher(handler, max_batch=max_batch, window_ms=batch_window_ms)
    server = make_server(("0.0.0.0", port))
    logger.info("serving on :%d (max_batch=%d)", port, max_batch)
    server.serve_forever()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--model_dir", type=str, default=None)
    p.add_argument("--lora_dir", type=str, default=None)
    p.add_argument("--model_type", type=str, default="sdxl")
    p.add_argument("--model_name", type=str, default=None,
                   help="preload this checkpoint (ref preloads AnimaPencil)")
    p.add_argument("--max_batch", type=int, default=8,
                   help="HTTP micro-batch cap; 1 = serial (reference behavior)")
    p.add_argument("--batch_window_ms", type=float, default=25.0)
    p.add_argument("--mesh_dp", type=int, default=0,
                   help="shard merged batches over N chips (data-parallel "
                        "mesh); -1 = all local devices, 0 = off")
    p.add_argument("--mesh_tp", type=int, default=1,
                   help="additionally shard attention/MLP kernels over K "
                        "chips (tensor parallel; devices used = dp*tp)")
    p.add_argument("--quantize", default=None,
                   help="int8 UNet mode applied to the preloaded model at "
                        "startup (auto | w8 | w8a8 | w8a8:N mixed — "
                        "w8a8:2048 is the batch-1 winner, w8a8 the batch-8 "
                        "winner, both ~1.11x fp; 'auto' picks by "
                        "--max_batch; requests can still override per-call). "
                        "Applied before --warmup so the warmed programs are "
                        "the quantized ones.")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile the hot path (batch 1 and max_batch) "
                        "before accepting requests — the first real request "
                        "then skips the multi-minute XLA compile")
    p.add_argument("--warmup_steps", type=int, default=25)
    p.add_argument("--warmup_size", type=int, default=None,
                   help="square warmup resolution (default: model native)")
    p.add_argument("--warmup_only", action="store_true",
                   help="exit after --warmup instead of serving: bake the "
                        "persistent XLA compile cache into a serving image "
                        "at build time (Dockerfile pattern), so cold starts "
                        "skip the first-request compile entirely (measured: "
                        "81.5 -> 15.2 s first image, bench_coldstart.py)")
    args = p.parse_args(argv)
    if args.warmup_only:
        args.warmup = True
    logging.basicConfig(level=logging.INFO)

    mesh = (
        build_serving_mesh(args.mesh_dp, args.mesh_tp)
        if (args.mesh_dp or args.mesh_tp > 1)
        else None
    )
    if mesh is not None:
        logger.info("serving mesh: %s", dict(mesh.shape))
    handler = get_handler(
        model_dir=args.model_dir, lora_dir=args.lora_dir, mesh=mesh
    )
    # set BEFORE --quantize so "--quantize auto" resolves to the serving
    # regime's measured optimum (see ops/quant.resolve_quant_mode)
    handler.expected_batch = max(1, int(args.max_batch))
    if args.model_name:
        handler.maybe_reload_model(
            {"type": args.model_type, "name": args.model_name}
        )
    if args.quantize:
        if handler.model is None:
            logger.warning("--quantize ignored: no model preloaded")
        else:
            # same idempotent path requests use (validates the mode string
            # before mutating state; no-op on an int8-on-disk checkpoint
            # already at this mode)
            handler.maybe_reload_model({"quantize": args.quantize})
    if args.warmup:
        if handler.model is None:
            logger.warning("--warmup ignored: no model preloaded")
        else:
            # every power of two up to max_batch: the batcher pads merged
            # groups to pow2 shapes, so these are exactly the shapes a
            # serving process can ever compile
            batches = [1]
            while batches[-1] * 2 <= args.max_batch:
                batches.append(batches[-1] * 2)
            batches = tuple(batches)
            handler.warmup(
                steps=args.warmup_steps, size=args.warmup_size, batches=batches
            )
    if args.warmup_only:
        logger.info("--warmup_only: compile cache populated, exiting")
        return

    try:
        import runpod  # serverless platform, if present

        runpod.serverless.start({"handler": trigger_fn})
    except ImportError:
        serve_http(
            args.port,
            max_batch=args.max_batch,
            batch_window_ms=args.batch_window_ms,
            model_dir=args.model_dir,
            lora_dir=args.lora_dir,
        )


if __name__ == "__main__":
    main()
