"""Tracing / metrics (SURVEY.md §5.1, §5.5 — absent in the reference; built
here as first-class).

* `trace(name)` — context manager wrapping `jax.profiler.TraceAnnotation`
  plus wall-clock capture; `start_profile(logdir)` dumps a TensorBoard-
  compatible XLA trace when the backend supports it.
* `Metrics` — lightweight counters/timers surfaced in server responses and
  training logs (step time, images/sec), with optional tensorboard sink.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(name: str, metrics: Optional["Metrics"] = None):
    """Annotate a region for the XLA profiler and record wall time."""
    t0 = time.perf_counter()
    try:
        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover - backend without profiler
        ctx = contextlib.nullcontext()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    if metrics is not None:
        metrics.observe(name + "_sec", dt)


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # pragma: no cover
        logger.warning("profiler unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


class Metrics:
    """Counters + exponential averages; optional tensorboard writer."""

    def __init__(self, tensorboard_dir: Optional[str] = None):
        self.values: Dict[str, float] = {}
        self.counts: Dict[str, int] = defaultdict(int)
        self._tb = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except ImportError:  # pragma: no cover
                logger.info("tensorboard unavailable; metrics stay in-memory")

    def observe(self, name: str, value: float, step: Optional[int] = None):
        self.values[name] = float(value)
        self.counts[name] += 1
        if self._tb is not None:
            self._tb.add_scalar(name, value, step if step is not None else
                                self.counts[name])

    def images(self, tag: str, images, step: int = 0):
        if self._tb is not None:
            import numpy as np

            arr = np.asarray(images)  # [B,H,W,C] in [0,1]
            self._tb.add_images(tag, arr, step, dataformats="NHWC")

    def flush(self):
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
            self._tb = None

    def snapshot(self) -> Dict[str, float]:
        return dict(self.values)
