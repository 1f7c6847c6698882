"""Metrics / logging / observability.

TPU-native counterparts of the reference's two metric systems
(SURVEY.md §5.5):
- ``SmoothedValue`` / ``MetricLogger`` with the windowed median/avg/global
  semantics of utils/coco/util/misc.py:27-246, including the iter/data-time
  split of ``log_every``; cross-process sync uses a jitted psum instead of
  dist.all_reduce (misc.py:45-56).
- ``accuracy_topk`` (misc.py:432-448 surface).
- ``step_timer`` — wall-clock step timing that synchronizes via a host
  transfer (the axon tunnel makes block_until_ready a no-op), plus
  ``profile_trace`` wrapping jax.profiler for TensorBoard/Perfetto traces
  (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import datetime
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SmoothedValue:
    """Track a series with a smoothing window; exposes median/avg/
    global_avg/max/value like the reference meter."""

    def __init__(self, window_size: int = 20, fmt: Optional[str] = None):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt or "{median:.4f} ({global_avg:.4f})"

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """All-reduce (count, total) across hosts (misc.py:45-56 analogue)."""
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        ct = multihost_utils.process_allgather(
            np.asarray([self.count, self.total], np.float64)
        )
        self.count = int(ct[:, 0].sum())
        self.total = float(ct[:, 1].sum())

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "\t"):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(
            f"'{type(self).__name__}' object has no attribute '{attr}'"
        )

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = ""):
        """Yield items while logging iter/data time, ETA and meters
        (misc.py:194-246 semantics)."""
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total and i == total - 1):
                if total:
                    eta = datetime.timedelta(
                        seconds=int(iter_time.global_avg * (total - i)))
                    eta_s = f"eta: {eta}"
                else:
                    eta_s = ""
                print(self.delimiter.join(filter(None, [
                    header, f"[{i}" + (f"/{total}]" if total else "]"),
                    eta_s, str(self),
                    f"time: {iter_time}", f"data: {data_time}",
                ])))
            i += 1
            end = time.time()
        elapsed = time.time() - start
        print(f"{header} Total time: "
              f"{datetime.timedelta(seconds=int(elapsed))} "
              f"({elapsed / max(i, 1):.4f} s / it)")


def accuracy_topk(logits, labels, topk=(1,)):
    """Top-k accuracies in percent (misc.py:432-448 surface)."""
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels)
    maxk = max(topk)
    top = jnp.argsort(logits, axis=-1)[:, ::-1][:, :maxk]
    correct = top == labels[:, None]
    batch = labels.shape[0]
    return [
        float(jnp.sum(correct[:, :k]) * 100.0 / batch) for k in topk
    ]


@contextlib.contextmanager
def step_timer():
    """Wall-clock timer that really synchronizes (host transfer, not
    block_until_ready — see .claude/skills/verify/SKILL.md on axon)."""
    result = {}
    t0 = time.perf_counter()
    yield result
    result["seconds"] = time.perf_counter() - t0


def force_sync(x) -> float:
    """Force device completion by pulling one scalar to the host."""
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace (TensorBoard/Perfetto), SURVEY.md §5.1."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def get_sha() -> str:
    """Git provenance stamp (misc.py:249-266 surface)."""
    import subprocess

    try:
        sha = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=None, text=True
        ).strip()
        diff = subprocess.check_output(
            ["git", "diff-index", "HEAD"], text=True
        ).strip()
        return f"sha: {sha}, status: {'has uncommitted changes' if diff else 'clean'}"
    except Exception:
        return "sha: N/A"
