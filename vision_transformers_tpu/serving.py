"""AOT export + serving for trained classifiers.

The reference has no deployment story — every model file's ``__main__``
ends at training (e.g. /root/reference/models/image_classification/
vanilla_vit.py:303-318). A production TPU serving path needs three things
the training stack doesn't provide:

1. **Ahead-of-time export**: the jitted forward serialized as versioned
   StableHLO (``jax.export``) so the serving process needs neither the
   Python model code nor a re-trace — just this module, the artifact
   directory, and jax.
2. **Static batch buckets**: XLA compiles one program per input shape; a
   server must never see a novel batch size at request time. Requests are
   padded up to a fixed bucket (or chunked through the largest one).
3. **Request micro-batching**: single-image requests would waste the MXU;
   a tiny batcher coalesces concurrent requests into one device call.

Artifacts are single-platform by design: the compute path selects Pallas
kernels vs jnp oracles at trace time from ``jax.default_backend()``
(ops/windows.py:241, ops/flash_attention.py:174), so an artifact must be
exported on the platform it serves on. That is standard AOT practice —
compiler options are platform-tuned anyway — and the manifest records the
platform so a mismatch fails loudly at load, not silently at 100× cost.

Params are shipped beside the StableHLO (flax msgpack), not baked into it
as constants: the graph stays small and version-diffable, and the same
artifact can be refreshed with newer weights without re-exporting.

Multi-chip serving: pass a ``jax.sharding.Mesh`` to ``export_classifier``
and the artifact becomes a data-parallel SPMD program (params replicated,
batch sharded over ``data_axis``); ``load_classifier(dir, mesh=...)``
binds it to a same-size mesh at serve time.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MANIFEST = "manifest.json"
_PARAMS = "params.msgpack"
_FWD_FMT = "fwd_b{b}.jaxexport"
_FORMAT_VERSION = 1


def _forward_fn(model) -> Callable:
    def fwd(params, images):
        return model.apply({"params": params}, images, deterministic=True)

    return fwd


_QUANT_TARGETS = {  # parent module -> Dense children QuantDense replaces
    "self_attention": ("qkv", "out"),
    "mlp": ("fc1", "fc2"),
}


def quantize_classifier(model, params):
    """Post-training int8 (w8a8) quantization for serving.

    Returns ``(model.clone(quant8=True), transformed params)``: every
    encoder projection/MLP Dense kernel becomes int8 per-channel weights +
    scales (ops/quant.py), activations quantize dynamically at run time —
    no calibration set needed. TPU v5e runs s8×s8→s32 on the MXU at 2× the
    bf16 rate, so this roughly doubles the FLOP-roofline ceiling of the
    FLOP-bound encoder matmuls. Patch embed and head stay in the float
    dtype (a few % of time; the head is accuracy-critical).
    """
    if not hasattr(model, "quant8"):
        raise ValueError(
            f"{type(model).__name__} has no quant8 serving path")

    from vision_transformers_tpu.ops.quant import quantize_dense_params

    from collections.abc import Mapping

    def walk(tree, parent):
        out = {}
        for key, sub in tree.items():
            if (isinstance(sub, Mapping) and "kernel" in sub
                    and key in _QUANT_TARGETS.get(parent, ())):
                out[key] = quantize_dense_params(dict(sub))
            elif isinstance(sub, Mapping):
                out[key] = walk(sub, key)
            else:
                out[key] = sub
        return out

    return model.clone(quant8=True), walk(params, "")


def _dp_shardings(mesh, data_axis: str):
    from jax.sharding import NamedSharding, PartitionSpec

    return (NamedSharding(mesh, PartitionSpec()),           # params: replicated
            NamedSharding(mesh, PartitionSpec(data_axis)))  # batch-sharded


def export_classifier(
    model,
    params,
    input_shape: Sequence[int],
    out_dir: str,
    *,
    buckets: Sequence[int] = (1, 8, 32),
    dtype: Any = jnp.float32,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
) -> dict:
    """Export ``model.apply({'params': params}, x, deterministic=True)``
    for each batch bucket to ``out_dir`` and return the manifest.

    ``input_shape`` is the per-image shape, e.g. ``(224, 224, 3)``;
    ``dtype`` is the INPUT dtype the server will feed (the model's own
    compute dtype is whatever it was constructed with).

    With ``mesh``, the export is an SPMD data-parallel program: params
    replicated, batch sharded over ``data_axis`` (buckets must divide
    evenly). The artifact then requires a same-size mesh at load time —
    multi-chip serving without the model code, same as single-chip.
    """
    buckets = sorted(set(int(b) for b in buckets))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"buckets must be positive ints, got {buckets}")
    if mesh is not None:
        n_shards = mesh.shape[data_axis]
        bad = [b for b in buckets if b % n_shards]
        if bad:
            raise ValueError(
                f"buckets {bad} not divisible by mesh axis "
                f"'{data_axis}'={n_shards}"
            )
    os.makedirs(out_dir, exist_ok=True)

    from flax import serialization

    fwd = _forward_fn(model)
    param_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        params,
    )
    files = {}
    out_shapes = {}
    for b in buckets:
        x_spec = jax.ShapeDtypeStruct((b, *input_shape), dtype)
        if mesh is None:
            jitted = jax.jit(fwd)
        else:
            p_sh, x_sh = _dp_shardings(mesh, data_axis)
            jitted = jax.jit(fwd, in_shardings=(p_sh, x_sh),
                             out_shardings=x_sh)
        exported = jax.export.export(jitted)(param_specs, x_spec)
        name = _FWD_FMT.format(b=b)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exported.serialize())
        files[str(b)] = name
        out_shapes[str(b)] = [list(s.shape) for s in exported.out_avals]

    with open(os.path.join(out_dir, _PARAMS), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))

    manifest = {
        "format_version": _FORMAT_VERSION,
        "platforms": list(exported.platforms),
        "nr_devices": exported.nr_devices,
        "data_axis": data_axis if mesh is not None else None,
        "buckets": buckets,
        "input_shape": list(input_shape),
        "input_dtype": jnp.dtype(dtype).name,
        "out_shapes": out_shapes,
        "files": files,
        "params_file": _PARAMS,
        "model": type(model).__name__,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingClassifier:
    """Loaded AOT artifact: pads/chunks requests through fixed buckets.

    ``predict(images)`` accepts ``(n, *input_shape)`` for any ``n >= 1``:
    n is padded up to the smallest bucket that fits, or chunked through
    the largest bucket (full chunks run un-padded).
    """

    def __init__(self, manifest: dict, calls: dict, params,
                 x_sharding=None):
        self.manifest = manifest
        self._calls = calls  # bucket -> callable(params, x)
        self._params = params
        self._x_sharding = x_sharding  # SPMD artifacts: batch placement
        self.buckets = sorted(calls)
        self.input_shape = tuple(manifest["input_shape"])
        self.input_dtype = jnp.dtype(manifest["input_dtype"])

    def warmup(self) -> None:
        """Compile every bucket now (first request pays nothing)."""
        for b in self.buckets:
            x = jnp.zeros((b, *self.input_shape), self.input_dtype)
            jax.block_until_ready(self._calls[b](self._params, x))

    def _run_bucket(self, b: int, x) -> jax.Array:
        n = x.shape[0]
        if n < b:
            x = jnp.concatenate(
                [x, jnp.zeros((b - n, *x.shape[1:]), x.dtype)], axis=0
            )
        if self._x_sharding is not None:
            x = jax.device_put(x, self._x_sharding)
        out = self._calls[b](self._params, x)
        return out[:n]

    def predict(self, images) -> jax.Array:
        """Logits for ``images`` of shape ``(n, *input_shape)``."""
        x = jnp.asarray(images, self.input_dtype)
        if x.ndim == len(self.input_shape):  # single image convenience
            x = x[None]
        if x.shape[1:] != self.input_shape:
            raise ValueError(
                f"expected (n, {self.input_shape}), got {x.shape}"
            )
        n = x.shape[0]
        big = self.buckets[-1]
        if n <= big:
            bucket = next(b for b in self.buckets if b >= n)
            return self._run_bucket(bucket, x)
        parts = [
            self._run_bucket(big, x[i: i + big]) for i in range(0, n, big)
        ]
        return jnp.concatenate(parts, axis=0)


def load_classifier(
    artifact_dir: str,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> ServingClassifier:
    """Load an exported artifact; fails loudly on a platform mismatch.

    An SPMD artifact (exported with a mesh) requires ``mesh`` with the
    same total device count and the manifest's ``data_axis``.
    """
    with open(os.path.join(artifact_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"artifact format {manifest.get('format_version')} != "
            f"{_FORMAT_VERSION} supported by this build"
        )
    backend = jax.default_backend()
    if backend not in manifest["platforms"]:
        raise RuntimeError(
            f"artifact exported for {manifest['platforms']} cannot serve on "
            f"'{backend}': kernel paths are chosen at export-trace time — "
            f"re-export on the serving platform"
        )
    nr_devices = manifest.get("nr_devices", 1)
    x_sharding = p_sharding = None
    if nr_devices > 1:
        if mesh is None or mesh.size != nr_devices:
            raise RuntimeError(
                f"SPMD artifact needs a {nr_devices}-device mesh, got "
                f"{'none' if mesh is None else mesh.size}"
            )
        p_sharding, x_sharding = _dp_shardings(mesh, manifest["data_axis"])

    from flax import serialization

    with open(os.path.join(artifact_dir, manifest["params_file"]), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    params = (jax.device_put(params) if p_sharding is None
              else jax.device_put(params, p_sharding))

    calls = {}
    for b_str, name in manifest["files"].items():
        with open(os.path.join(artifact_dir, name), "rb") as f:
            exported = jax.export.deserialize(f.read())
        calls[int(b_str)] = jax.jit(exported.call)
    return ServingClassifier(manifest, calls, params, x_sharding=x_sharding)


class Microbatcher:
    """Coalesce concurrent single-image requests into one device call.

    ``submit(image)`` blocks until the result is ready; a background
    flusher fires when ``max_batch`` requests are queued or the oldest
    request has waited ``max_wait_ms``. Thread-safe; one in-flight device
    call at a time (TPU programs serialize anyway).
    """

    def __init__(self, classifier: ServingClassifier,
                 max_batch: Optional[int] = None, max_wait_ms: float = 2.0):
        self._clf = classifier
        self._max_batch = max_batch or classifier.buckets[-1]
        self._max_wait = max_wait_ms / 1e3
        self._lock = threading.Condition()
        self._pending: list = []  # [(image, event, slot)]
        self._closed = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, image) -> np.ndarray:
        ev = threading.Event()
        slot: list = [None]
        with self._lock:
            if self._closed:
                raise RuntimeError("Microbatcher is closed")
            self._pending.append((image, ev, slot))
            self._lock.notify()
        ev.wait()
        if isinstance(slot[0], BaseException):
            raise slot[0]
        return slot[0]

    def close(self) -> None:
        with self._lock:
            self._closed = True
            self._lock.notify()
        self._thread.join()

    def _loop(self) -> None:
        while True:
            with self._lock:
                while not self._pending and not self._closed:
                    self._lock.wait()
                if not self._pending and self._closed:
                    return
                # batch not full yet: give co-arriving requests a window
                if len(self._pending) < self._max_batch and not self._closed:
                    self._lock.wait(timeout=self._max_wait)
                batch = self._pending[: self._max_batch]
                self._pending = self._pending[self._max_batch:]
            try:
                logits = np.asarray(
                    self._clf.predict(np.stack([b[0] for b in batch]))
                )
                for i, (_, ev, slot) in enumerate(batch):
                    slot[0] = logits[i]
                    ev.set()
            except BaseException as e:  # surface to every waiter
                for _, ev, slot in batch:
                    slot[0] = e
                    ev.set()
