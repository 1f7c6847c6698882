"""The one shared trainer.

Replaces the reference's per-model copy-pasted ``train_model`` loops
(base.py:32-126 and its 7 clones). Reference semantics preserved:
CrossEntropyLoss, Adam lr=1e-4 default, per-epoch train → (optional) val →
test phases, tqdm progress, and a returned metrics dict with keys
{train,val,test}_{loss,accuracy} (base.py:124-126).

TPU-first deltas (SURVEY.md §7 "what idiomatic TPU design deletes"):
- One jitted train step (forward + loss + grad + fused optimizer update),
  donated state — no per-batch ``.to(device)`` copies.
- uint8 batches travel to the device; normalization is fused into the step.
- Loss/accuracy accumulate as device scalars; host sync happens once per
  epoch (the reference syncs twice per batch via ``.item()``).
- Ragged final batches are padded and masked with per-example weights instead
  of recompiling: every step sees one static shape.
- Optional ``jax.sharding.Mesh``: batch sharded over the 'data' axis, params
  replicated (or TP-sharded via parallel.sharding rules); XLA inserts the
  gradient all-reduce over ICI — no DDP wrapper, no NCCL
  (vs utils/coco/util/misc.py:407-429).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from tqdm import tqdm

from vision_transformers_tpu.training.optimizers import make_optimizer


class TrainState(train_state.TrainState):
    def apply_gradients(self, *, grads, **kwargs):
        # FusedAdam: the whole update (moments + bias correction + param
        # add) is one in-place Pallas pass per leaf — bypass the optax
        # update/apply_updates split, which would re-stream params.
        fused = getattr(self.tx, "fused_apply", None)
        if fused is not None:
            new_params, new_opt_state = fused(
                self.params, grads, self.opt_state)
            return self.replace(
                step=self.step + 1, params=new_params,
                opt_state=new_opt_state, **kwargs)
        return super().apply_gradients(grads=grads, **kwargs)


def cross_entropy_with_weights(logits, labels, weights):
    """Weighted-mean CE over valid (weight=1) examples; matches
    nn.CrossEntropyLoss mean reduction when all weights are 1."""
    logits = logits.astype(jnp.float32)
    per_ex = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    total_w = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(per_ex * weights) / total_w


def _default_preprocess(images, normalize):
    """On-device normalization: uint8 NHWC → normalized float."""
    if images.dtype == jnp.uint8:
        x = images.astype(jnp.float32) / 255.0
    else:
        x = images.astype(jnp.float32)
    if normalize is not None:
        mean, std = normalize
        x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x


def multi_train_step_fn(model, normalize=None, loss_fn=None,
                        teacher_fn=None, distill=None):
    """k steps per dispatch via lax.scan — amortizes host→device dispatch
    latency for small models (batches stacked to (k, B, ...))."""
    step = train_step_fn(model, normalize, loss_fn, teacher_fn, distill)

    def multi(state: TrainState, images, labels, weights, rng):
        def body(state, batch):
            im, lb, w = batch

            def do_step(st):
                return step(st, im, lb, w, rng)

            def skip(st):  # all-padding batch (epoch-tail chunk filler):
                return st, jnp.float32(0), jnp.float32(0), jnp.float32(0)

            state, l, c, n = jax.lax.cond(
                jnp.sum(w) > 0, do_step, skip, state)
            return state, (l, c, n)

        state, (ls, cs, ns) = jax.lax.scan(
            body, state, (images, labels, weights))
        return state, jnp.sum(ls), jnp.sum(cs), jnp.sum(ns)

    return multi


def multi_eval_step_fn(model, normalize=None, loss_fn=None):
    step = eval_step_fn(model, normalize, loss_fn)

    def multi(params, images, labels, weights):
        def body(carry, batch):
            im, lb, w = batch
            l, c, n = step(params, im, lb, w)
            return carry, (l, c, n)

        _, (ls, cs, ns) = jax.lax.scan(
            body, 0, (images, labels, weights))
        return jnp.sum(ls), jnp.sum(cs), jnp.sum(ns)

    return multi


def train_step_fn(model, normalize=None, loss_fn=None,
                  teacher_fn=None, distill=None):
    """Build the jitted train step for a classification model.

    ``teacher_fn`` (images→logits) enables DeiT-style distillation: the
    model's training forward must return (cls_logits, dist_logits) and
    ``distill`` = (type, alpha, tau) blends the base loss with the
    distillation term (utils/distillation_loss.py)."""
    loss_fn = loss_fn or cross_entropy_with_weights

    def step(state: TrainState, images, labels, weights, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        x = _default_preprocess(images, normalize)

        def compute_loss(params):
            out = model.apply(
                {"params": params}, x,
                deterministic=False, rngs={"dropout": dropout_rng},
            )
            if teacher_fn is not None:
                from vision_transformers_tpu.utils.distillation_loss import (
                    distillation_loss,
                )

                cls_logits, dist_logits = out
                base = loss_fn(cls_logits, labels, weights)
                teacher_logits = jax.lax.stop_gradient(teacher_fn(x))
                dtype_, alpha, tau = distill or ("hard", 0.5, 5.0)
                loss = distillation_loss(
                    base, dist_logits, teacher_logits, dtype_, alpha, tau)
                return loss, cls_logits
            logits = out
            loss = loss_fn(logits, labels, weights)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == labels) * weights)
        n = jnp.sum(weights)
        return state, loss * n, correct, n

    return step


def eval_step_fn(model, normalize=None, loss_fn=None):
    loss_fn = loss_fn or cross_entropy_with_weights

    def step(params, images, labels, weights):
        x = _default_preprocess(images, normalize)
        logits = model.apply({"params": params}, x, deterministic=True)
        loss = loss_fn(logits, labels, weights)
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == labels) * weights)
        n = jnp.sum(weights)
        return loss * n, correct, n

    return step


def make_train_state(
    model,
    rng: jax.Array,
    sample_input: jax.Array,
    tx: Optional[optax.GradientTransformation] = None,
    lr: float = 1e-4,
    optimizer: str = "adam",
    **opt_kwargs,
) -> TrainState:
    if tx is None:
        tx = make_optimizer(optimizer, lr, **opt_kwargs)
    init_rng, dropout_rng = jax.random.split(rng)
    # jit the init: eager init dispatches every op separately (and compiles
    # each Pallas shape standalone) — measured 209 s for SwinV2-32 over the
    # axon tunnel vs one ~10 s compiled program
    variables = jax.jit(model.init)(
        {"params": init_rng, "dropout": dropout_rng},
        jnp.zeros_like(sample_input, dtype=jnp.float32)
        if sample_input.dtype == jnp.uint8 else sample_input,
    )
    return TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx)


def _pad_batch(images: np.ndarray, labels: np.ndarray, batch_size: int):
    n = images.shape[0]
    weights = np.zeros((batch_size,), np.float32)
    weights[:n] = 1.0
    if n < batch_size:
        pad = batch_size - n
        images = np.concatenate(
            [images, np.zeros((pad,) + images.shape[1:], images.dtype)], axis=0
        )
        labels = np.concatenate([labels, np.zeros((pad,), labels.dtype)], axis=0)
    return images, labels, weights


def _as_nhwc(images: np.ndarray) -> np.ndarray:
    """Accept NCHW (reference layout) or NHWC; the device side is NHWC."""
    if images.ndim == 4 and images.shape[1] in (1, 3) and images.shape[-1] not in (1, 3):
        return np.transpose(images, (0, 2, 3, 1))
    return images


def _to_numpy(x):
    if hasattr(x, "detach"):  # torch tensor from a reference-style loader
        x = x.detach().cpu().numpy()
    return np.asarray(x)


class _OneShotLoader:
    """Wraps a one-shot train iterator whose first batch was consumed by the
    shape probe: epoch 1 replays the probed batch then drains the iterator;
    any further epoch would silently see no data, so it raises instead."""

    def __init__(self, first, rest):
        self._first = first
        self._rest = rest
        self._used = False

    def __iter__(self):
        if self._used:
            raise RuntimeError(
                "train_loader is a one-shot iterator (generator) already "
                "exhausted by epoch 1; pass a re-iterable loader to train "
                "for more than one epoch."
            )
        self._used = True
        yield self._first
        yield from self._rest


def fit(
    model,
    train_loader: Iterable,
    test_loader: Iterable,
    epochs: int,
    val_loader: Optional[Iterable] = None,
    *,
    lr: float = 1e-4,
    optimizer: str = "adam",
    loss_fn: Optional[Callable] = None,
    seed: int = 0,
    mesh: Optional[jax.sharding.Mesh] = None,
    state: Optional[TrainState] = None,
    log_every: int = 50,
    verbose: bool = True,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    steps_per_call: int = 1,
    teacher_fn: Optional[Callable] = None,
    distill: Optional[Tuple[str, float, float]] = None,
    **opt_kwargs,
):
    """Train ``model``; returns the reference-parity metrics dict.

    Loaders are any iterables of (images, labels) numpy/torch batches; an
    optional ``loader.normalize = (mean, std)`` attribute moves normalization
    onto the device (utils.load_data loaders set it).

    ``steps_per_call > 1`` stacks that many batches per device dispatch and
    runs them under one lax.scan — essential for small models where
    per-step dispatch latency (e.g. the axon tunnel) exceeds compute.
    """
    rng = jax.random.PRNGKey(seed)
    normalize = getattr(train_loader, "normalize", None)

    probe_it = iter(train_loader)
    first = next(probe_it)
    if probe_it is iter(train_loader):
        # One-shot iterator (a generator): iterating again won't replay the
        # probed batch. Restore it for epoch 1 and fail loudly if a second
        # epoch (which would silently see no data) is attempted.
        train_loader = _OneShotLoader(first, probe_it)
    images0, labels0 = _to_numpy(first[0]), _to_numpy(first[1])
    images0 = _as_nhwc(images0)
    batch_size = images0.shape[0]

    tp_active = (
        mesh is not None and "model" in mesh.shape and mesh.shape["model"] > 1
    )
    if state is None:
        if tp_active:
            # init → TP-shard params → build opt state FROM sharded params
            # so Adam moments inherit the shardings (Megatron-style TP via
            # parallel.mesh rules; DP over the 'data' axis as below).
            from vision_transformers_tpu.parallel.mesh import shard_params
            from vision_transformers_tpu.training.optimizers import (
                make_optimizer,
            )

            init_rng, dropout_rng = jax.random.split(rng)
            sample = jnp.asarray(images0[:1])
            variables = jax.jit(model.init)(
                {"params": init_rng, "dropout": dropout_rng},
                jnp.zeros_like(sample, dtype=jnp.float32)
                if sample.dtype == jnp.uint8 else sample,
            )
            state = TrainState.create(
                apply_fn=model.apply,
                params=shard_params(variables["params"], mesh),
                tx=make_optimizer(optimizer, lr, **opt_kwargs),
            )
        else:
            state = make_train_state(
                model, rng, jnp.asarray(images0[:1]),
                lr=lr, optimizer=optimizer, **opt_kwargs,
            )

    k = max(1, steps_per_call)
    data_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # Chunked batches are stacked to (k, B, ...): shard the BATCH axis
        # over 'data', never the scan/chunk axis k.
        spec = P("data") if k == 1 else P(None, "data")
        data_sharding = NamedSharding(mesh, spec)
        if not tp_active:
            state = jax.device_put(state, NamedSharding(mesh, P()))
    if k == 1:
        train_step = jax.jit(
            train_step_fn(model, normalize, loss_fn, teacher_fn, distill),
            donate_argnums=0)
        eval_step = jax.jit(eval_step_fn(model, normalize, loss_fn))
    else:
        train_step = jax.jit(
            multi_train_step_fn(model, normalize, loss_fn, teacher_fn,
                                distill),
            donate_argnums=0)
        eval_step = jax.jit(multi_eval_step_fn(model, normalize, loss_fn))

    def put(arrs):
        if data_sharding is None:
            return [jnp.asarray(a) for a in arrs]
        return [jax.device_put(a, data_sharding) for a in arrs]

    def chunks(loader):
        """Yield (images, labels, weights) stacked to (k, B, ...); the
        epoch-tail chunk is padded with zero-weight batches."""
        buf = []
        for images, labels in loader:
            images = _as_nhwc(_to_numpy(images))
            labels = _to_numpy(labels)
            buf.append(_pad_batch(images, labels, batch_size))
            if len(buf) == k:
                yield [np.stack(t) for t in zip(*buf)]
                buf = []
        if buf:
            pad = buf[0]
            while len(buf) < k:
                buf.append((np.zeros_like(pad[0]), np.zeros_like(pad[1]),
                            np.zeros_like(pad[2])))
            yield [np.stack(t) for t in zip(*buf)]

    def squeeze0(arrs):  # k == 1: drop the chunk axis
        return [a[0] for a in arrs]

    def run_eval(params, loader):
        loss_sum = jnp.float32(0); correct = jnp.float32(0); count = jnp.float32(0)
        for chunk in chunks(loader):
            if k == 1:
                chunk = squeeze0(chunk)
            images, labels, weights = put(chunk)
            l, c, n = eval_step(params, images, labels, weights)
            loss_sum += l; correct += c; count += n
        count = jnp.maximum(count, 1.0)
        return float(loss_sum / count), float(correct / count)

    history = {
        "train_loss": [], "val_loss": [] if val_loader else None,
        "test_loss": [],
        "train_accuracy": [], "val_accuracy": [] if val_loader else None,
        "test_accuracy": [],
    }

    step_rng = jax.random.fold_in(rng, 1)
    for epoch in range(epochs):
        loss_sum = jnp.float32(0); correct = jnp.float32(0); count = jnp.float32(0)
        it = tqdm(
            chunks(train_loader), desc=f"Epoch {epoch + 1}/{epochs}",
            unit="batch" if k == 1 else f"x{k}batch",
            disable=not verbose,
        )
        for i, chunk in enumerate(it):
            if k == 1:
                chunk = squeeze0(chunk)
            images, labels, weights = put(chunk)
            state, l, c, n = train_step(state, images, labels, weights, step_rng)
            loss_sum += l; correct += c; count += n
            if verbose and i % log_every == log_every - 1:
                it.set_postfix({
                    "Train Loss": float(loss_sum / count),
                    "Train Acc": float(correct / count),
                })

        count = jnp.maximum(count, 1.0)
        epoch_train_loss = float(loss_sum / count)
        epoch_train_acc = float(correct / count)
        history["train_loss"].append(epoch_train_loss)
        history["train_accuracy"].append(epoch_train_acc)

        if val_loader is not None:
            vl, va = run_eval(state.params, val_loader)
            history["val_loss"].append(vl)
            history["val_accuracy"].append(va)
        else:
            vl, va = "N/A", "N/A"

        tl, ta = run_eval(state.params, test_loader)
        history["test_loss"].append(tl)
        history["test_accuracy"].append(ta)

        if verbose:
            tqdm.write(
                f"Epoch {epoch + 1}/{epochs} - "
                f"Train Loss: {epoch_train_loss:.4f}, Train Acc: {epoch_train_acc:.4f}, "
                f"Val Loss: {vl}, Val Acc: {va}, "
                f"Test Loss: {tl:.4f}, Test Acc: {ta:.4f}"
            )

        if checkpoint_dir and checkpoint_every and (epoch + 1) % checkpoint_every == 0:
            from vision_transformers_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_dir, state, step=epoch + 1)

    history["final_state"] = state
    return history
