"""Device-resident training: whole dataset in HBM, augmentation in the step.

For CIFAR-scale datasets (50k×32×32×3 uint8 ≈ 150 MB of the 16 GB HBM) the
TPU-first design keeps the entire dataset on device and runs shuffling,
augmentation (random crop + hflip + brightness jitter — the reference's
recipe, load_data.py:52) and the train step inside ONE jitted epoch program:
a lax.scan over steps with gather-based batching. Host↔device traffic per
epoch drops to a PRNG key; on tunneled hosts (36 MB/s H2D here) this is the
difference between transfer-bound and compute-bound training.

``fit_on_device`` mirrors ``trainer.fit``'s metrics-dict contract.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.training.trainer import (
    TrainState,
    cross_entropy_with_weights,
    make_train_state,
)


def augment_batch_on_device(images: jax.Array, rng: jax.Array,
                            pad: int = 4, flip_p: float = 0.5,
                            brightness: float = 63 / 255) -> jax.Array:
    """Vectorized crop(pad)+hflip+brightness on a uint8 NHWC batch (VPU)."""
    b, h, w, c = images.shape
    r_crop, r_flip, r_bright = jax.random.split(rng, 3)

    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ys = jax.random.randint(r_crop, (b, 1), 0, 2 * pad + 1)
    xs = jax.random.randint(jax.random.fold_in(r_crop, 1), (b, 1), 0,
                            2 * pad + 1)
    rows = ys + jnp.arange(h)[None, :]          # (B, H)
    cols = xs + jnp.arange(w)[None, :]          # (B, W)
    # two chained gathers: rows then cols
    g = jnp.take_along_axis(padded, rows[:, :, None, None], axis=1)
    g = g[:, :, : w + 2 * pad]
    out = jnp.take_along_axis(g, cols[:, None, :, None], axis=2)

    flip = jax.random.bernoulli(r_flip, flip_p, (b, 1, 1, 1))
    out = jnp.where(flip, out[:, :, ::-1, :], out)

    f = jax.random.uniform(r_bright, (b, 1, 1, 1),
                           minval=1 - brightness, maxval=1 + brightness)
    out = jnp.clip(out.astype(jnp.float32) * f, 0, 255)
    return out  # float32 [0,255]; normalization happens next in the step


def _normalize(x, normalize):
    x = x.astype(jnp.float32) / 255.0
    if normalize is not None:
        mean, std = normalize
        x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x


def fit_on_device(
    model,
    train_data: Tuple[np.ndarray, np.ndarray],
    test_data: Tuple[np.ndarray, np.ndarray],
    epochs: int,
    val_data: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    *,
    batch_size: int = 256,
    normalize=None,
    augment: bool = True,
    lr: float = 1e-4,
    optimizer: str = "adam",
    seed: int = 0,
    state: Optional[TrainState] = None,
    verbose: bool = True,
    **opt_kwargs,
):
    """Train with the full dataset device-resident; one dispatch per
    epoch/eval. Returns the reference-parity metrics dict."""
    tx_rng = jax.random.PRNGKey(seed)

    def put(d):
        x, y = d
        return (jax.device_put(np.ascontiguousarray(x)),
                jax.device_put(np.asarray(y, np.int32)))

    train_x, train_y = put(train_data)
    test_x, test_y = put(test_data)
    val = put(val_data) if val_data is not None else None

    n_train = train_x.shape[0]
    steps = n_train // batch_size  # drop ragged tail within the epoch perm

    if state is None:
        state = make_train_state(
            model, tx_rng, jnp.zeros((1,) + train_x.shape[1:], jnp.float32),
            lr=lr, optimizer=optimizer, **opt_kwargs)

    def train_epoch(state, rng):
        perm = jax.random.permutation(jax.random.fold_in(rng, 0), n_train)

        def body(state, i):
            idx = jax.lax.dynamic_slice(perm, (i * batch_size,), (batch_size,))
            imgs = jnp.take(train_x, idx, axis=0)
            labels = jnp.take(train_y, idx, axis=0)
            if augment:
                imgs = augment_batch_on_device(
                    imgs, jax.random.fold_in(rng, i + 1))
            x = _normalize(imgs, normalize)
            drop_rng = jax.random.fold_in(rng, 2_000_000 + i)

            def loss_fn(params):
                logits = model.apply(
                    {"params": params}, x,
                    deterministic=False, rngs={"dropout": drop_rng})
                w = jnp.ones((batch_size,), jnp.float32)
                return cross_entropy_with_weights(logits, labels, w), logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            correct = jnp.sum(jnp.argmax(logits, -1) == labels)
            return state, (loss * batch_size, correct)

        state, (ls, cs) = jax.lax.scan(
            body, state, jnp.arange(steps))
        total = jnp.float32(steps * batch_size)
        return state, jnp.sum(ls) / total, jnp.sum(cs) / total

    def eval_pass(params, xs, ys):
        n = xs.shape[0]
        n_steps = -(-n // batch_size)
        pad_n = n_steps * batch_size

        def body(_, i):
            idx = jnp.clip(i * batch_size + jnp.arange(batch_size), 0, n - 1)
            valid = (i * batch_size + jnp.arange(batch_size)) < n
            x = _normalize(jnp.take(xs, idx, axis=0), normalize)
            labels = jnp.take(ys, idx, axis=0)
            logits = model.apply({"params": params}, x)
            w = valid.astype(jnp.float32)
            loss = cross_entropy_with_weights(logits, labels, w)
            correct = jnp.sum((jnp.argmax(logits, -1) == labels) * w)
            return 0, (loss * jnp.sum(w), correct, jnp.sum(w))

        _, (ls, cs, ns) = jax.lax.scan(body, 0, jnp.arange(n_steps))
        total = jnp.maximum(jnp.sum(ns), 1.0)
        return jnp.sum(ls) / total, jnp.sum(cs) / total

    train_epoch = jax.jit(train_epoch, donate_argnums=0)
    eval_pass = jax.jit(eval_pass)

    history = {
        "train_loss": [], "val_loss": [] if val is not None else None,
        "test_loss": [],
        "train_accuracy": [], "val_accuracy": [] if val is not None else None,
        "test_accuracy": [],
    }
    import time as _time

    for epoch in range(epochs):
        _t0 = _time.perf_counter()
        rng = jax.random.fold_in(tx_rng, 10_000 + epoch)
        state, tl, ta = train_epoch(state, rng)
        history["train_loss"].append(float(tl))
        history["train_accuracy"].append(float(ta))
        if val is not None:
            vl, va = eval_pass(state.params, *val)
            history["val_loss"].append(float(vl))
            history["val_accuracy"].append(float(va))
        el, ea = eval_pass(state.params, test_x, test_y)
        history["test_loss"].append(float(el))
        history["test_accuracy"].append(float(ea))
        if verbose:
            print(
                f"Epoch {epoch + 1}/{epochs} - "
                f"Train Loss: {history['train_loss'][-1]:.4f}, "
                f"Train Acc: {history['train_accuracy'][-1]:.4f}, "
                f"Test Loss: {history['test_loss'][-1]:.4f}, "
                f"Test Acc: {history['test_accuracy'][-1]:.4f} "
                f"[{_time.perf_counter() - _t0:.2f}s]")

    history["final_state"] = state
    return history
