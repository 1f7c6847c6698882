"""Same-weights optimizer-TRAJECTORY parity vs the torch reference math.

The reference's only published results are end-of-training CIFAR-100
accuracies from runs we cannot reproduce here (no dataset in the image —
BASELINE.md). The strongest convergence evidence available without data is
trajectory equivalence: start both frameworks from IDENTICAL weights, feed
IDENTICAL batches, take N full optimizer steps each, and require the loss
curves and final logits to agree in fp32. Any systematic divergence in
forward math, gradients, CE loss, or the update rule shows up within a few
steps; agreement over N steps bounds the per-step error at fp32 noise.

Reference math assembled in-test: vanilla_vit.py:109-215 forward +
CrossEntropyLoss + the per-step update of the reference loop
(vanilla_vit.py:237-239).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from test_torch_model_parity import TorchViT, vit_params_from_torch  # noqa: E402


def _make_batches(n_steps, batch, img, classes, seed=0):
    rng = np.random.RandomState(seed)
    xs = rng.randn(n_steps, batch, 3, img, img).astype(np.float32)
    ys = rng.randint(0, classes, (n_steps, batch)).astype(np.int64)
    return xs, ys


def _torch_trajectory(tm, xs, ys, lr, momentum=0.0):
    opt = torch.optim.SGD(tm.parameters(), lr=lr, momentum=momentum)
    crit = torch.nn.CrossEntropyLoss()
    losses = []
    for x, y in zip(xs, ys):
        opt.zero_grad()
        loss = crit(tm(torch.tensor(x)), torch.tensor(y))
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses


def _jax_trajectory(model, params, xs, ys, lr, momentum=0.0):
    def loss_fn(p, x, y):
        logits = model.apply({"params": p}, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(y.shape[0]), y])

    @jax.jit
    def step(p, mom, x, y):
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        if momentum:
            mom = jax.tree_util.tree_map(
                lambda m, gi: momentum * m + gi, mom, g)
            upd = mom
        else:
            upd = g
        p = jax.tree_util.tree_map(lambda pi, u: pi - lr * u, p, upd)
        return p, mom, loss

    mom = jax.tree_util.tree_map(jnp.zeros_like, params)
    losses = []
    for x, y in zip(xs, ys):
        params, mom, loss = step(
            params, mom,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y))
        losses.append(float(loss))
    return params, losses


def test_sgd_trajectory_matches_torch():
    img, patch, layers, heads, dim, mlp, classes = 32, 8, 2, 4, 64, 128, 10
    n_steps, batch, lr = 12, 16, 0.05

    from vision_transformers_tpu.models.image_classification import ViT

    torch.manual_seed(0)
    tm = TorchViT(img, patch, layers, heads, dim, mlp, classes)
    params = vit_params_from_torch(tm, dim)
    model = ViT(image_size=img, patch_size=patch, num_layers=layers,
                num_heads=heads, hidden_dim=dim, mlp_dim=mlp,
                num_classes=classes)

    xs, ys = _make_batches(n_steps, batch, img, classes)
    ref_losses = _torch_trajectory(tm, xs, ys, lr)
    params, losses = _jax_trajectory(model, params, xs, ys, lr)

    # per-step losses track within fp32 accumulation noise
    np.testing.assert_allclose(losses, ref_losses, rtol=5e-4, atol=5e-4)

    # after 12 full steps, held-out logits still agree
    x_hold = np.random.RandomState(99).randn(4, 3, img, img).astype(np.float32)
    tm.eval()
    with torch.no_grad():
        ref_logits = tm(torch.tensor(x_hold)).numpy()
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x_hold.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref_logits, rtol=2e-3, atol=2e-3)


def test_adam_trajectory_matches_torch():
    """Adam(lr=1e-4) is the optimizer of every reference train loop
    (base.py:35, vanilla_vit.py:221) — trajectory-match it through our
    actual optimizer factory (training/optimizers.py)."""
    import optax

    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.training.optimizers import make_optimizer

    img, patch, layers, heads, dim, mlp, classes = 32, 8, 1, 2, 32, 64, 10
    n_steps, batch, lr = 10, 8, 1e-2  # higher lr than 1e-4 to move weights

    torch.manual_seed(2)
    tm = TorchViT(img, patch, layers, heads, dim, mlp, classes)
    params = vit_params_from_torch(tm, dim)
    model = ViT(image_size=img, patch_size=patch, num_layers=layers,
                num_heads=heads, hidden_dim=dim, mlp_dim=mlp,
                num_classes=classes)
    xs, ys = _make_batches(n_steps, batch, img, classes, seed=11)

    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    crit = torch.nn.CrossEntropyLoss()
    ref_losses = []
    for x, y in zip(xs, ys):
        opt.zero_grad()
        loss = crit(tm(torch.tensor(x)), torch.tensor(y))
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    tx = make_optimizer("adam", lr)
    opt_state = tx.init(params)

    def loss_fn(p, x, y):
        logits = model.apply({"params": p}, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(y.shape[0]), y])

    @jax.jit
    def step(p, s, x, y):
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for x, y in zip(xs, ys):
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y))
        losses.append(float(loss))

    np.testing.assert_allclose(losses, ref_losses, rtol=5e-4, atol=5e-4)


def test_sgd_momentum_trajectory_matches_torch():
    """The reference HPO searches SGD among its optimizers
    (utils/optimization.py:26-33); check the momentum update rule too."""
    img, patch, layers, heads, dim, mlp, classes = 32, 8, 1, 2, 32, 64, 10
    n_steps, batch, lr, mu = 8, 8, 0.05, 0.9

    from vision_transformers_tpu.models.image_classification import ViT

    torch.manual_seed(1)
    tm = TorchViT(img, patch, layers, heads, dim, mlp, classes)
    params = vit_params_from_torch(tm, dim)
    model = ViT(image_size=img, patch_size=patch, num_layers=layers,
                num_heads=heads, hidden_dim=dim, mlp_dim=mlp,
                num_classes=classes)

    xs, ys = _make_batches(n_steps, batch, img, classes, seed=7)
    ref_losses = _torch_trajectory(tm, xs, ys, lr, momentum=mu)
    _, losses = _jax_trajectory(model, params, xs, ys, lr, momentum=mu)
    np.testing.assert_allclose(losses, ref_losses, rtol=5e-4, atol=5e-4)
