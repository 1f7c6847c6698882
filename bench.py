"""Headline benchmark: ViT-B/16 @224 images/sec/chip (BASELINE.json metric).

Prints JSON lines {"metric", "value", "unit", "vs_baseline", ...}; the LAST
line is the most complete measurement (the driver parses the last parseable
line). ``vs_baseline`` is measured throughput / target, where target = 95% of
the single-chip bf16 roofline (the driver-defined north star; the PyTorch
reference publishes no throughput numbers at all — BASELINE.md).

Wedge-proofing (round 4): the axon TPU tunnel can wedge so hard that backend
*initialization* hangs in C (r3: `jax.default_backend()` hung >1h and zeroed
the round's artifact). So this file is a supervisor that NEVER imports jax
in the parent process:

  1. run the measurement in a child (`bench.py --inner`) with a hard
     per-attempt timeout, streaming its stdout live (the child prints the
     inference-only JSON line the moment it is measured, before the train
     section, so a mid-run wedge still leaves a parseable artifact);
  2. if the first TPU attempt fails, immediately emit a CPU-backend
     fallback line (honestly labeled ``"backend": "cpu"``) so the artifact
     can never be empty;
  3. keep retrying the TPU child on a bounded budget — a successful TPU
     line printed later supersedes the fallback.

Roofline model: ViT-B/16 @224 forward ≈ 35.1 GFLOP/image (mult+add
convention) — per layer 2S·D·3D (QKV) + 4S²·D (attention) + 2S·D² (out) +
4S·D·4D (MLP) with S=197, D=768, L=12, plus the patch projection. TPU v5e
peak ≈ 197 TFLOP/s bf16.
"""

import json
import os
import subprocess
import sys
import time


def vit_b16_flops_per_image(s=197, d=768, mlp=3072, layers=12, patches=196):
    per_layer = (
        2 * s * d * (3 * d)      # QKV projection
        + 4 * s * s * d          # QK^T and PV
        + 2 * s * d * d          # out projection
        + 2 * 2 * s * d * mlp    # MLP fc1+fc2
    )
    patch_proj = 2 * patches * (16 * 16 * 3) * d
    return layers * per_layer + patch_proj


V5E_PEAK_FLOPS = 197e12  # bf16


def _result_line(images_per_sec, batch, backend, train_ips=None,
                 train_mfu=None, partial=False):
    flops = vit_b16_flops_per_image()
    target = 0.95 * V5E_PEAK_FLOPS / flops
    mfu = images_per_sec * flops / V5E_PEAK_FLOPS
    rec = {
        "metric": "vit_b16_224_bf16_infer",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / target, 4),
        "mfu": round(mfu, 4),
        "train_images_per_sec": None if train_ips is None else round(train_ips, 1),
        "train_mfu": None if train_mfu is None else round(train_mfu, 4),
        "batch": batch,
        "backend": backend,
    }
    if partial:
        rec["partial"] = True
    return json.dumps(rec)


def inner_main():
    """The actual measurement. Runs in a child process (may hang if the
    tunnel is wedged — the supervisor enforces the timeout)."""
    import jax

    # The axon TPU plugin ignores the JAX_PLATFORMS env var; only the config
    # knob reliably pins CPU (tests/conftest.py). Honor the supervisor's
    # fallback request before any backend initialization.
    if os.environ.get("BENCH_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.utils.args import get_args

    on_tpu = jax.default_backend() == "tpu"
    args = get_args("vitb16_224_imagenet")
    model = ViT(**args, dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    batch = 256 if on_tpu else 8
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 224, 224, 3), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1],
    )

    # NOTE axon tunnel: block_until_ready does NOT synchronize; only a host
    # transfer does. Queue all iterations (device executes in order), then
    # force one scalar back to the host to time the whole run.
    #
    # Scoped-VMEM compiler option: raising the 16 MB default lets XLA pick
    # larger fusion tiles around the Pallas calls. Measured sweep (r3):
    # fwd best at 32 MB (61.3 -> 60.9 ms; 64 MB regresses to 62.6), train
    # step best at 64 MB (153.1 -> 148.3 ms).
    fwd_opts = {"xla_tpu_scoped_vmem_limit_kib": "32768"} if on_tpu else None
    train_opts = {"xla_tpu_scoped_vmem_limit_kib": "65536"} if on_tpu else None

    fwd = jax.jit(
        lambda v, x: jnp.sum(model.apply(v, x).astype(jnp.float32)))
    if fwd_opts is not None:
        fwd = fwd.lower(variables, x).compile(compiler_options=fwd_opts)
    float(fwd(variables, x))  # compile + warm

    n_iters = 20 if on_tpu else 2
    t0 = time.perf_counter()
    s = None
    for _ in range(n_iters):
        s = fwd(variables, x)
    float(s)  # one sync for the whole queued chain
    dt = time.perf_counter() - t0
    images_per_sec = batch * n_iters / dt
    backend = jax.default_backend()

    # Emit the inference result NOW — if the tunnel wedges during the train
    # section the round still has a parseable artifact.
    print(_result_line(images_per_sec, batch, backend, partial=True),
          flush=True)

    # training step throughput (fwd+bwd+Adam ≈ 3× fwd FLOPs)
    train_ips = train_mfu = None
    if on_tpu:
        from vision_transformers_tpu.training.trainer import (
            make_train_state, train_step_fn,
        )

        tb = 192  # measured sweep: 128/192/256 -> 64.1/67.1/66.7% MFU
        xt = x[:tb]
        labels = jnp.zeros((tb,), jnp.int32)
        w = jnp.ones((tb,), jnp.float32)
        state = make_train_state(model, jax.random.PRNGKey(0), xt[:1], lr=1e-3)
        rng = jax.random.PRNGKey(1)
        step = jax.jit(train_step_fn(model), donate_argnums=0)
        if train_opts is not None:
            step = step.lower(state, xt, labels, w, rng).compile(
                compiler_options=train_opts)
        state, l, _, _ = step(state, xt, labels, w, rng)
        float(l)
        t0 = time.perf_counter()
        for _ in range(10):
            state, l, _, _ = step(state, xt, labels, w, rng)
        float(l)
        flops = vit_b16_flops_per_image()
        train_ips = tb * 10 / (time.perf_counter() - t0)
        train_mfu = train_ips * 3 * flops / V5E_PEAK_FLOPS

    print(_result_line(images_per_sec, batch, backend,
                       train_ips=train_ips, train_mfu=train_mfu), flush=True)


_CURRENT_CHILD = None


def _kill_child_and_exit(signum, frame):
    # `timeout`-style TERM must not orphan a hung inner process — a wedged
    # child would keep the tunnel connection open.
    if _CURRENT_CHILD is not None and _CURRENT_CHILD.poll() is None:
        _CURRENT_CHILD.kill()
    sys.exit(128 + signum)


def _run_attempt(timeout, extra_env=None):
    """Run `bench.py --inner` streaming stdout live; kill on timeout.

    Returns (rc, saw_json_line). rc is None if killed on timeout.
    """
    global _CURRENT_CHILD
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--inner"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    _CURRENT_CHILD = proc
    deadline = time.monotonic() + timeout
    saw_json = False
    import selectors
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    buf = ""
    while True:
        budget = deadline - time.monotonic()
        if budget <= 0:
            proc.kill()
            proc.wait()
            sys.stderr.write("[bench supervisor] attempt timed out\n")
            return None, saw_json
        events = sel.select(timeout=min(budget, 5.0))
        if events:
            chunk = os.read(proc.stdout.fileno(), 65536).decode(
                "utf-8", "replace")
            if chunk:
                buf += chunk
                while "\n" in buf:
                    line, buf = buf.split("\n", 1)
                    if line.startswith('{"metric"'):
                        print(line, flush=True)
                        saw_json = True
                    else:
                        sys.stderr.write(line + "\n")
            elif proc.poll() is not None:
                return proc.returncode, saw_json
        elif proc.poll() is not None:
            return proc.returncode, saw_json


def supervise():
    # Per-attempt cap: compile (~40 s) + measure is normally <4 min; a
    # wedged tunnel hangs forever, so cap generously at 8 min.
    ATTEMPT_TIMEOUT = int(os.environ.get("BENCH_ATTEMPT_TIMEOUT", 480))
    # Keep retrying for up to ~40 min total — if the driver's own window is
    # shorter, the early partial/fallback lines are already on stdout.
    TOTAL_BUDGET = int(os.environ.get("BENCH_TOTAL_BUDGET", 2400))
    start = time.monotonic()

    rc, saw = _run_attempt(ATTEMPT_TIMEOUT)
    if rc == 0 and saw:
        return

    # First attempt failed → guarantee a parseable artifact right away with
    # an honestly-labeled CPU fallback run, then keep trying the TPU.
    sys.stderr.write("[bench supervisor] TPU attempt failed; "
                     "emitting CPU fallback line\n")
    _run_attempt(600, extra_env={"BENCH_FORCE_CPU": "1"})

    attempt = 1
    while time.monotonic() - start < TOTAL_BUDGET:
        time.sleep(60)
        attempt += 1
        remaining = TOTAL_BUDGET - (time.monotonic() - start)
        if remaining < 120:
            break
        sys.stderr.write(f"[bench supervisor] TPU retry #{attempt}\n")
        rc, saw = _run_attempt(min(ATTEMPT_TIMEOUT, remaining))
        if rc == 0 and saw:
            return
    sys.stderr.write("[bench supervisor] TPU never recovered within budget; "
                     "CPU fallback line stands\n")


if __name__ == "__main__":
    if "--inner" in sys.argv:
        inner_main()
    else:
        import signal

        signal.signal(signal.SIGTERM, _kill_child_and_exit)
        signal.signal(signal.SIGINT, _kill_child_and_exit)
        supervise()
