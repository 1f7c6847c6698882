"""Resumable TPU measurement-queue supervisor.

The round-3 postmortem: the TPU tunnel can stay wedged for hours and can
also come up briefly and wedge again mid-queue. The one-shot watch loop
(tpu_watch.sh) burns its only attempt in that second case. This
supervisor makes the queue idempotent across tunnel windows:

- waits for the tunnel (subprocess probe with a hard timeout — a wedged
  axon backend hangs *initialization*, so the probe must be disposable;
  this parent process NEVER imports jax);
- runs only the steps whose artifact is missing or incomplete, shortest
  first, each timeout-bounded with full output appended to
  benchmarks/logs/<step>.log;
- when a step fails and the tunnel is found dead, goes back to waiting
  instead of burning the remaining steps' timeouts;
- deletes stale smoke-run artifacts (e.g. a SOAK_EPOCHS=1 dry-run file
  would otherwise make the real soak "resume" into a no-op) and backs up
  partial soak artifacts before a retry overwrites them.

Run detached:  nohup python benchmarks/queue_supervisor.py &
State:         benchmarks/logs/queue_state.json (rc per stdout-only step)
Exit 0 when every step's completion predicate holds.
"""

import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LOGS = os.path.join(HERE, "logs")
STATE_PATH = os.path.join(LOGS, "queue_state.json")
DEADLINE_S = int(os.environ.get("QUEUE_DEADLINE_S", 48 * 3600))
PROBE_EVERY_S = 150

_PROBE_CODE = """
import jax
d = jax.devices()
assert d and d[0].platform == "tpu", d
import jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0
"""


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def load_json(name):
    try:
        with open(os.path.join(HERE, name)) as f:
            return json.load(f)
    except Exception:
        return None


def load_state():
    try:
        with open(STATE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def save_state(state):
    os.makedirs(LOGS, exist_ok=True)
    with open(STATE_PATH, "w") as f:
        json.dump(state, f, indent=1)


# --- completion predicates (pure JSON/log reads, no jax) ------------------

def bench_done():
    try:
        with open(os.path.join(LOGS, "bench.log")) as f:
            for line in f:
                if (line.startswith('{"metric"')
                        and '"backend": "tpu"' in line
                        and '"partial"' not in line):
                    return True
    except OSError:
        pass
    return False


def hier_done():
    d = load_json("hier_bench_r04.json")
    return (isinstance(d, list) and len(d) >= 4
            and all("stage_ms" in r for r in d))


def superleaf_done():
    d = load_json("adam_superleaf_r04.json")
    return (isinstance(d, dict) and d.get("backend") == "tpu"
            and "superleaf_ms" in d.get("steps", {}))


def rc_done(step):
    def check():
        return load_state().get(step, {}).get("rc") == 0
    return check


def pack_sweep_done():
    d = load_json("window_pack_sweep_r04.json")
    return (isinstance(d, list) and len(d) >= 4
            and all(isinstance(r, dict) and "stage" in r for r in d))


def detr_phase_done():
    d = load_json("detr_phase_r04.json")
    return (isinstance(d, dict)
            and "train_step" in d.get("measured_ms", {}))


def serving_done():
    d = load_json("serving_bench_r04.json")
    return (isinstance(d, dict) and d.get("backend") == "tpu"
            and len(d.get("buckets", {})) >= 4)


def window_fused_done():
    d = load_json("window_fused_r04.json")
    return (isinstance(d, dict) and d.get("backend") == "tpu"
            and len(d.get("models", {})) >= 3)


def hier_rerun_done():
    d = load_json("hier_bench_r04b.json")
    return (isinstance(d, list) and len(d) >= 4
            and all("stage_ms" in r for r in d))


def pack_bias_done():
    d = load_json("pack_bias_dtype_r04.json")
    return isinstance(d, dict) and d.get("backend") == "tpu"


def distill_done():
    # a full CPU run (insurance during a tunnel outage) is honest evidence
    # but the chip rerun is still preferred — require backend == tpu here;
    # the pre-rerun backup keeps the CPU artifact as .bak
    d = load_json("distill_r04.json")
    return (isinstance(d, dict) and "distillation_delta" in d
            and d.get("teacher_epochs", 0) >= 80
            and d.get("backend") == "tpu")


def distill_stale():
    d = load_json("distill_r04.json")
    return isinstance(d, dict) and d.get("teacher_epochs", 99) < 80


def detr_soak_done():
    d = load_json("detr_convergence_r04.json")
    return (isinstance(d, dict)
            and (d.get("stopped") == "plateau" or d.get("epochs", 0) >= 500))


def hier_flat_done():
    d = load_json("hier_bench_r04c.json")
    return (isinstance(d, list) and len(d) >= 4
            and all("stage_ms" in r for r in d))


def window_fused_flat_done():
    d = load_json("window_fused_flat_r04.json")
    return (isinstance(d, dict) and d.get("backend") == "tpu"
            and len(d.get("models", {})) >= 3)


def hier_routed_done():
    d = load_json("hier_bench_r04d.json")
    return (isinstance(d, list) and len(d) >= 4
            and all("stage_ms" in r for r in d))


def swinv2_restore_done():
    d = load_json("hier_swinv2_r04e.json")
    return (isinstance(d, list) and len(d) >= 1
            and all("stage_ms" in r for r in d))


def detr_residue_done():
    d = load_json("detr_residue_r04.json")
    return (isinstance(d, dict) and d.get("backend") == "tpu"
            and "matcher_ms" in d)


def swinv2_ablation_done():
    d = load_json("swinv2_fused_ablation_r04.json")
    return (isinstance(d, dict)
            and all("swinv2t_224" in d.get(k, {}) for k in ("fused", "pack")))


def distill_noise_done():
    d = load_json("distill_noise_r04.json")
    return (isinstance(d, dict) and "distillation_delta" in d
            and d.get("backend") == "tpu")


def zoo_done():
    d = load_json("convergence_zoo_r04.json")
    return (isinstance(d, dict)
            and d.get("recipe", {}).get("epochs", 0) >= 100
            and len(d.get("runs", {})) >= 7)


def zoo_stale():
    d = load_json("convergence_zoo_r04.json")
    return (isinstance(d, dict)
            and d.get("recipe", {}).get("epochs", 99) < 100)


PY = sys.executable
# (name, argv, timeout_s, env, done_fn, stale_artifact|None, backup|None)
STEPS = [
    ("bench", [PY, "bench.py"], 900,
     {"BENCH_ATTEMPT_TIMEOUT": "420", "BENCH_TOTAL_BUDGET": "850"},
     bench_done, None, None),
    ("hier_stages", [PY, "benchmarks/hier_bench.py", "--stages"], 2400,
     {}, hier_done, None, None),
    ("adam_superleaf", [PY, "benchmarks/adam_superleaf.py"], 1200,
     {}, superleaf_done, None, None),
    ("layout_ablation", [PY, "benchmarks/swin_layout_ablation.py"], 1200,
     {}, rc_done("layout_ablation"), None, None),
    ("swin_residue", [PY, "benchmarks/swin_residue.py"], 1800,
     {}, rc_done("swin_residue"), None, None),
    ("pack_sweep", [PY, "benchmarks/window_pack_sweep.py"], 1800,
     {}, pack_sweep_done, None, None),
    ("detr_phase", [PY, "benchmarks/detr_phase.py"], 1800,
     {}, detr_phase_done, None, None),
    ("kernel_valid", [PY, "benchmarks/kernel_validation.py"], 1800,
     {}, rc_done("kernel_valid"), None, None),
    ("pack_bias_dtype", [PY, "benchmarks/pack_bias_dtype.py"], 900,
     {}, pack_bias_done, None, None),
    ("serving", [PY, "benchmarks/serving_bench.py"], 1200,
     {}, serving_done, None, None),
    ("window_fused", [PY, "benchmarks/window_fused_bench.py"], 1800,
     {}, window_fused_done, None, None),
    # re-measure hierarchical per-stage MFU on the post-fused-kernel code
    # (hier_bench_r04.json predates both the periodic-bias pack fix and
    # the fused window kernel)
    ("hier_rerun", [PY, "benchmarks/hier_bench.py", "--stages"], 2400,
     {"HIER_OUT": "hier_bench_r04b.json"}, hier_rerun_done, None, None),
    # soak order: distill (short) -> zoo (7 never-measured families,
    # VERDICT #6) -> detr last: it already has r2 evidence (mAP 0.239)
    # and its chunked writer keeps partial progress if the round ends
    ("distill_soak", [PY, "benchmarks/distill_soak.py"], 7200,
     {}, distill_done, distill_stale, "distill_r04.json"),
    ("zoo_soak", [PY, "benchmarks/convergence_zoo_r04.py"], 14400,
     {}, zoo_done, zoo_stale, "convergence_zoo_r04.json"),
    # post-flat-kernel remeasure (hier_bench_r04b/window_fused_r04 predate
    # the flat fused variant that covers Swin-T stages 2-4) — short steps
    # run before the multi-hour soaks so a tunnel wedge costs the least
    ("hier_flat", [PY, "benchmarks/hier_bench.py", "--stages"], 2400,
     {"HIER_OUT": "hier_bench_r04c.json"}, hier_flat_done, None, None),
    ("window_fused_flat", [PY, "benchmarks/window_fused_bench.py"], 1800,
     {"FUSED_OUT": "window_fused_flat_r04.json"},
     window_fused_flat_done, None, None),
    # SwinV2-T regressed 48.5->66.5 ms when the fused kernel landed
    # (stages 2-3 doubled); per-stage fused-vs-pack receipts decide the
    # routing fix in ops/windows.py
    ("swinv2_ablation", [PY, "benchmarks/swinv2_fused_ablation.py"], 1800,
     {}, swinv2_ablation_done, None, None),
    # post-routing-fix remeasure: SwinV2 cosine now defaults to the pack
    # path (ops/windows.py routing receipts) — hier_bench_r04d should show
    # SwinV2-T back to ~48 ms while Swin-T keeps its fused-kernel 30 ms
    ("hier_routed", [PY, "benchmarks/hier_bench.py", "--stages"], 2400,
     {"HIER_OUT": "hier_bench_r04d.json"}, hier_routed_done, None, None),
    # the pack-path cosine relayout regression (stages 2-3, ablation
    # 48.5 -> 53.3 ms) was restored to the 6-D stack form in
    # ops/windows.py; targeted SwinV2-only remeasure
    ("swinv2_restore",
     [PY, "benchmarks/hier_bench.py", "--stages",
      "--models", "swinv2t_224"], 900,
     {"HIER_OUT": "hier_swinv2_r04e.json"}, swinv2_restore_done, None, None),
    # scan-based DETR phase split (detr_phase's standalone numbers summed
    # to 2.6x the whole forward — measurement, not device time)
    ("detr_residue", [PY, "benchmarks/detr_residue.py"], 2400,
     {}, detr_residue_done, None, None),
    # label-noise distillation regime: the first soak's task saturated the
    # control (distill_r04.json deltas ~0); this one shows the actual win
    ("distill_noise", [PY, "benchmarks/distill_noise_soak.py"], 7200,
     {}, distill_noise_done, None, "distill_noise_r04.json"),
    ("detr_soak", [PY, "benchmarks/detr_convergence.py"], 10800,
     {}, detr_soak_done, None, "detr_convergence_r04.json"),
]


def probe(timeout=120):
    try:
        r = subprocess.run([PY, "-c", _PROBE_CODE], timeout=timeout,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_step(name, argv, timeout_s, extra_env):
    env = dict(os.environ)
    env.update(extra_env)
    logf = os.path.join(LOGS, f"{name}.log")
    with open(logf, "a") as out:
        out.write(f"\n=== run {time.strftime('%H:%M:%S')} ===\n")
        out.flush()
        try:
            r = subprocess.run(argv, cwd=REPO, env=env, timeout=timeout_s,
                               stdout=out, stderr=subprocess.STDOUT)
            return r.returncode
        except subprocess.TimeoutExpired:
            out.write(f"=== TIMEOUT after {timeout_s}s ===\n")
            return -1


MAX_ATTEMPTS = int(os.environ.get("QUEUE_MAX_ATTEMPTS", 3))


def main():
    os.makedirs(LOGS, exist_ok=True)
    start = time.monotonic()
    log(f"queue supervisor start; {len(STEPS)} steps, "
        f"deadline {DEADLINE_S}s")
    while True:
        attempts = {k: v.get("attempts", 0)
                    for k, v in load_state().items()}
        pending = [s for s in STEPS if not s[4]()]
        if not pending:
            log("all steps complete")
            return 0
        # a step that keeps failing with the tunnel up must not hot-loop
        runnable = [s for s in pending
                    if attempts.get(s[0], 0) < MAX_ATTEMPTS]
        if not runnable:
            log(f"all pending steps exhausted {MAX_ATTEMPTS} attempts: "
                f"{[s[0] for s in pending]}")
            return 1
        if time.monotonic() - start > DEADLINE_S:
            log(f"deadline; incomplete: {[s[0] for s in pending]}")
            return 1
        if not probe():
            log(f"tpu down; pending: {[s[0] for s in pending]}")
            time.sleep(PROBE_EVERY_S)
            continue
        log(f"tpu UP — running {len(runnable)} pending steps")
        for name, argv, tmo, env, done, stale, backup in runnable:
            art = os.path.join(HERE, backup) if backup else None
            if stale and stale() and art and os.path.exists(art):
                log(f"{name}: deleting stale smoke artifact")
                os.remove(art)
            elif art and os.path.exists(art):
                shutil.copy(art, art + ".bak")  # keep partial progress
            log(f"{name}: start (timeout {tmo}s)")
            rc = run_step(name, argv, tmo, env)
            state = load_state()
            prior_attempts = state.get(name, {}).get("attempts", 0)
            state[name] = {"rc": rc, "ts": time.strftime("%H:%M:%S"),
                           "attempts": prior_attempts}
            save_state(state)  # rc first: rc_done() reads it
            ok = done()
            tunnel_up = ok or probe()
            if not ok and tunnel_up:
                # only a failure with a LIVE tunnel is a real attempt —
                # wedge-induced timeouts must not exhaust the retry budget
                state[name]["attempts"] = prior_attempts + 1
                save_state(state)
            log(f"{name}: rc={rc} done={ok}")
            if not ok and not tunnel_up:
                log("tunnel died mid-queue; back to waiting")
                break


if __name__ == "__main__":
    sys.exit(main())
