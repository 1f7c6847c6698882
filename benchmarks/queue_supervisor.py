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


def _tpu_dict(name, *keys):
    def check():
        d = load_json(name)
        return (isinstance(d, dict) and d.get("backend") == "tpu"
                and all(k in d for k in keys))
    return check


def kernel_valid_done():
    d = load_json("kernel_validation_results.json")
    # must include the r5 split-dropout cases AND all pass
    return (isinstance(d, dict) and d.get("all_ok") is True
            and any("split_dropout" in r.get("name", "")
                    for r in d.get("results", [])))


def dropkernel_done():
    d = load_json("detr_train_residue_r05_dropkernel.json")
    # "terms" only lands after the full differencing sweep; the early
    # partial write (full/no_dropout only) must not count as complete
    return (isinstance(d, dict) and d.get("backend") == "tpu"
            and "terms" in d)


def window_variant_done():
    d = load_json("window_variant_sweep_r05.json")
    return (isinstance(d, list) and len(d) >= 8
            and all(isinstance(r, dict) for r in d)
            and any(r.get("stage") == "full_model" for r in d))


def int8_done():
    d = load_json("int8_receipts_r05.json")
    return (isinstance(d, dict) and d.get("backend") == "tpu"
            and "per_op" in d and "trained_accuracy" in d)


def vit_train_residue_done():
    d = load_json("vit_train_residue_r05.json")
    return (isinstance(d, dict) and d.get("backend") == "tpu"
            and "train_step" in d and len(d.get("stages", {})) >= 4)


def int8_v2_done():
    # v2: per-op timings must be scan-chained (the v1 single-dispatch
    # table measured ~1 ms tunnel dispatch, not compute)
    d = load_json("int8_receipts_r05.json")
    return (isinstance(d, dict) and d.get("backend") == "tpu"
            and str(d.get("per_op_methodology", "")).startswith("scan_chain")
            and "trained_accuracy" in d)


def vit_train_residue_v2_done():
    # v2: grads_only must reduce over every grad leaf (the first artifact
    # let XLA DCE unmeasured wgrads -> implied bwd MFU > 100%)
    d = load_json("vit_train_residue_r05.json")
    return (isinstance(d, dict) and d.get("backend") == "tpu"
            and d.get("train_step", {}).get("grads_all_leaves") is True)


def hier_train_done():
    d = load_json("hier_train_r05.json")
    return (isinstance(d, list) and len(d) >= 5
            and all("train_ms" in r for r in d))


def distill_collapse_done():
    d = load_json("distill_collapse_diag.json")
    return isinstance(d, dict) and len(d.get("arms", {})) >= 3


def distill_noise_done():
    d = load_json("distill_noise_r05.json")
    return (isinstance(d, dict) and "distillation_delta" in d
            and d.get("backend") == "tpu")


def zoo_cal_done():
    d = load_json("zoo_calibration.json")
    # at least one candidate setting landed in the discriminative band
    def band(v):
        return isinstance(v, dict) and any(
            isinstance(m, dict) and 0.3 <= m.get("final_test_acc", 9) <= 0.85
            for m in v.values())
    return isinstance(d, dict) and any(band(v) for v in d.values())


def zoo_v2_done():
    d = load_json("convergence_zoo_r05.json")
    return (isinstance(d, dict)
            and d.get("recipe", {}).get("epochs", 0) >= 100
            and len(d.get("runs", {})) >= 9)


def detr_soak_done():
    d = load_json("detr_convergence_r05.json")
    return (isinstance(d, dict)
            and (d.get("stopped") == "plateau" or d.get("epochs", 0) >= 500))


PY = sys.executable
# (name, argv, timeout_s, env, done_fn, stale_artifact|None, backup|None)
# r5 queue (VERDICT r4 "Next round" items). Short receipts first so a
# tunnel wedge costs the least; multi-hour soaks last. The DETR soak
# resumes from its msgpack checkpoint, so even a timeout keeps progress.
STEPS = [
    ("kernel_valid_r05", [PY, "benchmarks/kernel_validation.py"], 2400,
     {}, kernel_valid_done, None, None),
    ("detr_dropkernel",
     [PY, "benchmarks/detr_train_residue.py"], 2400,
     {"DETR_RESIDUE_OUT": "detr_train_residue_r05_dropkernel.json"},
     dropkernel_done, None, None),
    ("window_variant", [PY, "benchmarks/window_variant_sweep.py"], 2400,
     {}, window_variant_done, None, None),
    ("vit_train_residue", [PY, "benchmarks/vit_train_residue.py"], 2400,
     {}, vit_train_residue_done, None, None),
    ("int8_receipts", [PY, "benchmarks/int8_receipts.py"], 3600,
     {}, int8_done, None, None),
    ("hier_train",
     [PY, "benchmarks/hier_bench.py", "--train", "--models",
      "swint_224,swinv2t_224,pvt_tiny224,twins_svts224,vitl16_224"],
     3600, {"HIER_OUT": "hier_train_r05.json"}, hier_train_done,
     None, None),
    ("distill_collapse", [PY, "benchmarks/distill_collapse_diag.py"], 5400,
     {}, distill_collapse_done, None, "distill_collapse_diag.json"),
    ("distill_noise", [PY, "benchmarks/distill_noise_soak.py"], 7200,
     {"DISTILL_NOISE_OUT": "benchmarks/distill_noise_r05.json"},
     distill_noise_done, None, "distill_noise_r05.json"),
    ("detr_soak", [PY, "benchmarks/detr_convergence.py"], 10800,
     {}, detr_soak_done, None, "detr_convergence_r05.json"),
    # short receipts before the multi-hour zoo ladder+soak
    ("window_inkernel",
     [PY, "benchmarks/window_inkernel_ablation.py"], 2400, {},
     _tpu_dict("window_inkernel_ablation_r05.json", "stages",
               "hbm_floor_ms"), None, None),
    ("vit_train_residue_v2", [PY, "benchmarks/vit_train_residue.py"], 2400,
     {}, vit_train_residue_v2_done, None, None),
    ("int8_receipts_v2",
     [PY, "benchmarks/int8_receipts.py"], 3600,
     {"INT8_SKIP_TRAIN": "1"}, int8_v2_done, None,
     "int8_receipts_r05.json"),
    ("zoo_calibrate", [PY, "benchmarks/zoo_calibrate.py"], 7200,
     {}, zoo_cal_done, None, "zoo_calibration.json"),
    # full 10-model soak on the calibrated task: zoo_calibrate chains it
    # in its own window when it finds the band; this step finishes it
    # (resumable) if that window's timeout cut the soak short
    ("zoo_v2", [PY, "benchmarks/convergence_zoo_r05.py"], 10800,
     {}, zoo_v2_done, None, None),
]

def probe(timeout=360):
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
