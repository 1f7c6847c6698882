"""Worker for tests/test_multihost.py: one rank of a 2-process CPU cluster.

Exercises every ``jax.process_count()``-gated code path at world_size > 1
(they are otherwise only ever tested at world=1): shard_for_process,
reduce_dict, SmoothedValue.synchronize_between_processes, all_gather_objects,
save_on_master, and a short data-parallel SGD run that must agree bit-for-bit
with the single-process full-batch trajectory. Mirrors the reference's
``init_distributed_mode`` usage (/root/reference/utils/coco/util/misc.py:407-429).

Usage: python _multihost_worker.py <rank> <world_size> <port> <scratch_dir>
"""

import os
import sys

# One CPU device per process; must be set before jax initializes.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; the config knob works.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    rank, world, port, scratch = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

    from vision_transformers_tpu.parallel.distributed import (
        all_gather_objects,
        init_distributed_mode,
        is_main_process,
        save_on_master,
    )

    info = init_distributed_mode(
        coordinator_address=f"localhost:{port}",
        num_processes=world,
        process_id=rank,
    )
    assert info == {"rank": rank, "world_size": world, "distributed": True}, info
    assert jax.process_count() == world
    assert len(jax.devices()) == world  # one CPU device contributed per host

    from jax.experimental import multihost_utils

    # --- shard_for_process: per-host shards are disjoint and cover the set.
    from vision_transformers_tpu.utils.load_data import shard_for_process

    images = np.arange(32, dtype=np.float32).reshape(32, 1)
    labels = np.arange(32, dtype=np.int64)
    xs, ys = shard_for_process(images, labels, seed=0)
    assert len(ys) == 32 // world, len(ys)
    assert (xs[:, 0].astype(np.int64) == ys).all()  # rows stay paired
    every = multihost_utils.process_allgather(np.sort(ys))
    merged = np.sort(np.asarray(every).ravel())
    assert (merged == np.arange(32)).all(), "shards overlap or drop examples"

    # --- reduce_dict: averaged all-reduce of a scalar dict.
    from vision_transformers_tpu.utils.coco.util.misc import reduce_dict

    out = reduce_dict({"loss": float(rank + 1), "acc": float(rank)}, average=True)
    assert abs(out["loss"] - (world + 1) / 2) < 1e-12, out
    assert abs(out["acc"] - (world - 1) / 2) < 1e-12, out
    summed = reduce_dict({"loss": float(rank + 1)}, average=False)
    assert abs(summed["loss"] - world * (world + 1) / 2) < 1e-12, summed

    # --- SmoothedValue: (count, total) all-reduce.
    from vision_transformers_tpu.utils.metrics import SmoothedValue

    sv = SmoothedValue()
    sv.update(float(rank + 1), n=2)
    sv.synchronize_between_processes()
    assert sv.count == 2 * world, sv.count
    assert abs(sv.global_avg - (world + 1) / 2) < 1e-12, sv.global_avg

    # --- all_gather_objects: pytree gather (pickle-all_gather analogue).
    got = all_gather_objects({"r": np.asarray([rank], np.int32)})
    assert [int(g["r"][0]) for g in got] == list(range(world))

    # --- save_on_master: host-0 gating.
    marker = os.path.join(scratch, f"saved_by_{rank}.txt")
    save_on_master(lambda: open(marker, "w").write("x"))
    assert os.path.exists(marker) == is_main_process()

    # --- short DP run == single-process full-batch trajectory.
    # Tiny linear regression, 5 SGD steps. The batch is sharded over the
    # 2-host mesh; the loss is a global mean, so grads match the full batch.
    n, d = 8, 4
    rs = np.random.RandomState(0)
    full_x = rs.randn(n, d).astype(np.float32)
    full_y = rs.randn(n).astype(np.float32)
    w0 = rs.randn(d).astype(np.float32)

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    shard = NamedSharding(mesh, P("data"))
    local = full_x[rank * (n // world):(rank + 1) * (n // world)]
    local_y = full_y[rank * (n // world):(rank + 1) * (n // world)]
    gx = jax.make_array_from_process_local_data(shard, local)
    gy = jax.make_array_from_process_local_data(shard, local_y)

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    @jax.jit
    def step(w, x, y):
        return w - 0.1 * jax.grad(loss_fn)(w, x, y)

    w = jnp.asarray(w0)
    for _ in range(5):
        w = step(w, gx, gy)
    # w is replicated over the global mesh; every rank checks its local copy
    # against the full-batch reference (cross-rank agreement is implied).
    w_dist = np.asarray(w.addressable_shards[0].data)

    w_ref = w0.copy()
    for _ in range(5):
        g = 2.0 / n * full_x.T @ (full_x @ w_ref - full_y)
        w_ref = w_ref - 0.1 * g
    assert np.allclose(w_dist, w_ref, atol=1e-5), (w_dist, w_ref)

    print(f"MULTIHOST_OK rank={rank}")


if __name__ == "__main__":
    main()
