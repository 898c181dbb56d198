"""Worker process for tests/test_multiprocess.py — one rank of a real
multi-process JAX "pod" (gloo-backed CPU collectives).

Not collected by pytest (no ``test_`` prefix). Invoked as:

    python multiproc_worker.py <process_id> <num_processes> <port> <npz>

The npz carries the scene plus single-device expectations computed by the
parent. Each rank builds the global mesh spanning every process's devices,
runs the distributed render + gradients, and compares ITS addressable
shards against the expectation. Exit code 0 = all shards match.

This is the true multi-host code path (``jax.distributed.initialize`` +
global mesh + cross-process collectives) that a TPU pod runs — the
single-process 8-device mesh in test_distributed.py shares one XLA client,
which cannot catch rendezvous/global-array bugs. The reference has no
equivalent harness at all (SURVEY.md §4.4: collectives are tested only by
spawning one process per physical GPU, tests/_test_distributed.py).
"""

import os
import sys

import numpy as np

# invoked as a script: python puts tests/ on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, data_path = sys.argv[3], sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gsplat_tpu.distributed import rasterization_distributed

    d = np.load(data_path)
    args_np = [d[k] for k in ("means", "quats", "scales", "opac", "colors")]
    vm, K = jnp.asarray(d["viewmats"]), jnp.asarray(d["Ks"])
    W, H = int(d["W"]), int(d["H"])
    wr = jnp.asarray(d["wr"])

    devices = np.array(jax.devices())  # global: all processes' devices
    assert len(devices) == nproc * jax.local_device_count(), devices
    mesh = Mesh(devices, ("gauss",))
    gauss = NamedSharding(mesh, P("gauss"))

    def put(x, sharding):
        # each rank materializes only its addressable shards
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    sharded = tuple(put(a, gauss) for a in args_np)

    def loss_fn(*a):
        render, alphas, meta = rasterization_distributed(
            *a, vm, K, W, H, mesh=mesh
        )
        return jnp.sum(render * wr) + jnp.sum(alphas), (render, meta["radii"])

    (loss, (render, radii)), grads = jax.jit(
        jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True)
    )(*sharded)

    # loss is fully replicated: every rank checks the scalar
    np.testing.assert_allclose(
        float(loss), float(d["loss"]), rtol=1e-5, err_msg="loss"
    )

    def check_shards(got, want_full, name, atol, rtol):
        for shard in got.addressable_shards:
            np.testing.assert_allclose(
                np.asarray(shard.data),
                want_full[shard.index],
                atol=atol,
                rtol=rtol,
                err_msg=f"rank {pid} {name} shard {shard.index}",
            )

    check_shards(render, d["render"], "render", 2e-5, 1e-5)
    check_shards(radii, d["radii"], "radii", 0, 0)
    for name, got in zip(
        ("g_means", "g_quats", "g_scales", "g_opac", "g_colors"), grads
    ):
        want = d[name]
        s = max(float(np.abs(want).max()), 1.0)
        check_shards(got, want, name, 2e-4 * s, 2e-4)

    print(f"rank {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
