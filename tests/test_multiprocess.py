"""Real multi-process distributed rendering (2 processes x 2 CPU devices).

The single-process 8-device mesh in test_distributed.py validates the SPMD
program; this file validates the actual multi-host machinery a TPU pod
uses — ``jax.distributed.initialize`` rendezvous, gloo-backed cross-process
collectives, global meshes over non-addressable devices, and
``jax.make_array_from_callback`` shard construction. The reference has no
simulated multi-node harness (SURVEY.md §4.4); its collectives tests spawn
one process per physical GPU only.

Parent computes single-device expectations, spawns the workers
(tests/multiproc_worker.py), and requires every rank to report OK.
"""

import os
import socket
import subprocess
import sys

import numpy as np

import jax.numpy as jnp

from gsplat_tpu import rasterization

_DIR = os.path.dirname(os.path.abspath(__file__))


def _scene(rng, N=256, C=4, W=48, H=32):
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.25 + 0.05).astype(np.float32)
    opac = rng.random((N,)).astype(np.float32)
    colors = rng.random((N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 2, 3] = 4.0
    for c in range(C):
        viewmats[c, 0, 3] = 0.1 * c
    Ks = np.tile(
        np.array([[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    return means, quats, scales, opac, colors, viewmats, Ks, W, H


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_pod_matches_single_device(rng, tmp_path):
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(rng)
    args = tuple(
        jnp.asarray(x) for x in (means, quats, scales, opac, colors)
    )
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    wr = rng.standard_normal((viewmats.shape[0], H, W, 3)).astype(np.float32)

    import jax

    def loss_fn(*a):
        render, alphas, meta = rasterization(*a, vm, K, W, H)
        return (
            jnp.sum(render * jnp.asarray(wr)) + jnp.sum(alphas),
            (render, meta["radii"]),
        )

    (loss, (render, radii)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True
    )(*args)

    data_path = str(tmp_path / "scene.npz")
    np.savez(
        data_path,
        means=means, quats=quats, scales=scales, opac=opac, colors=colors,
        viewmats=viewmats, Ks=Ks, W=W, H=H, wr=wr,
        loss=float(loss), render=np.asarray(render), radii=np.asarray(radii),
        **{
            n: np.asarray(g)
            for n, g in zip(
                ("g_means", "g_quats", "g_scales", "g_opac", "g_colors"),
                grads,
            )
        },
    )

    nproc, local_devices = 2, 2
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    env.pop("GSPLAT_TEST_TPU", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(_DIR, "multiproc_worker.py"),
                str(pid), str(nproc), str(port), data_path,
            ],
            env=env,
            cwd=os.path.dirname(_DIR),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"rank {pid}: OK" in out, out
