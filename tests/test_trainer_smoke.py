"""End-to-end trainer smoke test on a tiny synthetic COLMAP scene (CPU).

Covers the aux-module flags (pose_opt, app_opt, bilateral grid, depth loss)
through real train steps — the reference has no trainer-level test at all.
"""

import importlib.util
import json
import os
import struct
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
sys.path.insert(0, _EX)


def _load_trainer():
    spec = importlib.util.spec_from_file_location(
        "simple_trainer", os.path.join(_EX, "simple_trainer.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["simple_trainer"] = mod
    spec.loader.exec_module(mod)
    return mod


def _tiny_colmap(out, rng, n_pts=300, n_cams=6, W=48, H=36):
    from gsplat_tpu.datasets.colmap_io import qvec_to_rotmat  # noqa: F401
    os.makedirs(os.path.join(out, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(out, "images"), exist_ok=True)
    pts = rng.standard_normal((n_pts, 3)).astype(np.float32) * 0.5
    cols = rng.random((n_pts, 3)).astype(np.float32)
    f = 0.8 * W

    sp = os.path.join(out, "sparse", "0")
    with open(os.path.join(sp, "cameras.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", 1))
        fo.write(struct.pack("<iiQQ", 1, 1, W, H))
        fo.write(struct.pack("<4d", f, f, W / 2, H / 2))

    from PIL import Image

    names = []
    with open(os.path.join(sp, "images.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", n_cams))
        for i in range(n_cams):
            th = 2 * np.pi * i / n_cams
            # w2c with camera on a circle looking at origin: keep it simple,
            # identity rotation + z-offset translation variants
            q = np.array([1.0, 0, 0, 0])
            t = np.array([0.3 * np.cos(th), 0.3 * np.sin(th), 3.0])
            fo.write(struct.pack("<i", i + 1))
            fo.write(struct.pack("<7d", *q, *t))
            fo.write(struct.pack("<i", 1))
            name = f"v{i:02d}.png"
            names.append(name)
            fo.write(name.encode() + b"\x00")
            fo.write(struct.pack("<Q", 0))
            img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(out, "images", name))

    with open(os.path.join(sp, "points3D.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", n_pts))
        for j in range(n_pts):
            r, g, b = (cols[j] * 255).astype(np.uint8)
            fo.write(struct.pack("<QdddBBBd", j + 1, *pts[j].astype(np.float64), r, g, b, 0.5))
            fo.write(struct.pack("<Q", 0))


@pytest.mark.parametrize(
    "flags",
    [
        {},
        {"pose_opt": True, "use_bilateral_grid": True, "depth_loss": True},
        {"app_opt": True},
        # --backend override (the reference's GSPLAT_BACKEND selector):
        # the tiled Pallas pipeline (interpret mode on CPU) end-to-end,
        # including the off-TPU capacity probe
        {"backend": "tiled"},
    ],
    ids=["plain", "pose+bilagrid+depth", "app", "backend-tiled"],
)
def test_trainer_smoke(tmp_path, rng, flags):
    mod = _load_trainer()
    data_dir = str(tmp_path / "scene")
    _tiny_colmap(data_dir, rng)

    cfg = mod.Config(
        data_dir=data_dir,
        data_factor=1,
        result_dir=str(tmp_path / "out"),
        max_steps=6,
        eval_steps=[6],
        save_steps=[],
        refine_start_iter=2,
        refine_every=2,
        sh_degree_interval=100,
        test_every=5,
        pool_headroom=1.5,
        **flags,
    )
    runner = mod.Runner(cfg)
    runner.train()
    stats = runner.eval(6)
    assert np.isfinite(stats["psnr"])
    for v in runner.params.values():
        assert np.all(np.isfinite(np.asarray(v)))


@pytest.mark.parametrize(
    "aux",
    [
        {},
        {"pose_opt": True, "app_opt": True, "use_bilateral_grid": True},
        {"packed": True},
        {"depth_loss": True},
    ],
    ids=["plain", "pose+app+bilagrid", "packed", "depth"],
)
def test_trainer_distributed_smoke(tmp_path, rng, aux):
    """Distributed training on the 8-device CPU mesh: Gaussian-sharded pool,
    all_to_all exchange, one camera per device (batch_size = 8). The aux
    variant exercises the DDP-equivalent path: pose/appearance/bilagrid on
    replicated params outside the shard_map (reference
    simple_trainer.py:380-410); "packed" runs the fixed-capacity packed
    exchange with its pack_required growth loop; "depth" runs the disparity
    loss through the RGB+ED exchange."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mod = _load_trainer()
    data_dir = str(tmp_path / "scene")
    _tiny_colmap(data_dir, rng, n_cams=10)

    cfg = mod.Config(
        data_dir=data_dir,
        data_factor=1,
        result_dir=str(tmp_path / "out"),
        max_steps=4,
        eval_steps=[4],
        save_steps=[],
        refine_start_iter=2,
        refine_every=2,
        sh_degree_interval=100,
        test_every=9,
        pool_headroom=1.5,
        distributed=True,
        batch_size=8,
        **aux,
    )
    runner = mod.Runner(cfg)
    assert runner.mesh is not None
    runner.train()
    stats = runner.eval(4)
    assert np.isfinite(stats["psnr"])


def test_trainer_distributed_strips_smoke(tmp_path, rng):
    """batch_size=1 distributed training — the headline config the
    reference cannot distribute: each of the 8 devices trains one tile-row
    strip of the single camera (distributed.py strip layout)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mod = _load_trainer()
    data_dir = str(tmp_path / "scene")
    _tiny_colmap(data_dir, rng, n_cams=10)

    cfg = mod.Config(
        data_dir=data_dir,
        data_factor=1,
        result_dir=str(tmp_path / "out"),
        max_steps=4,
        eval_steps=[4],
        save_steps=[],
        refine_start_iter=2,
        refine_every=2,
        sh_degree_interval=100,
        test_every=9,
        pool_headroom=1.5,
        distributed=True,
        batch_size=1,
        tile_size=8,
    )
    runner = mod.Runner(cfg)
    assert runner.mesh is not None
    runner.train()
    stats = runner.eval(4)
    assert np.isfinite(stats["psnr"])


def test_trainer_checkpoint_resume(tmp_path, rng):
    """Full mid-train resume: optimizer + strategy state round-trips and
    training continues bit-compatibly from the checkpoint."""
    mod = _load_trainer()
    data_dir = str(tmp_path / "scene")
    _tiny_colmap(data_dir, rng)

    kw = dict(
        data_dir=data_dir, data_factor=1, max_steps=4, eval_steps=[],
        save_steps=[2], refine_start_iter=1, refine_every=2,
        sh_degree_interval=100, test_every=5, pool_headroom=1.5,
    )
    cfg = mod.Config(result_dir=str(tmp_path / "a"), **kw)
    r1 = mod.Runner(cfg)
    r1.train()  # saves ckpt_2.npz mid-run, continues to step 4

    cfg2 = mod.Config(
        result_dir=str(tmp_path / "b"),
        resume=str(tmp_path / "a" / "ckpt_2.npz"),
        **kw,
    )
    r2 = mod.Runner(cfg2)
    r2.train()  # resumes at step 2, runs 2 more steps

    for k in r1.params:
        a, b = np.asarray(r1.params[k]), np.asarray(r2.params[k])
        assert a.shape == b.shape
        # same data order + same rng keys per step -> identical trajectories
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5, err_msg=k)
    assert int(np.sum(np.asarray(r1.live))) == int(np.sum(np.asarray(r2.live)))


@pytest.mark.parametrize(
    "flags",
    [
        {},
        {"pose_opt": True, "depth_loss": True, "use_bilateral_grid": True},
    ],
    ids=["plain", "pose+depth+bilagrid"],
)
def test_trainer_2dgs_smoke(tmp_path, rng, flags):
    """2DGS runner inherits the full loop (pose/bilagrid/depth/batching)
    and adds warmup-gated geometry losses + geometry eval — parity with
    the reference 2DGS trainer's feature set (simple_trainer_2dgs.py:414-632)."""
    mod = _load_trainer()
    spec = importlib.util.spec_from_file_location(
        "simple_trainer_2dgs", os.path.join(_EX, "simple_trainer_2dgs.py")
    )
    mod2 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod2)

    data_dir = str(tmp_path / "scene")
    _tiny_colmap(data_dir, rng)
    cfg = mod.Config(
        data_dir=data_dir,
        data_factor=1,
        result_dir=str(tmp_path / "out"),
        max_steps=6,
        eval_steps=[6],
        save_steps=[4],
        refine_start_iter=2,
        refine_every=2,
        sh_degree_interval=100,
        test_every=5,
        pool_headroom=1.5,
        **flags,
    )
    runner = mod2.Runner2DGS(cfg, normal_start=3, dist_start=2)
    runner.train()
    stats = runner.eval(6)
    assert np.isfinite(stats["psnr"])
    geom = runner.eval_geometry(6)
    assert np.isfinite(geom["normal_consistency"])
    assert np.isfinite(geom["distortion"])
    for v in runner.params.values():
        assert np.all(np.isfinite(np.asarray(v)))


@pytest.mark.parametrize("packed", [False, True], ids=["dense", "packed"])
def test_trainer_2dgs_distributed_smoke(tmp_path, rng, packed):
    """2DGS distributed training on the 8-device CPU mesh: the surfel rows
    ride the same Gaussian-sharded exchange (rasterization_2dgs_distributed)
    with the inherited loop's geometry losses; --packed swaps in the
    fixed-capacity visible-surfel exchange + pack_required growth loop."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mod = _load_trainer()
    spec = importlib.util.spec_from_file_location(
        "simple_trainer_2dgs", os.path.join(_EX, "simple_trainer_2dgs.py")
    )
    mod2 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod2)

    data_dir = str(tmp_path / "scene")
    _tiny_colmap(data_dir, rng, n_cams=10)
    cfg = mod.Config(
        data_dir=data_dir,
        data_factor=1,
        result_dir=str(tmp_path / "out"),
        max_steps=4,
        eval_steps=[4],
        save_steps=[],
        refine_start_iter=2,
        refine_every=2,
        sh_degree_interval=100,
        test_every=9,
        pool_headroom=1.5,
        distributed=True,
        batch_size=8,
        packed=packed,
    )
    runner = mod2.Runner2DGS(cfg, normal_start=2, dist_start=1)
    assert runner.mesh is not None
    runner.train()
    stats = runner.eval(4)
    assert np.isfinite(stats["psnr"])
    for v in runner.params.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_trainer_2dgs_resume(tmp_path, rng):
    """Mid-train resume works through the inherited loop for 2DGS too."""
    mod = _load_trainer()
    spec = importlib.util.spec_from_file_location(
        "simple_trainer_2dgs", os.path.join(_EX, "simple_trainer_2dgs.py")
    )
    mod2 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod2)

    data_dir = str(tmp_path / "scene")
    _tiny_colmap(data_dir, rng)

    def mk(result_dir, max_steps, save, resume=""):
        return mod.Config(
            data_dir=data_dir, data_factor=1, result_dir=result_dir,
            max_steps=max_steps, eval_steps=[], save_steps=save,
            refine_start_iter=2, refine_every=2, sh_degree_interval=100,
            test_every=5, pool_headroom=1.5, resume=resume,
        )

    outA = str(tmp_path / "A")
    rA = mod2.Runner2DGS(mk(outA, 6, [3]), normal_start=2, dist_start=2)
    rA.train()

    outB = str(tmp_path / "B")
    rB = mod2.Runner2DGS(
        mk(outB, 6, [], resume=os.path.join(outA, "ckpt_3.npz")),
        normal_start=2, dist_start=2,
    )
    rB.train()
    for k in rA.params:
        np.testing.assert_allclose(
            np.asarray(rA.params[k]), np.asarray(rB.params[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )


def test_trainer_milestone_artifacts(tmp_path, rng):
    """render_traj video, PNG-compression round-trip hook, and TensorBoard
    scalars (reference simple_trainer.py:703-718, 934-1023)."""
    mod = _load_trainer()
    data_dir = str(tmp_path / "scene")
    _tiny_colmap(data_dir, rng)
    cfg = mod.Config(
        data_dir=data_dir,
        data_factor=1,
        result_dir=str(tmp_path / "out"),
        max_steps=4,
        eval_steps=[4],
        save_steps=[4],
        refine_start_iter=2,
        refine_every=2,
        sh_degree_interval=100,
        test_every=5,
        pool_headroom=1.5,
        render_traj=True,
        compression="png",
        tb_every=2,
        tb_save_image=True,
    )
    runner = mod.Runner(cfg)
    runner.train()
    out = cfg.result_dir
    vids = os.listdir(os.path.join(out, "videos"))
    assert any(v.startswith("traj_interp_4") for v in vids), vids
    cdir = os.path.join(out, "compression_4")
    report = json.load(open(os.path.join(cdir, "report.json")))
    assert report["size_bytes"] > 0
    assert np.isfinite(report["psnr"])
    # TB event files written
    tb_files = os.listdir(os.path.join(out, "tb"))
    assert any("tfevents" in f for f in tb_files), tb_files
