"""End-to-end compression artifact: {variant, #GS, bytes, PSNR} CSV.

From a trained checkpoint, compress the live splats with PngCompression in
three layouts — unsorted, serpentine Hilbert-ish sort (the default), and
serpentine+plas_refine — then round-trip (decompress -> eval) on the val
split. This is the artifact the reference publishes per-scene in
examples/benchmarks/compression/results/MipNeRF360.csv:2-5 (ours is the
synthetic-garden stand-in; no network in this image). The byte-level PLAS
gap study is scripts/exp_plas_gap.py; this measures the end-to-end outcome.

Usage:
  python scripts/compress_eval.py --ckpt /tmp/q4/mcmc30k/ckpt_30000.npz \
      --data-dir /tmp/q4_data --out-csv results/quality_r4/compression.csv
"""
import argparse
import csv
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("GSPLAT_FORCE_CPU") == "1":
    # `JAX_PLATFORMS=cpu` is ignored in this image (axon plugin override);
    # the config call is the working escape hatch (CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def _load_trainer():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "simple_trainer.py",
    )
    spec = importlib.util.spec_from_file_location("simple_trainer", path)
    mod = importlib.util.module_from_spec(spec)
    # dataclasses resolves the defining module via sys.modules at class
    # creation; without this registration Config fails to build
    sys.modules["simple_trainer"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out-csv", required=True)
    ap.add_argument("--data-factor", type=int, default=1)
    # BooleanOptionalAction so --no-white-bkgd works for checkpoints
    # trained on black backgrounds (store_true + default=True was a no-op)
    ap.add_argument(
        "--white-bkgd", action=argparse.BooleanOptionalAction, default=True
    )
    args = ap.parse_args()

    from gsplat_tpu.compression import PngCompression

    mod = _load_trainer()
    cfg = mod.Config(
        data_dir=args.data_dir, data_factor=args.data_factor,
        result_dir=os.path.join(os.path.dirname(args.ckpt), "compress_eval"),
        white_bkgd=args.white_bkgd, test_every=8,
    )
    runner = mod.Runner(cfg)
    step = runner.load(args.ckpt)
    live = np.asarray(runner.live)
    splats = {
        k: np.asarray(v)[live]
        for k, v in runner.params.items()
        if k in ("means", "scales", "quats", "opacities", "sh0", "shN")
    }
    n_gs = splats["means"].shape[0]

    rows = []
    variants = [
        ("unsorted", dict(use_sort=False)),
        ("serpentine", dict(use_sort=True)),
        ("serpentine+plas", dict(use_sort=True, plas=True)),
    ]
    base_psnr = runner.eval(step)  # uncompressed reference point
    src = os.path.join(cfg.result_dir, f"val_step{step}.json")
    if os.path.exists(src):
        os.replace(
            src, os.path.join(cfg.result_dir, f"val_step{step}_uncompressed.json")
        )
    for name, kw in variants:
        comp = PngCompression(**kw)
        cdir = os.path.join(cfg.result_dir, f"compression_{name}")
        comp.compress(cdir, dict(splats))
        size = sum(
            os.path.getsize(os.path.join(cdir, f)) for f in os.listdir(cdir)
        )
        restored = comp.decompress(cdir)
        saved = {k: runner.params[k] for k in restored}
        cap = live.shape[0]
        n = restored["means"].shape[0]
        for k, v in restored.items():
            runner.params[k] = jnp.asarray(
                np.concatenate([v, np.zeros((cap - n,) + v.shape[1:], v.dtype)])
            )
        saved_live = runner.live
        runner.live = jnp.arange(cap) < n
        stats = runner.eval(step)
        runner.params.update(saved)
        runner.live = saved_live
        # eval() writes val_step{step}.json into result_dir; keep each
        # variant's raw evidence instead of letting the next run clobber it
        src = os.path.join(cfg.result_dir, f"val_step{step}.json")
        if os.path.exists(src):
            os.replace(
                src, os.path.join(cfg.result_dir, f"val_step{step}_{name}.json")
            )
        rows.append({
            "variant": name, "n_gaussians": n, "bytes": int(size),
            "psnr": round(float(stats["psnr"]), 4),
            "ssim": round(float(stats.get("ssim", float("nan"))), 4),
        })
        print(name, rows[-1], flush=True)

    os.makedirs(os.path.dirname(args.out_csv) or ".", exist_ok=True)
    with open(args.out_csv, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["variant", "n_gaussians", "bytes", "psnr", "ssim"]
        )
        w.writeheader()
        w.writerows(rows)
        f.write(
            f"# uncompressed: n_gaussians={n_gs} "
            f"psnr={float(base_psnr['psnr']):.4f}\n"
        )
    print("wrote", args.out_csv)


if __name__ == "__main__":
    main()
