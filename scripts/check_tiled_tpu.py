"""Quick on-device parity check: tiled Pallas rasterizer vs jnp oracle."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref
from gsplat_tpu.ops.rasterize_tiled import rasterize_to_pixels_tiled
from gsplat_tpu.ops.isect import isect_tiles

rng = np.random.default_rng(0)
N, C, W, H, ts = 300, 2, 64, 48, 16
means = rng.standard_normal((N,3)).astype(np.float32)
quats = rng.standard_normal((N,4)).astype(np.float32)
scales = (rng.random((N,3))*0.3+0.05).astype(np.float32)
opac = rng.random((N,)).astype(np.float32)
colors = rng.random((N,3)).astype(np.float32)
viewmats = np.tile(np.eye(4,dtype=np.float32),(C,1,1)); viewmats[:,2,3]=4.0
viewmats[1,0,3]=0.3
Ks = np.tile(np.array([[30.,0,W/2],[0,30.,H/2],[0,0,1]],np.float32),(C,1,1))
bg = rng.random((C,3)).astype(np.float32)

radii, means2d, depths, conics, _ = fully_fused_projection(
    jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
    jnp.asarray(viewmats), jnp.asarray(Ks), W, H)
opc = jnp.broadcast_to(jnp.asarray(opac)[None], (C,N))
cols = jnp.broadcast_to(jnp.asarray(colors)[None], (C,N,3))
tw_, th_ = -(-W//ts), -(-H//ts)
isect = isect_tiles(means2d, radii, depths, ts, tw_, th_, capacity=8192)

def f_ref(m2d, con, col, op):
    return rasterize_to_pixels_ref(m2d, con, col, op, radii, depths, W, H, ts, jnp.asarray(bg))
def f_til(m2d, con, col, op):
    return rasterize_to_pixels_tiled(m2d, con, col, op, W, H, ts, isect, backgrounds=jnp.asarray(bg))

r0, a0 = jax.jit(f_ref)(means2d, conics, cols, opc)
r1, a1 = jax.jit(f_til)(means2d, conics, cols, opc)
print("color max diff:", float(jnp.abs(r0-r1).max()))
print("alpha max diff:", float(jnp.abs(a0-a1).max()))

wr = jnp.asarray(rng.standard_normal(r0.shape).astype(np.float32))
wa = jnp.asarray(rng.standard_normal(a0.shape).astype(np.float32))
def gradf(f):
    def L(m2d, con, col, op):
        r, a = f(m2d, con, col, op)
        return jnp.sum(r*wr) + jnp.sum(a*wa)
    return jax.jit(jax.grad(L, argnums=(0,1,2,3)))
g0 = gradf(f_ref)(means2d, conics, cols, opc)
g1 = gradf(f_til)(means2d, conics, cols, opc)
ok = True
for name, x, y in zip(["means2d","conics","colors","opac"], g0, g1):
    d = float(jnp.abs(x-y).max()); m = float(jnp.abs(x).max())
    print(f"grad {name}: maxabs={m:.4g} maxdiff={d:.4g}")
    ok &= d <= 1e-3 * max(m, 1.0)
print("PARITY", "OK" if ok else "FAIL", "on", jax.default_backend())
