"""Interactive web viewer: orbit a trained checkpoint in the browser.

Parity target: /root/reference/examples/simple_viewer.py:27-162 (viser
interactive viewer). viser does not ship in this image, so this is a
self-contained stdlib implementation of the same role: a local HTTP
server renders frames on demand with the library's own `rasterization`
and a ~150-line HTML/JS orbit UI (drag = orbit, shift-drag = pan,
wheel = dolly, RGB/depth/alpha modes) displays them. One jitted render
at a fixed resolution serves every request (static shapes — one
compile); a lock serializes JAX dispatch across HTTP threads.

Usage:
    python examples/interactive_viewer.py --ckpt results/garden/ckpt_30000.npz
    python examples/interactive_viewer.py --demo          # garden fixture
    # then open http://localhost:8090
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


PAGE = """<!doctype html>
<html><head><title>gsplat_tpu viewer</title><style>
 body { margin:0; background:#111; color:#ddd; font:13px sans-serif;
        overflow:hidden }
 #hud { position:fixed; top:8px; left:8px; background:#000a; padding:8px
        12px; border-radius:6px }
 #img { width:100vw; height:100vh; object-fit:contain; cursor:grab }
 button { margin-right:4px }
 .on { background:#4a7; }
</style></head><body>
<img id="img">
<div id="hud">
 <div>drag: orbit &middot; shift-drag: pan &middot; wheel: dolly</div>
 <div style="margin:6px 0">
  <button id="m_rgb" class="on">RGB</button>
  <button id="m_depth">depth</button>
  <button id="m_alpha">alpha</button>
 </div>
 <div id="stat"></div>
</div>
<script>
 let az=0.8, el=0.4, r=__R0__, tx=0, ty=0, tz=0, mode='rgb';
 let busy=false, dirty=true, t0=0;
 const img=document.getElementById('img'), stat=document.getElementById('stat');
 function url(){ return `/render?az=${az.toFixed(4)}&el=${el.toFixed(4)}`+
   `&r=${r.toFixed(4)}&tx=${tx.toFixed(4)}&ty=${ty.toFixed(4)}`+
   `&tz=${tz.toFixed(4)}&mode=${mode}&_=${Date.now()}`; }
 function tick(){
   if (dirty && !busy){ busy=true; dirty=false; t0=performance.now();
     const u=url();
     fetch(u).then(r=>r.blob()).then(b=>{
       img.src=URL.createObjectURL(b); busy=false;
       stat.textContent=`${(performance.now()-t0).toFixed(0)} ms/frame`;
     }).catch(()=>{busy=false;});
   }
   requestAnimationFrame(tick);
 }
 tick();
 let drag=null;
 img.onpointerdown=e=>{drag=[e.clientX,e.clientY,e.shiftKey];
   img.setPointerCapture(e.pointerId);};
 img.onpointermove=e=>{ if(!drag) return;
   const dx=e.clientX-drag[0], dy=e.clientY-drag[1];
   if (drag[2]){ tx-=dx*r*0.002; ty+=dy*r*0.002; }
   else { az-=dx*0.008; el=Math.max(-1.5,Math.min(1.5,el+dy*0.008)); }
   drag=[e.clientX,e.clientY,drag[2]]; dirty=true; };
 img.onpointerup=()=>{drag=null;};
 window.onwheel=e=>{ r*=Math.exp(e.deltaY*0.001); dirty=true; };
 for (const m of ['rgb','depth','alpha'])
   document.getElementById('m_'+m).onclick=ev=>{
     mode=m; dirty=true;
     for (const x of document.querySelectorAll('button'))
       x.classList.remove('on');
     ev.target.classList.add('on'); };
</script></body></html>"""


class Viewer:
    def __init__(self, params, live, sh_degree, width, height, backend,
                 isect_capacity, focal):
        import jax
        import jax.numpy as jnp

        from gsplat_tpu import rasterization

        self.lock = threading.Lock()
        self.W, self.H = width, height
        pts = np.asarray(params["means"])
        if live is not None:
            pts = pts[np.asarray(live).astype(bool)]
        self.center = np.median(pts, axis=0)
        self.r0 = float(3.0 * np.median(np.abs(pts - self.center)) + 1e-6)
        K = np.array(
            [[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]],
            np.float32,
        )
        if sh_degree is not None:
            colors = jnp.concatenate([params["sh0"], params["shN"]], axis=1)
            # cap the requested degree by what the checkpoint carries
            # (same guard as simple_viewer.py): (deg+1)^2 bases needed
            deg_avail = int(np.sqrt(colors.shape[1])) - 1
            sh_degree = min(sh_degree, deg_avail)
        else:
            colors = params["colors"]

        def render(w2c):
            out, alphas, _ = rasterization(
                params["means"],
                params["quats"],
                jnp.exp(params["scales"]),
                jax.nn.sigmoid(params["opacities"]),
                colors,
                w2c[None],
                jnp.asarray(K)[None],
                width,
                height,
                sh_degree=sh_degree,
                masks=live,
                render_mode="RGB+ED",
                backend=backend,
                isect_capacity=isect_capacity,
            )
            return out[0], alphas[0]

        self._render = jax.jit(render)
        self._jnp = jnp

    def look_at(self, az, el, r, pan):
        # orbit camera: eye on a sphere around center+pan, z-up world
        t = self.center + pan
        eye = t + r * np.array(
            [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)]
        )
        fwd = t - eye
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, -1.0])
        right = np.cross(fwd, up)
        nrm = np.linalg.norm(right)
        if nrm < 1e-6:
            right = np.array([1.0, 0.0, 0.0])
        else:
            right /= nrm
        down = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1] = right, down
        c2w[:3, 2], c2w[:3, 3] = fwd, eye
        return np.linalg.inv(c2w)

    def frame(self, az, el, r, pan, mode):
        jnp = self._jnp
        w2c = jnp.asarray(self.look_at(az, el, r, pan))
        with self.lock:
            out, alphas = self._render(w2c)
            out = np.asarray(out)
            alphas = np.asarray(alphas)
        if mode == "depth":
            d = out[..., 3]
            m = alphas[..., 0] > 0.2
            if m.any():
                lo, hi = np.percentile(d[m], [2, 98])
            else:
                lo, hi = 0.0, 1.0
            d = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
            img = (np.stack([d, d, 1.0 - d * 0.5], -1) * 255).astype(np.uint8)
        elif mode == "alpha":
            img = (np.repeat(alphas, 3, axis=-1) * 255).astype(np.uint8)
        else:
            img = (np.clip(out[..., :3], 0, 1) * 255).astype(np.uint8)
        return img


def serve(viewer: Viewer, port: int):
    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                body = PAGE.replace("__R0__", f"{viewer.r0:.4f}").encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
                return
            if u.path == "/render":
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                t0 = time.time()
                img = viewer.frame(
                    float(q.get("az", 0)), float(q.get("el", 0)),
                    float(q.get("r", viewer.r0)),
                    np.array([float(q.get("tx", 0)), float(q.get("ty", 0)),
                              float(q.get("tz", 0))]),
                    q.get("mode", "rgb"),
                )
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, "JPEG", quality=88)
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.send_header("X-Render-Seconds", f"{time.time() - t0:.3f}")
                self.end_headers()
                self.wfile.write(buf.getvalue())
                return
            if u.path == "/info":
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps(
                    {"width": viewer.W, "height": viewer.H, "r0": viewer.r0}
                ).encode())
                return
            self.send_response(404)
            self.end_headers()

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    print(f"viewer listening on http://localhost:{httpd.server_address[1]}",
          flush=True)
    return httpd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--demo", action="store_true",
                    help="view the garden fixture splats (no ckpt needed)")
    ap.add_argument("--port", type=int, default=8090)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--focal", type=float, default=520.0)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--max-points", type=int, default=0,
                    help="subsample the splats (0 = all)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    live = None
    sh_degree = args.sh_degree
    if args.demo and args.ckpt:
        ap.error("--demo and --ckpt are mutually exclusive")
    if args.ckpt:
        blob = np.load(args.ckpt)
        if any(k.startswith("splat/") for k in blob.files):
            # trainer checkpoint layout (examples/simple_trainer.py save())
            params = {
                k.split("/", 1)[1]: jnp.asarray(blob[k])
                for k in blob.files if k.startswith("splat/")
            }
            live = jnp.asarray(blob["live"]) if "live" in blob.files else None
        else:
            params = {k: jnp.asarray(blob[k]) for k in blob.files if k != "live"}
            live = jnp.asarray(blob["live"]) if "live" in blob.files else None
    else:
        from gsplat_tpu import load_test_data

        means, quats, scales, opac, colors, *_ = load_test_data()
        n = len(means)
        sel = slice(None)
        if args.max_points and n > args.max_points:
            sel = np.random.default_rng(0).choice(
                n, args.max_points, replace=False
            )
        params = {
            "means": jnp.asarray(means[sel]),
            "quats": jnp.asarray(quats[sel]),
            "scales": jnp.log(jnp.clip(jnp.asarray(scales[sel]), 1e-7, None)),
            "opacities": jnp.asarray(
                np.log(np.clip(opac[sel], 1e-6, 1 - 1e-6)
                       / (1 - np.clip(opac[sel], 1e-6, 1 - 1e-6)))
            ),
            "colors": jnp.asarray(colors[sel]),
        }
        sh_degree = None

    on_tpu = jax.default_backend() == "tpu"
    backend = "binned" if on_tpu else "oracle"
    cap = 2**22 if on_tpu else None
    viewer = Viewer(params, live, sh_degree, args.width, args.height,
                    backend, cap, args.focal)
    httpd = serve(viewer, args.port)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
