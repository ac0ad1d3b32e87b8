"""Gaussian scene viewer (reference viewer.py equivalent).

Loads ``output.ply`` (including ``semantic_label`` / ``instance_label`` /
``seg_query_class_logits_*`` attributes, reference viewer.py:134-296) and
renders RGB / semantic / instance views with the TPU rasterizer using the
same query-class-logit lifting math as the pipeline (viewer.py:338-446).

Three modes:
  * ``--orbit``: headless — renders an orbit trajectory to PNGs;
  * ``--serve``: interactive — a dependency-free web viewer (stdlib
    http.server + a small HTML/JS page): drag to orbit, scroll to zoom,
    rgb/semantic/instance/depth mode buttons. Frames are rasterized
    on-device per request (the reference's viser server renders the same
    way per camera-move callback, viewer.py:375-446);
  * default: viser server when viser is installed (it is not here).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def load_gaussian_ply(path):
    """PLY -> dict of arrays (means, scales(linear), rot xyzw, harmonics,
    opacities, labels, qc_logits [G, Q, C] or None)."""
    from siu3r_tpu.io import read_ply

    data = read_ply(path)
    g = data["x"].shape[0]
    means = np.stack([data["x"], data["y"], data["z"]], -1).astype(np.float32)
    scales = np.exp(np.stack([data[f"scale_{i}"] for i in range(3)], -1)).astype(
        np.float32
    )
    w, x, y, z = (data[f"rot_{i}"] for i in range(4))
    rot_xyzw = np.stack([x, y, z, w], -1).astype(np.float32)
    f_dc = np.stack([data[f"f_dc_{i}"] for i in range(3)], -1)
    rest_keys = sorted(
        (k for k in data if k.startswith("f_rest_")),
        key=lambda k: int(k.split("_")[-1]),
    )
    if rest_keys:
        f_rest = np.stack([data[k] for k in rest_keys], -1).reshape(g, 3, -1)
        harmonics = np.concatenate([f_dc[..., None], f_rest], axis=-1)
    else:
        harmonics = f_dc[..., None]
    opac = data["opacity"].astype(np.float32)
    sem = data.get("semantic_label")
    ins = data.get("instance_label")
    qc_keys = sorted(
        (k for k in data if k.startswith("seg_query_class_logits_")),
        key=lambda k: int(k.split("_")[-1]),
    )
    qc = None
    if qc_keys:
        flat = np.stack([data[k] for k in qc_keys], -1)
        n_cols = flat.shape[-1]
        # reference PLY stores q*c columns with c = num_labels+1 (21)
        for c in (21, 151, 134):  # scannet / ade20k / coco class counts + 1
            if n_cols % c == 0:
                qc = flat.reshape(g, n_cols // c, c)
                break
    return {
        "means": means,
        "scales": scales,
        "rotations": rot_xyzw,
        "harmonics": harmonics.astype(np.float32),
        "opacities": opac,
        "semantic": sem,
        "instance": ins,
        "qc": qc,
    }


def render_views(scene, viewmats, intr_px, image_size, mode="rgb"):
    """mode: rgb | semantic | instance | depth. Returns [N, H, W, 3] uint8."""
    import jax.numpy as jnp

    from siu3r_tpu.gaussians import build_covariance
    from siu3r_tpu.ops.sh import eval_sh_colors
    from siu3r_tpu.render.rasterizer import rasterize
    from siu3r_tpu.utils.scannet_constant import (
        INSTANCE_COLOR_PALLETE,
        PANOPTIC_COLOR_PALLETE,
    )

    covs = build_covariance(jnp.asarray(scene["scales"]), jnp.asarray(scene["rotations"]))
    means = jnp.asarray(scene["means"])
    opac = jnp.asarray(scene["opacities"])
    if mode == "rgb":
        deg = int(round(scene["harmonics"].shape[-1] ** 0.5)) - 1
        cam_pos = jnp.asarray(np.linalg.inv(viewmats))[:, :3, 3]
        dirs = means[None] - cam_pos[:, None]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8)
        colors = eval_sh_colors(jnp.asarray(scene["harmonics"])[None], dirs, deg)
        img, _, _ = rasterize(
            means, covs, opac, colors, jnp.asarray(viewmats), jnp.asarray(intr_px),
            image_size,
        )
        return (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    if mode == "depth":
        colors = jnp.zeros((means.shape[0], 1))
        _, depth, _ = rasterize(
            means, covs, opac, colors, jnp.asarray(viewmats), jnp.asarray(intr_px),
            image_size,
        )
        d = np.asarray(depth)
        d = d / max(d.max(), 1e-6)
        return (np.stack([d] * 3, -1) * 255).astype(np.uint8)

    # semantic / instance via qc-logit re-rasterization + argmax lift
    # (reference viewer.py:403-446, same math as pipeline.py:137-168)
    assert scene["qc"] is not None, "PLY has no seg_query_class_logits_*"
    qc = jnp.asarray(scene["qc"])  # [G, Q, C]
    g, q, c = qc.shape
    rendered, _, _ = rasterize(
        means, covs, opac, qc.reshape(g, q * c),
        jnp.asarray(viewmats), jnp.asarray(intr_px), image_size,
        channel_chunk=64,
    )  # [N, H, W, q*c]
    n, h, w = rendered.shape[:3]
    r = np.asarray(rendered).reshape(n, h, w, q, c)
    c_logit = r.max(axis=3)  # [N, H, W, C]
    q_index = r.argmax(axis=3)
    c_logit = np.concatenate([c_logit[..., -1:], c_logit[..., :-1]], -1)
    q_index = np.concatenate([q_index[..., -1:], q_index[..., :-1]], -1)
    sem_logit = c_logit.max(-1)
    sem_id = c_logit.argmax(-1)
    qi = np.take_along_axis(q_index, sem_id[..., None], -1)[..., 0] + 1
    sem_id[sem_logit < 0.3] = 0
    qi[sem_id == 0] = 0
    if mode == "semantic":
        palette = np.array(
            [PANOPTIC_COLOR_PALLETE.get(i, [127, 127, 127]) for i in range(21)],
            np.uint8,
        )
        return palette[np.clip(sem_id, 0, 20)]
    rng = np.random.RandomState(0)
    inst_palette = np.concatenate(
        [np.zeros((1, 3), np.uint8), rng.randint(40, 255, (256, 3)).astype(np.uint8)]
    )
    return inst_palette[np.clip(qi, 0, 256)]


def orbit_cameras(scene, n_frames=24, image_size=(256, 256), fov_deg=60.0):
    means = scene["means"]
    center = np.median(means, axis=0)
    radius = np.percentile(np.linalg.norm(means - center, axis=-1), 70)
    h, w = image_size
    f = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    viewmats = []
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        eye = center + radius * np.array([np.sin(ang) * 0.4, -0.15, -0.4 * np.cos(ang)])
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, fwd, eye
        viewmats.append(np.linalg.inv(c2w))
    return np.stack(viewmats), np.stack([intr] * n_frames)


def camera_from_spherical(center, yaw, pitch, radius, image_size, fov_deg=60.0):
    """(yaw, pitch, radius) orbit camera around ``center`` -> (viewmat [4,4],
    intr_px [3,3])."""
    h, w = image_size
    f = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    eye = center + radius * np.array([sy * cp, -sp, -cy * cp])
    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    nrm = np.linalg.norm(right)
    if nrm < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
        nrm = 1.0
    right = right / nrm
    up2 = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, fwd, eye
    return np.linalg.inv(c2w).astype(np.float32), intr


_VIEWER_HTML = """<!doctype html>
<html><head><title>siu3r_tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:sans-serif;display:flex;
flex-direction:column;align-items:center}
#img{cursor:grab;image-rendering:pixelated;width:512px;height:512px;margin:12px}
button{margin:2px;padding:6px 10px}button.on{background:#4a8}
</style></head><body>
<div id="bar">
<button data-m="rgb" class="on">rgb</button>
<button data-m="semantic">semantic</button>
<button data-m="instance">instance</button>
<button data-m="depth">depth</button>
<span id="st"></span></div>
<img id="img" width=512 height=512/>
<script>
let yaw=0, pitch=0.15, radius=1.0, mode="rgb", busy=false, dirty=true;
const img=document.getElementById("img"), st=document.getElementById("st");
function refresh(){
  if(busy){dirty=true;return;} busy=true; dirty=false;
  const t0=performance.now();
  const u=`/render?yaw=${yaw.toFixed(3)}&pitch=${pitch.toFixed(3)}`+
          `&radius=${radius.toFixed(3)}&mode=${mode}&t=${Date.now()}`;
  const pre=new Image();
  pre.onload=()=>{img.src=pre.src;
    st.textContent=` ${(performance.now()-t0).toFixed(0)} ms`;
    busy=false; if(dirty) refresh();};
  pre.onerror=()=>{busy=false;};
  pre.src=u;
}
let drag=null;
img.onmousedown=e=>{drag=[e.clientX,e.clientY];e.preventDefault();};
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{if(!drag)return;
  yaw+=(e.clientX-drag[0])*0.01; pitch+=(e.clientY-drag[1])*0.01;
  pitch=Math.max(-1.4,Math.min(1.4,pitch)); drag=[e.clientX,e.clientY];
  refresh();};
img.onwheel=e=>{e.preventDefault();radius*=Math.exp(e.deltaY*0.001);refresh();};
document.querySelectorAll("#bar button").forEach(b=>b.onclick=()=>{
  mode=b.dataset.m;
  document.querySelectorAll("#bar button").forEach(x=>x.classList.remove("on"));
  b.classList.add("on"); refresh();});
refresh();
</script></body></html>"""


def serve(scene, port: int, image_size=(256, 256), block: bool = True,
          host: str = "127.0.0.1"):
    """Interactive web viewer: render frames on demand over HTTP.

    Binds loopback by default — the render endpoint is unauthenticated, so
    exposing it on all interfaces is an explicit opt-in (``--host 0.0.0.0``).
    """
    import io
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    from PIL import Image

    center = np.median(scene["means"], axis=0)
    base_radius = float(
        np.percentile(
            np.linalg.norm(scene["means"] - center, axis=-1), 70
        )
    )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = _VIEWER_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if url.path != "/render":
                self.send_response(404)
                self.end_headers()
                return
            q = parse_qs(url.query)
            get = lambda k, d: float(q.get(k, [d])[0])
            yaw = get("yaw", 0.0)
            pitch = get("pitch", 0.15)
            radius = get("radius", 1.0) * base_radius
            mode = q.get("mode", ["rgb"])[0]
            vm, intr = camera_from_spherical(
                center, yaw, pitch, radius, image_size
            )
            img = render_views(
                scene, vm[None], intr[None], image_size, mode=mode
            )[0]
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer((host, port), Handler)
    if not block:
        return server  # tests drive the handler directly
    print(f"[viewer] serving on http://localhost:{server.server_port}/ "
          "(ctrl-c to stop)")
    server.serve_forever()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ply", type=str, required=True)
    parser.add_argument("--orbit", action="store_true", help="headless orbit render")
    parser.add_argument("--serve", action="store_true", help="interactive web viewer")
    parser.add_argument("--mode", default="rgb", choices=["rgb", "semantic", "instance", "depth"])
    parser.add_argument("--output_path", default="viewer_out")
    parser.add_argument("--frames", type=int, default=24)
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument(
        "--host", default="127.0.0.1",
        help="bind address for --serve (default loopback; 0.0.0.0 exposes "
        "the unauthenticated render endpoint on all interfaces)",
    )
    args = parser.parse_args(argv)

    scene = load_gaussian_ply(args.ply)
    print(f"[viewer] {scene['means'].shape[0]} gaussians, "
          f"qc: {None if scene['qc'] is None else scene['qc'].shape}")

    if args.serve:
        serve(scene, args.port, host=args.host)
        return

    if not args.orbit:
        try:
            import viser  # noqa: F401
        except ImportError:
            raise SystemExit(
                "viser is not installed in this environment; use --serve for "
                "the built-in interactive web viewer or --orbit for headless "
                "rendering"
            )
        raise SystemExit("viser mode not wired; use --serve or --orbit")

    from PIL import Image

    out = Path(args.output_path)
    out.mkdir(parents=True, exist_ok=True)
    viewmats, intr = orbit_cameras(scene, args.frames)
    imgs = render_views(scene, viewmats, intr, (256, 256), mode=args.mode)
    for i, img in enumerate(imgs):
        Image.fromarray(img).save(out / f"{args.mode}_{i:03d}.png")
    print(f"[viewer] wrote {len(imgs)} frames to {out}")


if __name__ == "__main__":
    main()
