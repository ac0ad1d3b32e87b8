"""Quantify the rasterizer's static-shape truncation error at the training
shape (VERDICT r3 item #8).

The kernel caps per-tile lists at K=4096 and clamps each gaussian's tile
footprint to a (slots_y, slots_x) slot grid (render/rasterizer.py
_tile_ranges / bin_gaussians_count) — both truncations are asserted benign
("farthest gaussians are occluded in practice") but were never measured.
This test renders a dense model-scale scene — one gaussian per pixel of two
256^2 context views, G = 131072, like SIU3RModel emits (reference
src/models/siu3r.py decodes per-pixel gaussians) — through the production
``rasterize`` path at its defaults, against an EXACT dense compositor (no
tiling, no K cap, no slot clamp), and reports:

  * max / mean absolute color error and alpha error,
  * the tile-overflow rate (tiles whose candidate list exceeded K),
  * the footprint-clamp rate (gaussians whose 3-sigma tile box was cut by
    the slot grid),

so the eval-metric error budget (PSNR within 1% of the reference) has a
measured rasterizer line item. The dense oracle is strip-chunked in numpy —
the [G, H, W] dense form is 34 GB at this shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siu3r_tpu.gaussians import build_covariance
from siu3r_tpu.render.projection import project_gaussians
from siu3r_tpu.render.rasterizer import (
    _ALPHA_MAX,
    _ALPHA_MIN,
    TILE_H,
    TILE_W,
    _tile_ranges,
    rasterize,
)


def make_model_scale_scene(h=256, w=256, n_views=2, seed=0):
    """Per-pixel gaussians for ``n_views`` context views: depths off a noisy
    fronto-parallel surface per view, pixel-scale footprints, mid opacities
    — the regime the gaussian head emits after its sigmoid/softplus
    squashers (models/gaussian_adapter.py)."""
    rng = np.random.RandomState(seed)
    fx = 318.0
    gs = []
    for v in range(n_views):
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        depth = 2.5 + 0.8 * v + 0.3 * np.sin(xx / 37.0) + rng.randn(h, w) * 0.05
        x = (xx + 0.5 - w / 2) / fx * depth + 0.1 * v
        y = (yy + 0.5 - h / 2) / fx * depth
        means = np.stack([x, y, depth], -1).reshape(-1, 3)
        # ~1-2 px footprint at this depth: scale ≈ px_size * depth
        base = depth.reshape(-1) / fx
        scales = np.stack([base, base, base], -1) * rng.uniform(
            0.6, 2.0, (h * w, 3)
        )
        quats = rng.randn(h * w, 4)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        opac = 1.0 / (1.0 + np.exp(-rng.randn(h * w) * 2.0))
        colors = rng.rand(h * w, 3)
        gs.append((means, scales, quats, opac, colors))
    means, scales, quats, opac, colors = (
        np.concatenate([g[i] for g in gs]) for i in range(5)
    )
    covs = build_covariance(jnp.asarray(scales, jnp.float32), jnp.asarray(quats, jnp.float32))
    return (
        jnp.asarray(means, jnp.float32),
        covs,
        jnp.asarray(opac, jnp.float32),
        jnp.asarray(colors, jnp.float32),
    )


def exact_composite_strips(proj, opac, colors, h, w, strip=16):
    """Exact dense compositor (numpy, strip-chunked): global front-to-back
    over ALL gaussians, no tile binning, no K cap, no footprint clamp.
    Mirrors rasterize_reference's math (rasterizer.py:584-614)."""
    order = np.argsort(np.asarray(proj.depth), kind="stable")
    mean2d = np.asarray(proj.mean2d)[order]
    conic = np.asarray(proj.conic)[order]
    depth = np.asarray(proj.depth)[order]
    radius = np.asarray(proj.radius)[order]
    op = np.asarray(opac)[order]
    col = np.asarray(colors)[order]
    alive = radius > 0

    img = np.zeros((h, w, col.shape[-1]), np.float32)
    dimg = np.zeros((h, w), np.float32)
    aimg = np.zeros((h, w), np.float32)
    xs = np.arange(w, dtype=np.float32)
    for y0 in range(0, h, strip):
        rows = np.arange(y0, min(y0 + strip, h), dtype=np.float32)
        # strip prefilter: keep gaussians whose vertical 3-sigma box
        # intersects the strip (selection only — order is preserved, and the
        # dropped gaussians have exactly-zero alpha on these rows per the
        # radius test the oracle math applies anyway)
        sel = alive & (mean2d[:, 1] + radius >= rows[0]) & (
            mean2d[:, 1] - radius <= rows[-1]
        )
        m2, cn, dp, o_, c_ = mean2d[sel], conic[sel], depth[sel], op[sel], col[sel]
        dx = xs[None, None, :] - m2[:, 0, None, None]
        dy = rows[None, :, None] - m2[:, 1, None, None]
        power = (
            -0.5 * (cn[:, 0, None, None] * dx * dx + cn[:, 2, None, None] * dy * dy)
            - cn[:, 1, None, None] * dx * dy
        )
        alpha = np.minimum(o_[:, None, None] * np.exp(power), _ALPHA_MAX)
        alpha[alpha < _ALPHA_MIN] = 0.0
        trans = np.cumprod(1.0 - alpha, axis=0)
        trans = np.concatenate([np.ones_like(trans[:1]), trans[:-1]], axis=0)
        wgt = (trans * alpha).astype(np.float32)
        img[y0 : y0 + len(rows)] = np.einsum("ghw,gc->hwc", wgt, c_)
        dimg[y0 : y0 + len(rows)] = np.einsum("ghw,g->hw", wgt, dp)
        aimg[y0 : y0 + len(rows)] = 1.0 - np.prod(1.0 - alpha, axis=0)
    return img, dimg, aimg


@pytest.mark.slow
def test_truncation_error_at_training_shape():
    h, w = 256, 256
    k_cap, slots_y, slots_x = 4096, 4, 2
    means, covs, opac, colors = make_model_scale_scene(h, w)
    assert means.shape[0] == 131072

    viewmat = jnp.eye(4)[None]
    intr = jnp.array([[[318.0, 0, w / 2], [0, 318.0, h / 2], [0, 0, 1.0]]])

    proj = project_gaussians(means, covs, viewmat[0], intr[0], (h, w), 0.2, 1000.0)
    img, dimg, aimg = exact_composite_strips(proj, opac, colors, h, w)

    def run_kernel(cap):
        color, depth, alpha = jax.jit(
            lambda: rasterize(
                means, covs, opac, colors, viewmat, intr, (h, w),
                max_per_tile=cap, slots_y=slots_y, slots_x=slots_x,
            )
        )()
        return map(np.asarray, (color, depth, alpha))

    color, depth, alpha = run_kernel(k_cap)

    # --- truncation statistics ---------------------------------------
    n_ty, n_tx = -(-h // TILE_H), -(-w // TILE_W)
    order = jnp.argsort(proj.depth)
    proj_sorted = jax.tree.map(lambda a: a[order], proj)
    y0s, y1s, x0s, x1s, alive = _tile_ranges(proj_sorted, n_ty, n_tx, slots_y, slots_x)
    # unclamped footprint for the clamp-rate stat
    u, v_, r = proj_sorted.mean2d[:, 0], proj_sorted.mean2d[:, 1], proj_sorted.radius
    fy1 = jnp.clip(jnp.floor((v_ + r) / TILE_H), 0, n_ty - 1).astype(jnp.int32)
    fx1 = jnp.clip(jnp.floor((u + r) / TILE_W), 0, n_tx - 1).astype(jnp.int32)
    clamped = np.asarray(((fy1 > y1s) | (fx1 > x1s)) & alive)
    ty = jnp.arange(n_ty, dtype=jnp.int32)
    tx = jnp.arange(n_tx, dtype=jnp.int32)
    in_y = (y0s[None, :] <= ty[:, None]) & (ty[:, None] <= y1s[None, :])
    in_x = (x0s[None, :] <= tx[:, None]) & (tx[:, None] <= x1s[None, :])
    raw_counts = np.asarray(
        (in_y[:, None, :] & in_x[None, :, :] & alive[None, None, :])
        .reshape(n_ty * n_tx, -1)
        .sum(-1)
    )
    overflow_rate = float((raw_counts > k_cap).mean())
    clamp_rate = float(clamped.mean())

    color_err = np.abs(color[0] - img)
    alpha_err = np.abs(alpha[0] - aimg)
    depth_err = np.abs(depth[0] - dimg)
    p999 = float(np.quantile(color_err, 0.999))
    print(
        f"\n[truncation @ G=131072, K={k_cap}] "
        f"color err max={color_err.max():.4g} p99.9={p999:.4g} "
        f"mean={color_err.mean():.4g}; "
        f"alpha err max={alpha_err.max():.4g}; depth err max={depth_err.max():.4g}; "
        f"tile overflow {overflow_rate:.1%} (raw counts max {raw_counts.max()}); "
        f"footprint clamped {clamp_rate:.2%}"
    )

    # error budget: PSNR is MSE-based, so the MEAN and near-tail deviations
    # are what a 1%-PSNR budget constrains (~0.03 mean pixel deviation at
    # PSNR 25); isolated single-pixel outliers (measured max 0.069 — a
    # worst-case tile whose K-cap cut a still-visible far gaussian)
    # contribute ~1e-7 to the MSE and are bounded loosely.
    #
    # NOTE on overflow: measured 100% of tiles exceed K=4096 raw (max 7456
    # candidates) at this density and the error is STILL ~1.6e-4 mean —
    # the cap cuts the FARTHEST gaussians, which the front ones occlude
    # (transmittance has saturated). Overflow rate is a capacity statistic,
    # not an error proxy; the asserts bound the error itself.
    assert color_err.mean() < 2e-3, f"mean color err {color_err.mean()}"
    assert p999 < 0.02, f"p99.9 color err {p999}"
    assert color_err.max() < 0.15, f"max color err {color_err.max()}"
    assert float(np.quantile(alpha_err, 0.999)) < 0.02
    assert overflow_rate <= 1.0  # reported above; error asserts are the gate

    # K=2048 A/B — measured NEGATIVE result, kept as a tripwire: halving
    # the cap would halve the compositing chunks, but at this density the
    # raw per-tile candidate lists run to ~7456 and K=2048 cuts VISIBLE
    # gaussians (measured mean color err 0.12, p99.9 0.81 — vs 1.6e-4 at
    # K=4096). The cap must stay at 4096 for model-scale scenes; perf work
    # goes to the compositing kernel, not the list length.
    color2, depth2, alpha2 = run_kernel(2048)
    err2 = np.abs(color2[0] - img)
    p999_2 = float(np.quantile(err2, 0.999))
    print(
        f"[truncation @ K=2048] color err max={err2.max():.4g} "
        f"p99.9={p999_2:.4g} mean={err2.mean():.4g}; "
        f"alpha err max={np.abs(alpha2[0] - aimg).max():.4g}"
    )
    assert err2.mean() > 0.01, (
        "K=2048 unexpectedly fits the budget now "
        f"(mean err {err2.mean():.4g}) — the cap could be lowered"
    )
