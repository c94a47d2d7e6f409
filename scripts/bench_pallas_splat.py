"""Real-TPU validation + microbench of the sparse Pallas splat kernels.

Checks the boxes-path (`boxes_to_layout_pallas`) and masks-path
(`masks_to_layout_pallas`) kernels against the dense einsum ops on the
attached TPU (compiled Mosaic, not interpret mode) — forward exactness and
VJP exactness — then times dense vs pallas forward and forward+backward at
the headline bench shapes (B=8, O=16, D=128, 256^2).

Reference math being accelerated: sg2im/layout.py:12-77 (_boxes_to_grid +
grid_sample splat). Run: python -m scripts.bench_pallas_splat
Env: SPLAT_B / SPLAT_O / SPLAT_D / SPLAT_HW / SPLAT_M / SPLAT_ITERS.
"""
from __future__ import annotations

import os
import time

from canonicalsg2im_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from canonicalsg2im_tpu.ops.layout import boxes_to_layout, masks_to_layout  # noqa: E402
from canonicalsg2im_tpu.ops.pallas_splat import (  # noqa: E402
    boxes_to_layout_pallas,
    mask_splat_supported,
    masks_to_layout_pallas,
    splat_supported,
)

B = int(os.environ.get("SPLAT_B", 8))
O = int(os.environ.get("SPLAT_O", 16))
D = int(os.environ.get("SPLAT_D", 128))
HW = int(os.environ.get("SPLAT_HW", 256))
M = int(os.environ.get("SPLAT_M", 16))
ITERS = int(os.environ.get("SPLAT_ITERS", 50))

print(f"backend={jax.default_backend()} B={B} O={O} D={D} HW={HW} M={M}")
assert splat_supported(HW, HW) and mask_splat_supported(HW, HW, D, O, M)

rng = np.random.RandomState(0)
vecs = jnp.asarray(rng.randn(B, O, D).astype(np.float32))
# boxes: xywh in [0,1], a few degenerate/padding rows like real batches have
xy = rng.uniform(0.0, 0.7, size=(B, O, 2))
wh = rng.uniform(0.05, 0.3, size=(B, O, 2))
boxes_np = np.concatenate([xy, wh], axis=-1).astype(np.float32)
boxes_np[:, -2] = [0.2, 0.2, 0.0, 0.0]   # zero-size box
boxes_np[:, -1] = -1.0                   # padding box
boxes = jnp.asarray(boxes_np)
masks = jnp.asarray(rng.rand(B, O, M, M).astype(np.float32))


def sync(x):
    return float(jax.device_get(jnp.sum(x)))


def check(name, a, b, tol):
    d = float(jnp.max(jnp.abs(a - b)))
    scale = float(jnp.max(jnp.abs(b))) or 1.0
    ok = d <= tol * scale
    print(f"  {name}: max|Δ|={d:.3e} (scale {scale:.3e}) "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def timeit(fn, *args):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


ok = True

# ---------------------------------------------------------------- boxes path
dense_fwd = jax.jit(lambda v, bx: boxes_to_layout(v, bx, HW, HW))
pallas_fwd = jax.jit(lambda v, bx: boxes_to_layout_pallas(v, bx, HW, HW))
# On TPU, f32 einsums/dots run at the MXU's default precision (bf16
# passes): dense and pallas agree with a float64 reference to ~2.4e-3
# relative (measured), and with each other to the same level (different
# association order). Interpret mode (CPU) is exact to 1e-6.
TOL = 1e-6 if jax.default_backend() != "tpu" else 6e-3
ok &= check("boxes fwd", pallas_fwd(vecs, boxes), dense_fwd(vecs, boxes),
            TOL)

# tgt rides as an argument (a closed-over constant would be baked into the
# serialized HLO — 33 MB — and trip the compile tunnel's upload limit)
tgt = jnp.asarray(rng.randn(B, HW, HW, D).astype(np.float32))
dense_g = jax.jit(jax.grad(
    lambda v, bx, t: jnp.sum((boxes_to_layout(v, bx, HW, HW) - t) ** 2),
    argnums=(0, 1)))
pallas_g = jax.jit(jax.grad(
    lambda v, bx, t: jnp.sum((boxes_to_layout_pallas(v, bx, HW, HW) - t) ** 2),
    argnums=(0, 1)))
gd, gp = dense_g(vecs, boxes, tgt), pallas_g(vecs, boxes, tgt)
ok &= check("boxes d_vecs", gp[0], gd[0], TOL)
ok &= check("boxes d_boxes", gp[1], gd[1], TOL)

t_d = timeit(dense_fwd, vecs, boxes)
t_p = timeit(pallas_fwd, vecs, boxes)
print(f"  fwd: dense {t_d:.3f} ms, pallas {t_p:.3f} ms "
      f"({t_d / t_p:.2f}x)")
t_dg = timeit(dense_g, vecs, boxes, tgt)
t_pg = timeit(pallas_g, vecs, boxes, tgt)
print(f"  fwd+bwd: dense {t_dg:.3f} ms, pallas {t_pg:.3f} ms "
      f"({t_dg / t_pg:.2f}x)")

# ---------------------------------------------------------------- masks path
real = (jnp.arange(O) < O - 1).astype(jnp.float32)[None, :].repeat(B, 0)
dense_m = jax.jit(lambda v, bx, m: masks_to_layout(
    v, bx, m, HW, HW, real_mask=real))
pallas_m = jax.jit(lambda v, bx, m: masks_to_layout_pallas(
    v * real[..., None], bx, m, HW, HW))
ok &= check("masks fwd", pallas_m(vecs, boxes, masks),
            dense_m(vecs, boxes, masks), TOL)

dense_mg = jax.jit(jax.grad(
    lambda v, bx, m, t: jnp.sum(
        (masks_to_layout(v, bx, m, HW, HW, real_mask=real) - t) ** 2),
    argnums=(0, 1, 2)))
pallas_mg = jax.jit(jax.grad(
    lambda v, bx, m, t: jnp.sum(
        (masks_to_layout_pallas(v * real[..., None], bx, m, HW, HW) - t)
        ** 2),
    argnums=(0, 1, 2)))
gd, gp = dense_mg(vecs, boxes, masks, tgt), pallas_mg(vecs, boxes, masks, tgt)
ok &= check("masks d_vecs", gp[0], gd[0], TOL)
ok &= check("masks d_boxes", gp[1], gd[1], TOL)
ok &= check("masks d_masks", gp[2], gd[2], TOL)

t_d = timeit(dense_m, vecs, boxes, masks)
t_p = timeit(pallas_m, vecs, boxes, masks)
print(f"  fwd: dense {t_d:.3f} ms, pallas {t_p:.3f} ms ({t_d / t_p:.2f}x)")
t_dg = timeit(dense_mg, vecs, boxes, masks, tgt)
t_pg = timeit(pallas_mg, vecs, boxes, masks, tgt)
print(f"  fwd+bwd: dense {t_dg:.3f} ms, pallas {t_pg:.3f} ms "
      f"({t_dg / t_pg:.2f}x)")

print("ALL OK" if ok else "FAILURES above")
raise SystemExit(0 if ok else 1)
