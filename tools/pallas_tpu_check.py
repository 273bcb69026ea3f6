#!/usr/bin/env python
"""Validate the Pallas kernels on REAL TPU hardware: numerics + perf.

Round-1 verdict item 7: ``roi_warp_pallas`` / ``nms_pallas`` had only run in
interpret mode.  This runs both compiled on the device at production shapes,
checks them against the einsum / fixpoint implementations, and times them
with the chained-dispatch methodology (bench.py docstring).

    python tools/pallas_tpu_check.py [--iters 30]

Prints one line per check + a JSON summary; exits nonzero on a numeric
mismatch.
"""

import _init_paths  # noqa: F401
import argparse
import json
import time


def chain_time(fn, args, iters, consume):
    """Steady-state seconds/call via carry-chained dispatches."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry, *a):
        out = fn(*a, carry_in=carry)
        return carry + consume(out) * 1e-9

    zero = jnp.zeros((), jnp.float32)
    float(jax.device_get(step(zero, *args)))  # compile

    def timed(n):
        t0 = time.perf_counter()
        c = zero
        for _ in range(n):
            c = step(c, *args)
        float(jax.device_get(c))
        return time.perf_counter() - t0

    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(iters + 1) for _ in range(3))
    return (tn - t1) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mnc_tpu.ops.nms import nms_fixed
    from mnc_tpu.ops.pallas.nms_kernel import nms_pallas
    from mnc_tpu.ops.pallas.roi_warp_kernel import roi_warp_pallas
    from mnc_tpu.ops.roi_warp import roi_warp

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0]})")
    results = {"backend": backend}

    # ---- roi_warp at production shape: conv5 of the 640x1024 canvas ----
    rs = np.random.RandomState(0)
    feat = jnp.asarray(rs.randn(40, 64, 512).astype(np.float32))
    n = 304
    x1 = rs.uniform(0, 900, n)
    y1 = rs.uniform(0, 550, n)
    rois = np.stack([x1, y1, x1 + rs.uniform(16, 120, n),
                     y1 + rs.uniform(16, 80, n)], 1).astype(np.float32)
    rois = jnp.asarray(rois)

    ein = jax.jit(lambda f, r: roi_warp(f, r, (14, 14), 1 / 16.0, impl="einsum"))
    pal = jax.jit(lambda f, r: roi_warp_pallas(f, r, (14, 14), 1 / 16.0))
    o1 = jax.device_get(ein(feat, rois))
    o2 = jax.device_get(pal(feat, rois))
    diff = float(np.abs(o1 - o2).max())
    rel = diff / (float(np.abs(o1).max()) + 1e-9)
    print(f"roi_warp pallas-vs-einsum maxabs={diff:.3e} rel={rel:.3e}")
    results["roi_warp_maxabs"] = diff
    ok_warp = rel < 1e-3

    def warp_e(f, r, carry_in):
        return ein(f + carry_in * 1e-20, r)

    def warp_p(f, r, carry_in):
        return pal(f + carry_in * 1e-20, r)

    consume = lambda o: jnp.sum(o.astype(jnp.float32))  # noqa: E731
    te = chain_time(warp_e, (feat, rois), args.iters, consume)
    tp = chain_time(warp_p, (feat, rois), args.iters, consume)
    print(f"roi_warp einsum {te * 1e3:.3f} ms   pallas {tp * 1e3:.3f} ms "
          f"(N=304, 40x64x512 -> 14x14)")
    results["roi_warp_ms_einsum"] = round(te * 1e3, 3)
    results["roi_warp_ms_pallas"] = round(tp * 1e3, 3)

    # ---- NMS at the production working set ----
    k = 1024
    bx = rs.uniform(0, 900, k)
    by = rs.uniform(0, 550, k)
    boxes = np.stack([bx, by, bx + rs.uniform(8, 200, k),
                      by + rs.uniform(8, 200, k)], 1).astype(np.float32)
    order = np.argsort(-rs.uniform(size=k))
    boxes = jnp.asarray(boxes[order])
    valid = jnp.ones((k,), bool)

    fx = jax.jit(lambda b, v: nms_fixed(b, v, 0.7))
    px = jax.jit(lambda b, v: nms_pallas(b, v, 0.7))
    k1 = jax.device_get(fx(boxes, valid))
    k2 = jax.device_get(px(boxes, valid))
    same = bool((k1 == k2).all())
    print(f"nms pallas-vs-fixpoint selections identical: {same} "
          f"({int(k1.sum())} kept)")
    results["nms_selections_match"] = same

    def nms_f(b, v, carry_in):
        return fx(b + carry_in * 1e-20, v)

    def nms_p(b, v, carry_in):
        return px(b + carry_in * 1e-20, v)

    consume_b = lambda o: jnp.sum(o.astype(jnp.float32))  # noqa: E731
    tf = chain_time(nms_f, (boxes, valid), args.iters, consume_b)
    tp2 = chain_time(nms_p, (boxes, valid), args.iters, consume_b)
    print(f"nms fixpoint {tf * 1e3:.3f} ms   pallas {tp2 * 1e3:.3f} ms (K=1024)")
    results["nms_ms_fixpoint"] = round(tf * 1e3, 3)
    results["nms_ms_pallas"] = round(tp2 * 1e3, 3)

    # ---- fused paste+binarize at the production shape ----
    from mnc_tpu.ops.masks import paste_masks

    kd, m, canvas = 100, 28, (640, 1024)
    soft = jnp.asarray(rs.uniform(size=(kd, m, m)).astype(np.float32))
    px1 = rs.uniform(0, 900, kd)
    py1 = rs.uniform(0, 550, kd)
    pboxes = np.stack([px1, py1, px1 + rs.uniform(16, 300, kd),
                       py1 + rs.uniform(16, 200, kd)], 1).astype(np.float32)
    pboxes = jnp.asarray(pboxes)

    pe = jax.jit(lambda s, b: paste_masks(s, b, canvas, 0.4, impl="einsum"))
    pp = jax.jit(lambda s, b: paste_masks(s, b, canvas, 0.4, impl="pallas"))
    b1 = jax.device_get(pe(soft, pboxes))
    b2 = jax.device_get(pp(soft, pboxes))
    # the einsum path binarizes a bf16 product, the kernel an f32 one —
    # disagreement is only legal within bf16 eps of the 0.4 threshold
    mism = float((b1 != b2).mean())
    print(f"paste pallas-vs-einsum bool mismatch frac={mism:.2e} "
          f"(bf16-vs-f32 threshold pixels only)")
    results["paste_mismatch_frac"] = mism
    ok_paste = mism < 1e-3

    def paste_e(s, b, carry_in):
        return pe(s + carry_in * 1e-20, b)

    def paste_p(s, b, carry_in):
        return pp(s + carry_in * 1e-20, b)

    tpe = chain_time(paste_e, (soft, pboxes), args.iters, consume)
    tpp = chain_time(paste_p, (soft, pboxes), args.iters, consume)
    print(f"paste einsum {tpe * 1e3:.3f} ms   pallas {tpp * 1e3:.3f} ms "
          f"(K={kd}, {m}x{m} -> {canvas[0]}x{canvas[1]})")
    results["paste_ms_einsum"] = round(tpe * 1e3, 3)
    results["paste_ms_pallas"] = round(tpp * 1e3, 3)

    # ---- fused block 1 at the shipped canvas (VERDICT r4 item 2) ----
    from mnc_tpu.ops.pallas.block1_kernel import (block1_reference,
                                                  fused_block1)

    h, wc = 640, 1024
    bw1 = jnp.asarray(rs.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    bb1 = jnp.asarray(rs.randn(64).astype(np.float32))
    bw2 = jnp.asarray(rs.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    bb2 = jnp.asarray(rs.randn(64).astype(np.float32))
    img1 = jnp.asarray(rs.randn(1, h, wc, 3).astype(np.float32) * 50)

    bref = jax.jit(lambda x: block1_reference(x, bw1, bb1, bw2, bb2))
    bfus = jax.jit(lambda x: fused_block1(x, bw1, bb1, bw2, bb2, 2))
    r1 = np.asarray(jax.device_get(bref(img1)), np.float32)
    r2 = np.asarray(jax.device_get(bfus(img1)), np.float32)
    ulp = 2.0 ** -7  # bf16 mantissa ulp (test_block1_kernel tolerance)
    dev = np.abs(r1 - r2) / np.maximum(np.abs(r1), 1.0)
    ok_b1 = bool((dev <= ulp).all())
    print(f"fused_block1 vs XLA at {h}x{wc}: max rel dev {dev.max():.3e} "
          f"(tol 1 bf16 ulp = {ulp:.3e}) -> {'OK' if ok_b1 else 'MISMATCH'}")
    results["block1_max_rel_dev"] = float(dev.max())
    results["block1_exact_ok"] = ok_b1
    # PARKED (r5): compiled-mode Mosaic output diverges from interpret mode
    # (which matches the oracle to 1 ulp), tph=4 OOMs scoped VMEM at W=1024,
    # and tph=2 is 1.7x slower than XLA block 1 — NET.FUSED_BLOCK1 stays
    # False and block1 status is reported without failing the check.  If a
    # platform update makes this section print OK and the timing win, the
    # kernel can be un-parked (ops/pallas/block1_kernel.py docstring).
    results["block1_parked"] = True

    img16 = jnp.asarray(rs.randn(16, h, wc, 3).astype(np.float32) * 50)

    def b1_ref(x, carry_in):
        return bref(x + carry_in * 1e-20)

    def b1_fus(x, carry_in):
        return bfus(x + carry_in * 1e-20)

    tb_ref = chain_time(b1_ref, (img16,), args.iters, consume)
    tb_fus = chain_time(b1_fus, (img16,), args.iters, consume)
    print(f"block1 XLA {tb_ref * 1e3:.3f} ms   pallas {tb_fus * 1e3:.3f} ms "
          f"(batch 16, {h}x{wc}; per-img {tb_ref / 16 * 1e3:.3f} vs "
          f"{tb_fus / 16 * 1e3:.3f} ms)")
    results["block1_ms_xla_b16"] = round(tb_ref * 1e3, 3)
    results["block1_ms_pallas_b16"] = round(tb_fus * 1e3, 3)

    ok = ok_warp and same and ok_paste  # block1 is parked, reported above
    results["ok"] = ok
    print(json.dumps(results))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
