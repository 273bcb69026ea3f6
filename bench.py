"""End-to-end 5-stage inference benchmark (the BASELINE.json headline metric).

Measures steady-state images/sec of the FULL pipeline — VGG-16 trunk → RPN →
on-device NMS → RoI warp → mask → mask-pool → classify → bridge → second pass
→ per-class NMS → mask voting → canvas paste-back — batched, bfloat16, on one
chip.  Prints ONE JSON line:

    {"metric": "five_stage_inference_img_per_sec", "value": N,
     "unit": "img/s", "vs_baseline": N / 2.8}

vs_baseline is against the reference's ~2.8 img/s (≈360 ms/image, VGG-16
5-stage on the K40 it shipped on — BASELINE.md).  The BASELINE.json target is
>100 img/s/chip on TPU v5e.

Timing methodology: the remote (axon-tunnel) TPU platform neither blocks in
``block_until_ready`` nor transfers large arrays at useful speed, so the
benchmark chains N asynchronous pipeline dispatches — each step's scalar
carry (a full reduction over EVERY output, so nothing is dead-code-
eliminated) is folded into the next step's input, forcing sequential device
execution — then fetches one final scalar.  Steady-state step time =
(t(N+1 steps) - t(1 step)) / N.  Validated against a known-FLOPs matmul
chain (185 TFLOP/s measured vs ~197 peak bf16 on v5e).

Flags: --batch N (default 8), --iters N (default 10), --stages {3,5},
--no-paste, --no-merge, --cpu (debug).
"""

from __future__ import annotations

import argparse
import json
import os
import threading
import time

import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_CACHE.json")

# Chip peaks for roofline accounting (dense peak per chip; bf16 matmul
# TFLOP/s, HBM GB/s).  v5e: 197 bf16 TFLOP/s (394 int8 TOPS), 819 GB/s.
_CHIP_PEAKS = {
    "v5e": (197e12, 819e9),
    "v5 lite": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6e": (918e12, 1640e9),
    "v6 lite": (918e12, 1640e9),
}


def _chip_peaks(device) -> tuple[float, float, str]:
    kind = getattr(device, "device_kind", "").lower()
    for key, peaks in _CHIP_PEAKS.items():
        if key in kind:
            return (*peaks, key)
    return (*_CHIP_PEAKS["v5e"], f"unknown({kind})-assuming-v5e")


def _cost_analysis(compiled) -> tuple[float, float]:
    """(flops, bytes_accessed) of a compiled XLA executable; 0.0 if the
    backend doesn't report a field.  Handles both dict and [dict] returns."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return 0.0, 0.0
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return flops, byts


def _fallback_record(why: str) -> dict:
    """A record for when no fresh device measurement could be taken.

    Deliberately uses a DISTINCT metric name (``..._cached`` / ``..._failed``)
    so downstream consumers can never mistake a stale/absent number for a
    fresh one (BENCH_CACHE.json is machine-local and untracked)."""
    try:
        with open(_CACHE) as f:
            rec = json.load(f)
        rec["metric"] = rec.get("metric", "five_stage_inference_img_per_sec") + "_cached"
        rec["note"] = f"{why}; cached prior same-machine measurement"
    except Exception:
        rec = {"metric": "five_stage_inference_img_per_sec_failed", "value": 0.0,
               "unit": "img/s", "vs_baseline": 0.0,
               "note": f"{why}; no cached measurement"}
    return rec


def _watchdog(seconds: float):
    """The tunneled TPU can wedge (stale device grant) and hang every call;
    rather than stalling the driver, emit the last good measurement, marked."""

    def fire():
        print(json.dumps(_fallback_record("device hang (watchdog fired)")), flush=True)
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    """Never lets an exception escape: the driver must always get one JSON
    line and rc=0, fresh if the device works, clearly-marked fallback if not
    (round-1 lesson: a backend-init RuntimeError escaped -> rc=1, no output)."""
    try:
        _bench()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 - deliberate catch-all
        import traceback

        traceback.print_exc()
        print(json.dumps(_fallback_record(f"bench raised {type(e).__name__}: {e}")),
              flush=True)


def _bench():
    ap = argparse.ArgumentParser()
    # batch 16 is the measured steady-state sweet spot at the reference 6000
    # working set (v5e, same-day pairs: b8 105.8 / b16 108.0 img/s; int8:
    # b16 115.7); throughput is img/s/chip so batch is a fair serving knob.
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", type=int, default=5, choices=(3, 5))
    ap.add_argument("--no-paste", action="store_true")
    ap.add_argument("--no-merge", action="store_true")
    ap.add_argument("--vote-both", action="store_true",
                    help="pool first-pass detections as voting candidates "
                         "(PostCfg.vote_both_passes)")
    ap.add_argument("--trunk", default=None, choices=(None, "vgg16", "resnet50", "resnet101"))
    ap.add_argument("--int8", action="store_true",
                    help="int8 MXU inference path (TEST.INT8 / ops/quant.py); "
                         "metric gets an _int8 suffix")
    ap.add_argument("--set", dest="set_cfgs", nargs="*", default=None,
                    help="cfg overrides, e.g. --set TEST.RPN_PRE_NMS_TOP_N 6000 "
                         "STATIC.TEST_PRE_NMS_TOP_N 6000 (non-headline: "
                         "metric gets a _cfg suffix, cache untouched)")
    ap.add_argument("--mfu", action="store_true",
                    help="roofline accounting: FLOPs + HBM bytes of the "
                         "compiled program (XLA cost analysis), achieved "
                         "TFLOP/s + GB/s vs chip peaks, and which wall the "
                         "program sits against (extra keys in the JSON line)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--watchdog", type=float,
                    default=float(os.environ.get("MNC_BENCH_TIMEOUT", 2400)))
    args = ap.parse_args()
    if args.vote_both and args.stages != 5:
        ap.error("--vote-both requires --stages 5 (first-pass pooling "
                 "only exists in the 5-stage cascade)")

    wd = _watchdog(args.watchdog)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from mnc_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from mnc_tpu.config import cfg_from_list
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.pipeline.inference import PostCfg, postprocess_detections

    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    over = dict(n_stages=args.stages)
    if args.trunk:
        over["trunk"] = args.trunk
    if args.int8:
        over["int8_inference"] = True
    arch = MNCArch.from_cfg(train=False, **over)
    post = PostCfg.from_cfg(
        dets_per_class=16,
        paste=not args.no_paste,
        use_mask_merge=not args.no_merge,
        vote_both_passes=args.vote_both,
    )
    model = MNC(arch=arch)

    img0 = jnp.zeros((*arch.canvas, 3), jnp.float32)
    info0 = jnp.array([arch.canvas[0], arch.canvas[1], 1.0], jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img0, info0)

    from mnc_tpu.models.mnc import MNC as _MNC

    from mnc_tpu.pipeline.inference import vote_candidates

    def run_batch(params, images, im_infos):
        out = model.apply(params, images, im_infos, method=_MNC.apply_batch)
        r, v, c, m = vote_candidates(out, post, arch.n_stages, axis=1)
        return jax.vmap(
            lambda r_, v_, c_, m_: postprocess_detections(r_, v_, c_, m_, post,
                                                          arch.canvas)
        )(r, v, c, m)

    rs = np.random.RandomState(0)
    images = jnp.asarray(
        rs.randn(args.batch, *arch.canvas, 3).astype(np.float32) * 30.0)
    infos = jnp.tile(info0, (args.batch, 1))

    @jax.jit
    def step(params, images, infos, carry):
        # fold the carry into the input: forces sequential execution across
        # chained dispatches and defeats loop-invariant hoisting/caching
        imgs = images + carry * 1e-20
        out = run_batch(params, imgs, infos)
        # consume EVERY output so nothing is dead-code-eliminated
        s = sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(out))
        return carry + s * 1e-9

    zero = jnp.zeros((), jnp.float32)
    t_compile = time.perf_counter()
    float(jax.device_get(step(params, images, infos, zero)))
    compile_s = time.perf_counter() - t_compile

    flops = byts = 0.0
    if args.mfu:
        compiled = step.lower(params, images, infos, zero).compile()
        flops, byts = _cost_analysis(compiled)

    def timed(n):
        t0 = time.perf_counter()
        carry = zero
        for _ in range(n):
            carry = step(params, images, infos, carry)
        float(jax.device_get(carry))
        return time.perf_counter() - t0

    timed(1)  # warm transfer path
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(args.iters + 1) for _ in range(3))
    per_step = (tn - t1) / args.iters
    img_s = args.batch / per_step

    wd.cancel()
    metric = ("five_stage_inference_img_per_sec" if args.stages == 5
              else "three_stage_inference_img_per_sec")
    if args.vote_both:
        metric += "_voteboth"
    if args.int8:
        metric += "_int8"
    if args.trunk and args.trunk != "vgg16":
        metric += f"_{args.trunk}"
    if args.set_cfgs:
        metric += "_cfg"
    if args.no_paste or args.no_merge:
        metric += "_nopost"
    rec = {
        "metric": metric,
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / 2.8, 2),
    }
    if args.mfu and flops > 0:
        peak_flops, peak_bw, chip = _chip_peaks(jax.devices()[0])
        ach_flops = flops / per_step
        ach_bw = byts / per_step
        intensity = flops / max(byts, 1.0)  # FLOP/byte of the program
        ridge = peak_flops / peak_bw  # chip FLOP/byte balance point
        rec.update({
            "chip": chip,
            "gflop_per_img": round(flops / args.batch / 1e9, 2),
            "hbm_gb_per_img": round(byts / args.batch / 1e9, 3),
            "achieved_tflops": round(ach_flops / 1e12, 1),
            "mfu_pct": round(100 * ach_flops / peak_flops, 1),
            "achieved_hbm_gbps": round(ach_bw / 1e9, 1),
            "hbm_util_pct": round(100 * ach_bw / peak_bw, 1),
            "arith_intensity": round(intensity, 1),
            "roofline_bound": ("compute" if intensity > ridge else "memory"),
        })
    headline = (args.stages == 5 and not args.vote_both and not args.trunk
                and not args.set_cfgs and not args.no_paste
                and not args.no_merge)
    if headline and jax.default_backend() == "tpu":  # cache hardware headline only
        try:
            with open(_CACHE, "w") as f:
                json.dump(rec, f)
        except OSError:
            pass
    if args.verbose:
        print(f"# device={jax.devices()[0]} canvas={arch.canvas} "
              f"batch={args.batch} compile={compile_s:.1f}s "
              f"t1={t1 * 1e3:.1f}ms t{args.iters + 1}={tn * 1e3:.1f}ms "
              f"step={per_step * 1e3:.2f}ms")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
