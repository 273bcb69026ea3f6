#!/usr/bin/env python
"""Hardware stress sweep over the serving canvas-bucket set (VERDICT r4
item 3).

Round 3 bisected a TPU-worker kernel fault to a gather composition at one
canvas grid (batch-8 608×816, 38×51 conv5 grid) and dodged it structurally
(models/mnc.py: optimization_barrier + presorted NMS + lax.map propose).
This sweep PROVES the shipped (dodged) program is crash-free on every
serving bucket: it compiles and executes the real single-image and batch
detect programs at each bucket × orientation on the real TPU.

Each bucket runs in its own subprocess (one TPU client at a time, bounded
by --timeout) so a fault is recorded as that bucket's failure instead of
killing the sweep.  Results append to --append as one JSON line per
(canvas, batch).

    python tools/canvas_stress_sweep.py --append docs/results/canvas_sweep_r5.jsonl

The companion ``tools/fault_repro.py`` runs the ORIGINAL (un-dodged)
composition at the known-bad bucket to re-test the platform after updates.
"""

import _init_paths  # noqa: F401
import argparse
import json
import os
import subprocess
import sys
import time

# The shipped serving set: primary canvas, the round-3 serving buckets
# (docs/results/stream_r3.jsonl — includes the known-fault 608×816 grid),
# and the config.py example buckets.  Transposes (TEST.AUTO_PORTRAIT) are
# added by the sweep.
DEFAULT_BUCKETS = [(640, 1024), (608, 816), (608, 912), (512, 864),
                   (480, 640)]


def run_one(h: int, w: int, batch: int, pre_nms: int, params_path: str):
    """Compile + execute the shipped detect program at one canvas. Exits 0
    on success; any TPU fault surfaces as a nonzero exit of this process."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg
    from mnc_tpu.utils.checkpoint import load_npz

    arch = MNCArch(
        canvas=(h, w), anchor_scales=(8, 16, 32), num_classes=6,
        mask_size=28, warp_hw=14, n_stages=5, fc_dim=4096, mask_fc_dim=256,
        pre_nms_top_n=pre_nms, post_nms_top_n=304, rpn_min_size=16.0,
        trunk_frozen=0,
    )
    params = jax.device_put(load_npz(params_path))
    pipe = MNCPipeline(MNC(arch=arch), params,
                       PostCfg(dets_per_class=16, max_per_image=100,
                               vote_top_k=64, score_thresh=0.01))
    rs = np.random.RandomState(0)
    t0 = time.time()
    if batch == 1:
        img = rs.randint(0, 255, (h, w, 3), np.uint8)
        out = pipe.detect(img, auto_orient=False)
        n = int(np.asarray(out["valid"]).sum())
    else:
        imgs = [rs.randint(0, 255, (h, w, 3), np.uint8)
                for _ in range(batch)]
        outs = pipe.detect_many(imgs, batch_size=batch, auto_orient=False)
        n = sum(int(np.asarray(o["valid"]).sum()) for o in outs)
    # second dispatch: steady-state execute (compile amortized out)
    t1 = time.time()
    if batch == 1:
        pipe.detect(rs.randint(0, 255, (h, w, 3), np.uint8),
                    auto_orient=False)
    else:
        pipe.detect_many([rs.randint(0, 255, (h, w, 3), np.uint8)
                          for _ in range(batch)], batch_size=batch,
                         auto_orient=False)
    t2 = time.time()
    print(json.dumps({"canvas": [h, w], "batch": batch, "ok": True,
                      "dets": n, "first_pass_s": round(t1 - t0, 1),
                      "steady_s": round(t2 - t1, 3)}), flush=True)


def make_random_params(path: str):
    """Init the sweep arch with random weights on CPU and save to ``path``.

    The sweep proves compile+execute crash-freeness of the program — weight
    VALUES are irrelevant to the fault class (a gather composition bisected
    at the 608×816 grid), so a random init lets the sweep run when no trained
    flagship checkpoint is on disk (output/ is not version-controlled)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.utils.checkpoint import save_npz

    arch = MNCArch(canvas=(640, 1024), anchor_scales=(8, 16, 32),
                   num_classes=6, mask_size=28, warp_hw=14, n_stages=5,
                   fc_dim=4096, mask_fc_dim=256, pre_nms_top_n=6000,
                   post_nms_top_n=304, rpn_min_size=16.0, trunk_frozen=0)
    model = MNC(arch=arch)
    # eval_shape instead of init: a real init executes a full forward
    # (minutes on a 1-core CPU at this canvas); shapes + small random fills
    # are all the sweep needs.
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((640, 1024, 3), jnp.float32),
                            jnp.array([640.0, 1024.0, 1.0]))
    rs = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: (0.05 * rs.randn(*s.shape)).astype(s.dtype), shapes)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_npz(path, params)
    print(f"random-init params -> {path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="output/flagship_r5/e2e_params.npz")
    ap.add_argument("--init-random", action="store_true",
                    help="if --params is missing, save a random init there "
                         "(crash-freeness does not depend on weight values)")
    ap.add_argument("--pre-nms", type=int, default=6000,
                    help="shipped TEST working set")
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 8])
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-bucket subprocess timeout (first compile of a "
                         "6000-wide tiled NMS variant takes minutes)")
    ap.add_argument("--append", default=None)
    ap.add_argument("--one", type=int, nargs=3, metavar=("H", "W", "BATCH"),
                    help="internal: run a single bucket in-process")
    args = ap.parse_args()

    if args.one:
        run_one(args.one[0], args.one[1], args.one[2], args.pre_nms,
                args.params)
        return

    if args.init_random and not os.path.exists(args.params):
        # generate in a subprocess so the parent never initializes a backend
        subprocess.run([sys.executable, "-c",
                        "import sys; sys.path.insert(0, %r); "
                        "import _init_paths; "
                        "from canvas_stress_sweep import make_random_params; "
                        "make_random_params(%r)"
                        % (os.path.dirname(os.path.abspath(__file__)),
                           args.params)],
                       check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})

    canvases = list(DEFAULT_BUCKETS)
    canvases += [(w, h) for h, w in canvases]  # portrait orientations
    canvases = list(dict.fromkeys(canvases))

    results = []
    for (h, w) in canvases:
        for batch in args.batches:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--one", str(h), str(w), str(batch),
                   "--pre-nms", str(args.pre_nms), "--params", args.params]
            t0 = time.time()
            try:
                proc = subprocess.run(cmd, capture_output=True, text=True,
                                      timeout=args.timeout)
                line = proc.stdout.strip().splitlines()[-1] if \
                    proc.stdout.strip() else ""
                if proc.returncode == 0 and line.startswith("{"):
                    rec = json.loads(line)
                else:
                    rec = {"canvas": [h, w], "batch": batch, "ok": False,
                           "exit": proc.returncode,
                           "tail": proc.stderr.strip()[-400:]}
            except subprocess.TimeoutExpired:
                rec = {"canvas": [h, w], "batch": batch, "ok": False,
                       "exit": "timeout", "timeout_s": args.timeout}
            rec["wall_s"] = round(time.time() - t0, 1)
            rec["pre_nms"] = args.pre_nms
            print(json.dumps(rec), flush=True)
            results.append(rec)
            if args.append:
                with open(args.append, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    n_ok = sum(r["ok"] for r in results)
    print(f"\n{n_ok}/{len(results)} bucket×batch programs crash-free")
    raise SystemExit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
