"""One-command real-data parity check vs the Caffe-MNC reference.

≙ the missing piece of the reference workflow ``fetch data → fetch model →
tools/test_net.py → compare the README AP table`` (SURVEY §8 checklist;
``tools/test_net.py†``).  The day VOC/SBD data and the released
``.caffemodel`` appear, parity is one command:

    python tools/reference_parity.py \\
        --sbd-root /path/to/sbd --caffemodel /path/to/mnc_model.caffemodel.h5

which runs the full import → test_net → AP-table pipeline (as a subprocess —
the exact CLI a user would run), parses the printed mAP^r line, and diffs
against the expected reference numbers (BASELINE.md) at the BASELINE.json
tolerance (within 0.3 pts).  Exit 0 = parity, 1 = out of tolerance,
2 = pipeline failure.

``--dry-run`` proves the plumbing TODAY (zero-egress sandbox): it builds a
miniature byte-faithful SBD tree (scipy.io.savemat GTinst/GTcls structs +
jpgs — the same shape as tests/test_real_data.py's fixtures), runs the
IDENTICAL command path with random weights on CPU, and exercises the parse +
diff machinery (expected := measured, so the dry run passes iff the pipeline
runs end-to-end).

Expected values default to the paper's 5-stage VGG-16 row (63.5 / 41.5,
high/medium-high confidence); pass ``--released`` for the recalled README
released-model row (65.0 / 46.3, LOW confidence — re-read the real README
before trusting a failure against it).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import re
import subprocess
import sys
import tempfile

import _init_paths  # noqa: F401

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

PAPER_EXPECTED = {"0.5": 63.5, "0.7": 41.5}      # CVPR16 paper, 5-stage VGG-16
RELEASED_EXPECTED = {"0.5": 65.0, "0.7": 46.3}   # README† recall — LOW confidence


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sbd-root", default=None,
                    help="SBD root (contains benchmark_RELEASE/dataset and "
                         "val.txt); default cfg.DATA_DIR/sbd")
    ap.add_argument("--caffemodel", default=None,
                    help="released reference weights (.caffemodel/.h5)")
    ap.add_argument("--npz", default=None, help="alternative: npz weights")
    ap.add_argument("--imdb", default="voc_2012_seg_val")
    ap.add_argument("--cfg", default="experiments/cfgs/mnc_5stage.yml")
    ap.add_argument("--tol", type=float, default=0.3,
                    help="max |measured - expected| in mAP points "
                         "(BASELINE.json target: 0.3)")
    ap.add_argument("--released", action="store_true",
                    help="diff against the released-model README row "
                         "(65.0/46.3 — LOW-confidence recall) instead of the "
                         "paper row (63.5/41.5)")
    ap.add_argument("--expected", nargs=2, type=float, default=None,
                    metavar=("AP50", "AP70"), help="override expected values")
    ap.add_argument("--cache", default="output/parity/detections.pkl")
    ap.add_argument("--dry-run", action="store_true",
                    help="run the identical pipeline on a generated "
                         "miniature SBD with random weights (plumbing proof)")
    ap.add_argument("--fabricate", choices=("proto", "h5"), default=None,
                    help="with --dry-run: fabricate a FULL-SIZE fake "
                         ".caffemodel (recalled layer names, VGG-16 shapes, "
                         "MASK_SIZE 28) and run the real import → "
                         "auto-config → test_net path against it — the "
                         "parity-day full-dress rehearsal")
    ap.add_argument("--fabricate-rename", nargs="*", default=[],
                    metavar="OLD=NEW",
                    help="misname layers in the fabricated file (rehearses "
                         "the shape-fallback / --remap seam)")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra args passed through to tools/test_net.py")
    return ap.parse_args()


def build_mini_sbd(root: str, n_images: int = 4, hw=(96, 128)) -> None:
    """Byte-faithful miniature SBD tree: GTinst/GTcls .mat structs + jpgs."""
    import numpy as np
    from scipy.io import savemat

    try:
        import cv2
    except ImportError:  # pragma: no cover
        cv2 = None
    ds = osp.join(root, "benchmark_RELEASE", "dataset")
    for d in ("inst", "cls", "img"):
        os.makedirs(osp.join(ds, d), exist_ok=True)
    rs = np.random.RandomState(0)
    ids = []
    h, w = hw
    for i in range(n_images):
        index = f"2008_{i:06d}"
        ids.append(index)
        inst = np.zeros((h, w), np.uint8)
        clsm = np.zeros((h, w), np.uint8)
        for k in range(1, 3):
            y0, x0 = rs.randint(0, h - 40), rs.randint(0, w - 40)
            bh, bw = rs.randint(24, 40), rs.randint(24, 40)
            inst[y0:y0 + bh, x0:x0 + bw] = k
            clsm[y0:y0 + bh, x0:x0 + bw] = rs.randint(1, 21)
        savemat(osp.join(ds, "inst", f"{index}.mat"),
                {"GTinst": {"Segmentation": inst}})
        savemat(osp.join(ds, "cls", f"{index}.mat"),
                {"GTcls": {"Segmentation": clsm}})
        img = rs.randint(0, 255, (h, w, 3), dtype=np.uint8)
        path = osp.join(ds, "img", f"{index}.jpg")
        if cv2 is not None:
            cv2.imwrite(path, img)
        else:  # pragma: no cover
            from PIL import Image

            Image.fromarray(img[:, :, ::-1]).save(path)
    with open(osp.join(root, "val.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")


def run_test_net(args, sbd_root: str | None, dry: bool) -> tuple[float, float]:
    """Run tools/test_net.py as a subprocess; parse the final mAP line."""
    cmd = [sys.executable, osp.join(REPO, "tools", "test_net.py"),
           "--imdb", args.imdb, "--stages", "5", "--cache", args.cache]
    set_cfgs = []
    if sbd_root:
        # the imdb resolves SBD under DATA_DIR/sbd; point DATA_DIR at the
        # PARENT so an external tree needs no copying
        set_cfgs += ["DATA_DIR", osp.dirname(osp.abspath(sbd_root))]
        assert osp.basename(osp.abspath(sbd_root)) == "sbd" or dry, (
            "--sbd-root must be a directory named 'sbd' (or symlink one)")
    if dry:
        # tiny canvas + tiny working set: the dry run proves plumbing, not perf
        set_cfgs += ["STATIC.CANVAS", "[192,256]",
                     "STATIC.TEST_PRE_NMS_TOP_N", "512",
                     "TEST.RPN_PRE_NMS_TOP_N", "512",
                     "TEST.RPN_POST_NMS_TOP_N", "64",
                     "TEST.MAX_PER_IMAGE", "32"]
        cmd += ["--cpu"]
    else:
        cmd += ["--cfg", osp.join(REPO, args.cfg)]
    if args.caffemodel:
        cmd += ["--caffemodel", args.caffemodel]
    elif args.npz:
        cmd += ["--npz", args.npz]
    if set_cfgs:
        cmd += ["--set"] + set_cfgs
    cmd += list(args.extra)
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print(f"PARITY: test_net failed (rc={proc.returncode})")
        sys.exit(2)
    m = re.search(r"mAP\^r@0\.5 = ([0-9.]+)\s+mAP\^r@0\.7 = ([0-9.]+)",
                  proc.stdout)
    if not m:
        print("PARITY: could not parse mAP line from test_net output")
        sys.exit(2)
    return float(m.group(1)) * 100.0, float(m.group(2)) * 100.0


def main():
    args = parse_args()
    if args.dry_run:
        tmp = tempfile.mkdtemp(prefix="mini_sbd_")
        root = osp.join(tmp, "sbd")
        build_mini_sbd(root)
        print(f"dry run: miniature SBD at {root}")
        args.cache = osp.join(tmp, "detections.pkl")
        if args.fabricate:
            # full-dress rehearsal: full-size fabricated reference weights
            # through the REAL import path (wire parse → auto-config of
            # MASK_SIZE 28 from blob shapes → param re-init → load)
            from fabricate_caffemodel import fabricate_blobs

            from mnc_tpu.utils.caffemodel import (write_caffemodel,
                                                  write_caffemodel_h5)

            blobs = fabricate_blobs(mask_size=28, num_classes=21)
            for pair in args.fabricate_rename:
                old, new = pair.split("=", 1)
                blobs[new] = blobs.pop(old)
            path = osp.join(tmp, "mnc_model.caffemodel")
            if args.fabricate == "h5":
                path += ".h5"
                write_caffemodel_h5(path, blobs)
            else:
                write_caffemodel(path, blobs)
            args.caffemodel = path
            print(f"fabricated full-size reference weights: {path}")
        ap50, ap70 = run_test_net(args, root, dry=True)
        expected = {"0.5": ap50, "0.7": ap70}  # self-diff: machinery proof
        tol = args.tol
    else:
        if not (args.caffemodel or args.npz):
            print("need --caffemodel or --npz (or --dry-run)")
            sys.exit(2)
        ap50, ap70 = run_test_net(args, args.sbd_root, dry=False)
        expected = (dict(zip(("0.5", "0.7"), args.expected)) if args.expected
                    else RELEASED_EXPECTED if args.released else PAPER_EXPECTED)
        tol = args.tol

    print("\n=== reference parity ===")
    ok = True
    for key, meas in (("0.5", ap50), ("0.7", ap70)):
        exp = expected[key]
        delta = meas - exp
        status = "OK" if abs(delta) <= tol else "FAIL"
        ok &= status == "OK"
        print(f"mAP^r@{key}: measured {meas:.2f}  expected {exp:.2f}  "
              f"delta {delta:+.2f}  (tol {tol})  {status}")
    print("PARITY:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
