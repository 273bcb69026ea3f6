#!/usr/bin/env python
"""Int8 serving A/B matrix (VERDICT r4 item 8 — the depth pass).

Runs bench.py over {trunk} x {batch} x {bf16, int8} as sequential
subprocesses (one TPU client at a time), annotates each ONE-JSON-line
record with the matrix coordinates, and appends to --append
(docs/results/int8_r5.jsonl — the file tools/serve.py's throughput-mode
guidance cites).

    python tools/int8_ab.py --append docs/results/int8_r5.jsonl
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--append", default="docs/results/int8_r5.jsonl")
    ap.add_argument("--batches", type=int, nargs="*", default=[16, 32])
    ap.add_argument("--trunks", nargs="*", default=["vgg16", "resnet101"])
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()

    results = []
    for trunk in args.trunks:
        for batch in args.batches:
            for int8 in (False, True):
                cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
                       "--batch", str(batch), "--trunk", trunk]
                if int8:
                    cmd.append("--int8")
                t0 = time.time()
                try:
                    proc = subprocess.run(cmd, capture_output=True, text=True,
                                          timeout=args.timeout, cwd=ROOT)
                    line = proc.stdout.strip().splitlines()[-1] \
                        if proc.stdout.strip() else "{}"
                    rec = json.loads(line) if line.startswith("{") else \
                        {"error": proc.stderr.strip()[-300:]}
                except subprocess.TimeoutExpired:
                    rec = {"error": f"timeout {args.timeout}s"}
                rec.update({"trunk": trunk, "batch": batch,
                            "int8": int8, "wall_s": round(time.time() - t0, 1)})
                print(json.dumps(rec), flush=True)
                results.append(rec)
                if args.append:
                    with open(os.path.join(ROOT, args.append), "a") as f:
                        f.write(json.dumps(rec) + "\n")

    ok = [r for r in results if "value" in r]
    # speedup summary per (trunk, batch)
    for trunk in args.trunks:
        for batch in args.batches:
            pair = {r["int8"]: r for r in ok
                    if r["trunk"] == trunk and r["batch"] == batch}
            if len(pair) == 2:
                sp = pair[True]["value"] / pair[False]["value"]
                print(f"{trunk} b{batch}: bf16 {pair[False]['value']} -> "
                      f"int8 {pair[True]['value']} img/s ({sp:.3f}x)",
                      flush=True)


if __name__ == "__main__":
    main()
