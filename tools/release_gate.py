"""Release gate: run the slow-marked equivalence tests and bank the result.

The default test gate (`pytest tests/ -x -q`) skips ~20 slow-marked tests —
the gradient/remat/bf16 equivalence classes (deep-stencil gradient
equivalence, remat-vs-plain, bf16-vs-f32, sharded autoencoder).  A fused-VJP
regression is invisible to that gate, so each round must run this once and
bank the record (VERDICT r3 #6; the reference's analog is its full
`pytest tests/` CI run, /root/reference/tests).

Usage:
    python tools/release_gate.py [--out SLOWGATE.json] [--timeout 5400]

Writes a JSON record {ok, passed, failed, skipped, duration_s, tail} and
exits non-zero when any slow test fails (or the run times out).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "SLOWGATE.json"))
    ap.add_argument("--timeout", type=float, default=5400.0,
                    help="wall-clock cap for the whole slow suite (s)")
    ap.add_argument("-k", default=None, help="pytest -k filter passthrough")
    args = ap.parse_args(argv)

    cmd = [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "slow",
           "--override-ini", "addopts="]
    if args.k:
        cmd += ["-k", args.k]
    env = dict(os.environ, DS_RUN_SLOW="1")

    t0 = time.time()
    rec = {"ok": False, "cmd": " ".join(cmd), "started": int(t0)}
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, env=env, timeout=args.timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, errors="replace",
        )
        out, rc = proc.stdout or "", proc.returncode
    except subprocess.TimeoutExpired as e:
        out = (e.stdout.decode(errors="replace")
               if isinstance(e.stdout, bytes) else (e.stdout or ""))
        rc = None
        rec["error"] = f"timeout after {args.timeout:.0f}s"

    rec["duration_s"] = round(time.time() - t0, 1)
    rec["rc"] = rc
    tail_lines = [ln for ln in out.splitlines() if ln.strip()][-12:]
    rec["tail"] = "\n".join(tail_lines)[-2000:]
    for key in ("passed", "failed", "skipped", "deselected", "error"):
        m = re.search(rf"(\d+) {key}", out)
        if m:
            rec[key + ("s" if key == "error" else "")] = int(m.group(1))
    rec["ok"] = rc == 0 and rec.get("failed", 0) == 0

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"[release_gate] ok={rec['ok']} "
          f"passed={rec.get('passed')} failed={rec.get('failed', 0)} "
          f"in {rec['duration_s']}s -> {args.out}")
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
