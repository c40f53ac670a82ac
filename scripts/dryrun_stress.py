"""Stress the multi-chip dryrun at several virtual mesh sizes (VERDICT r2 #8).

Runs __graft_entry__.dryrun_multichip(n) for n in {8, 16, 32} — each in a
fresh subprocess so the forced CPU device count can differ — and prints a
one-line JSON record per size.  Usage: python scripts/dryrun_stress.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(n: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
    env["JAX_PLATFORMS"] = "cpu"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c",
         f"import __graft_entry__ as g; g.dryrun_multichip({n})"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    ok = proc.returncode == 0
    return {"n_devices": n, "ok": ok, "wall_s": round(time.time() - t0, 1),
            "tail": (proc.stdout + proc.stderr).strip().splitlines()[-2:]}


if __name__ == "__main__":
    results = [run(n) for n in (8, 16, 32)]
    for r in results:
        print(json.dumps(r))
    sys.exit(0 if all(r["ok"] for r in results) else 1)
