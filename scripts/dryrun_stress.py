"""Stress the multi-chip dryrun at several virtual mesh sizes (VERDICT r2 #8)
AND assert scheme correctness at each size (VERDICT r4 next #6).

For n in {8, 16, 32}, each in a fresh subprocess so the forced CPU device
count can differ:
  1. __graft_entry__.dryrun_multichip(n) — liveness: one full dp x ep train
     step under both graph-parallel schemes (halo node-sharded, replicated
     edge-partitioned), dropout on, isfinite(loss).
  2. __graft_entry__.exactness_check(n) — correctness: dropout OFF, one SGD
     step under {halo, replicated} x every ep width the mesh supports must
     match the single-device grad-accumulation oracle over the same dp
     batches; records max |loss delta| and max |param delta| (the function
     asserts delta < 1e-5 / 1e-4 internally, so drift fails the run).

Writes MULTICHIP_STRESS.json (one record per size, exactness deltas
included) and prints each record as a JSON line.
Usage: python scripts/dryrun_stress.py
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
    code = (
        "import json, __graft_entry__ as g\n"
        f"g.dryrun_multichip({n})\n"
        f"res = g.exactness_check({n})\n"
        "print('EXACT:' + json.dumps(res))\n")
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=2400)
    ok = proc.returncode == 0
    exact = None
    for ln in proc.stdout.splitlines():
        if ln.startswith("EXACT:"):
            exact = json.loads(ln[len("EXACT:"):])
    rec = {"n_devices": n, "ok": ok, "wall_s": round(time.time() - t0, 1),
           "exactness": (exact or {}).get("schemes"),
           "tail": (proc.stdout + proc.stderr).strip().splitlines()[-2:]}
    return rec


if __name__ == "__main__":
    results = [run(n) for n in (8, 16, 32)]
    for r in results:
        print(json.dumps(r))
    with open(os.path.join(REPO, "MULTICHIP_STRESS.json"), "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    sys.exit(0 if all(r["ok"] and r["exactness"] for r in results) else 1)
