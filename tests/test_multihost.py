"""Multi-host execution: a REAL 2-process jax.distributed cluster on CPU
(VERDICT r3 #7 — `parallel/multihost.py` had never executed).

Spawns two worker processes (tests/multihost_worker.py), each with 2 virtual
CPU devices, coordinated via jax.distributed over localhost.  The workers
build the DCN-aware (dp across hosts, ep within host) mesh from
`make_multihost_mesh`, assemble a global dp batch from process-local shards,
and run ONE real dp train step (shard_map, load-weighted grad psum crossing
the process boundary).  Asserts:

  - both processes complete and report the SAME loss and updated-params
    fingerprint (the psum actually spanned processes: each holds a different
    shard, so agreement is impossible without cross-host reduction);
  - the 2-process result matches a single-process 2-device run of the same
    global step (topology-invariance of the dp reduction).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
_TIMEOUT = 420


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the worker pins its own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _parse(out: str) -> dict:
    line = next(ln for ln in reversed(out.splitlines())
                if ln.startswith("{"))
    return json.loads(line)


def test_two_process_dp_train_step_matches_single_process():
    addr = f"127.0.0.1:{_free_port()}"
    env = _clean_env()
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, addr, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=_TIMEOUT)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker hung")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(_parse(out))

    # cross-process agreement (replicated outputs identical on both hosts)
    assert outs[0]["nparams"] == outs[1]["nparams"] > 0
    np.testing.assert_allclose(outs[0]["loss"], outs[1]["loss"], rtol=1e-6)
    np.testing.assert_allclose(outs[0]["fingerprint"],
                               outs[1]["fingerprint"], rtol=1e-6)

    # topology invariance: same global step on 1 process x 2 devices
    ref = subprocess.run([sys.executable, _WORKER, "--single"],
                         capture_output=True, text=True, timeout=_TIMEOUT,
                         env=_clean_env())
    assert ref.returncode == 0, f"single-proc ref failed:\n{ref.stderr[-3000:]}"
    single = _parse(ref.stdout)
    np.testing.assert_allclose(outs[0]["loss"], single["loss"], rtol=1e-5)
    np.testing.assert_allclose(outs[0]["fingerprint"], single["fingerprint"],
                               rtol=1e-5)
