"""Per-pass cost of the segmented-scan kernels (round 5).

The round-4 record attributes the softmax premium to "~24 dependent
roll-combine passes" but never separated the EXPENSIVE sublane-shift passes
(s=1,2,4) from the CHEAP tile-granular ones (s=8..128).  This bench runs the
actual sum-scan kernel with host-truncated gate arrays (NP = 3..8 lanes —
results are wrong for long segments, timing is real) at the flagship shape,
giving the marginal cost of each deep pass.  If passes 8..128 cost real time,
a host-planned per-block pass skip (molecule degrees are ~2-6, so deep
passes are identity on almost every block) is the next lever; if they are
~free, the premium is pinned to the three sublane passes and is structural.

Usage (on the TPU): python scripts/bench_pass_depth.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from phc_gnn_tpu.ops.stream_scan import (_pack_scan_gates, _segmented_scan,
                                         build_scan_plan)

E, D, BLOCK = 8192, 200, 256
rng = np.random.default_rng(0)
# realistic molecular receiver stream: segment lengths 1..6
lens = rng.integers(1, 7, size=E)
recv = np.repeat(np.arange(len(lens)), lens)[:E]
recv = np.sort(recv).astype(np.int64)
flags = np.ones(E, np.float32)
flags[1:] = (recv[1:] != recv[:-1]).astype(np.float32)
full = _pack_scan_gates(flags, BLOCK)          # [E, 2*8+2]
NP = 8
vals = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
cont = jnp.asarray(np.zeros(E // BLOCK, np.int32))


def truncated(k):
    """[E, 2k+2] gate array that makes _num_passes = k (fwd gates 0..k-1 +
    s0 + k suffix lanes + t0)."""
    g = np.asarray(full)
    out = np.concatenate([g[:, :k], g[:, NP:NP + 1],
                          g[:, NP + 1:NP + 1 + k],
                          g[:, 2 * NP + 1:2 * NP + 2]], axis=1)
    return jnp.asarray(out)


def timeit(gates, n1=50, n2=450, reps=3):
    @jax.jit
    def g(n):
        def body(i, acc):
            kz = jnp.float32(jnp.isnan(acc))
            out = _segmented_scan(vals + kz, gates, cont, block_edges=BLOCK)
            return acc * 0.5 + jnp.sum(jnp.abs(out[-1]))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    jax.block_until_ready(g(n1))

    def t(n):
        t0 = time.perf_counter()
        jax.block_until_ready(g(n))
        return time.perf_counter() - t0
    return (min(t(n2) for _ in range(reps))
            - min(t(n1) for _ in range(reps))) / (n2 - n1)


print(f"sum-scan kernel {E}x{D} block {BLOCK} (shifts 1,2,4 are sublane "
      f"shuffles; 8..128 tile-granular):", flush=True)
prev = None
for k in range(3, 9):
    tk = timeit(truncated(k) if k < NP else jnp.asarray(full))
    delta = "" if prev is None else f"  (+{(tk - prev) * 1e6:6.2f} us for s={1 << (k - 1)})"
    print(f"  NP={k} ({k} passes): {tk * 1e6:7.2f} us{delta}", flush=True)
    prev = tk
