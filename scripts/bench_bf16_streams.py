"""Same-process A/B of compute_dtype=bf16 (message streams now enter the
scan kernels as bf16 blocks, f32 accumulation) vs f32 at the flagship train
step.  Run when the TPU is reachable; the pre-stream-change measurement was
f32 2.456 / bf16 2.371 ms (KERNELS.md) — this script records whether the
direct bf16 kernel ingestion moves the bf16 number further."""
import sys

sys.path.insert(0, ".")
sys.argv = ["bench_bf16_streams"]
src = open("scripts/bench_ablation.py").read().replace(
    'which = sys.argv[1] if len(sys.argv) > 1 else "all"', 'which = "none"')
exec(src)  # noqa: S102 - reuses the ablation's slope-timed time_step

import jax.numpy as jnp

time_step("f32")
time_step("bf16_streams", compute_dtype=jnp.bfloat16)
time_step("f32_again")
