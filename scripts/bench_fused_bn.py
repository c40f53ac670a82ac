"""Same-process A/B/A of the fused masked-BN kernel vs the two-pass XLA form
at the flagship train step (toggled via the VMEM gate).  Measured 2.288 /
2.399 / 2.292 ms on TPU v5e — a reproducible -0.11 ms/step (KERNELS.md)."""
import sys

sys.path.insert(0, ".")
sys.argv = ["bench_fused_bn"]
src = open("scripts/bench_ablation.py").read().replace(
    'which = sys.argv[1] if len(sys.argv) > 1 else "all"', 'which = "none"')
exec(src)  # noqa: S102 - reuses the ablation's slope-timed time_step

import phc_gnn_tpu.ops.fused_bn as fb

time_step("bn_fused")
_limit = fb.FUSED_BN_VMEM_LIMIT
fb.FUSED_BN_VMEM_LIMIT = 0  # force the two-pass XLA path
time_step("bn_unfused")
fb.FUSED_BN_VMEM_LIMIT = _limit
time_step("bn_fused_again")
