"""Worker process for tests/test_multihost.py: one member of a 2-process
jax.distributed CPU cluster (or the single-process reference when run with
--single).  Prints ONE JSON line with the post-step loss and a params
fingerprint so the parent can assert cross-process agreement and exactness
vs the single-process run.

Usage: python multihost_worker.py <coordinator_addr> <num_procs> <proc_id>
       python multihost_worker.py --single
"""

import json
import sys

# same recipe as tests/conftest.py: the axon sitecustomize imports jax at
# interpreter startup, so XLA_FLAGS must be in place before the first
# backend-touching call and the platform is pinned via jax.config
import os  # noqa: E402

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from phc_gnn_tpu.parallel import multihost  # noqa: E402

single = "--single" in sys.argv
if single:
    # one process, 2 devices: the same global (dp=2) mesh without DCN
    num_procs, proc_id = 1, 0
else:
    addr, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                int(sys.argv[3]))
    multihost.initialize(addr, num_procs, proc_id)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from phc_gnn_tpu.data import synthetic_batch  # noqa: E402
from phc_gnn_tpu.models import PHCGNN  # noqa: E402
from phc_gnn_tpu.parallel.dp import (make_dp_train_step,  # noqa: E402
                                     stack_batches)
from phc_gnn_tpu.train import (create_train_state,  # noqa: E402
                               make_optimizer)
from phc_gnn_tpu.train.loss import masked_l1  # noqa: E402

assert jax.process_count() == num_procs, (jax.process_count(), num_procs)
DP = 2  # one dp shard per process in the 2-proc run

if single:
    mesh = multihost.make_multihost_mesh(ep_per_host=1)
    assert mesh.devices.shape == (2, 1)
else:
    # 2 procs x 2 local devices; keep dp == process count by folding each
    # host's 2 chips into ep (ICI axis)
    mesh = multihost.make_multihost_mesh(ep_per_host=2)
    assert mesh.devices.shape == (2, 2)
    for r, row in enumerate(mesh.devices):
        for d in row:
            assert d.process_index == r, "dp rows must align with hosts"

model = PHCGNN(phm_dim=4, atom_input_dims=[28], bond_input_dims=[4],
               atom_encoded_dim=16, mp_layers=(16, 16), dropout_mpnn=(0., 0.),
               downstream_layers=(16,), target_dim=1, dropout_dn=(0.,),
               msg_aggr="softmax", norm_mp="naive-batch-norm")

# global batch = DP shards, deterministic by shard index; each process
# materializes only its local shard and assembles the global array
shards = [synthetic_batch(batch_size=4, num_nodes=160, num_edges=384, seed=s)
          for s in range(DP)]
stacked = stack_batches(shards)  # [DP, ...] identical on every process
spec = NamedSharding(mesh, P(("dp",)))
local = slice(proc_id, proc_id + 1) if not single else slice(0, DP)
batch = jax.tree_util.tree_map(
    lambda x: jax.make_array_from_process_local_data(
        spec, np.asarray(x[local]), x.shape),
    stacked)

tx = make_optimizer(1e-3)
state = create_train_state(model, tx, shards[0], jax.random.key(0),
                           init_rng=jax.random.key(0))
# replicate the (identically-seeded) state over the global mesh
_REP = NamedSharding(mesh, P())


def _replicate(x):
    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype,
                                                   jax.dtypes.prng_key):
        kd = jax.device_put(np.asarray(jax.random.key_data(x)), _REP)
        return jax.random.wrap_key_data(kd, impl=jax.random.key_impl(x))
    return jax.device_put(np.asarray(x), _REP)


state = jax.tree_util.tree_map(_replicate, state)

step = make_dp_train_step(model, tx, lambda out, b: masked_l1(out, b.y),
                          mesh=mesh, loss_name="l1", donate=False)
state2, loss, _ = step(state, batch, jnp.float32(1e-3))

leaves = jax.tree_util.tree_leaves(state2.params)
fp = [float(jnp.sum(jnp.abs(v))) for v in leaves[:6]]
print(json.dumps({"proc": proc_id, "loss": float(loss),
                  "nparams": len(leaves), "fingerprint": fp}))
