"""Multi-host (DCN) initialization and cross-host utilities.

SURVEY.md section 5.8: the reference has no distributed backend; here jax.distributed
rides DCN across hosts while collectives inside a slice ride ICI.  Call
``initialize()`` once per process before any jax computation on multi-host pods
(no-op single-host).  Mesh axes are laid out so ``dp`` spans hosts (gradient
psum crosses DCN once per step) and ``ep`` stays within a host's chips
(edge-partition collectives stay on ICI).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger("phc_gnn_tpu")

__all__ = ["initialize", "make_multihost_mesh", "is_primary", "sync_hosts"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize jax.distributed (TPU pods auto-discover when args are None).

    Must run before any jax backend use — do NOT query jax.devices()/
    process_count() first (that instantiates the local-only backend and makes
    distributed init fail).
    """
    explicit = coordinator_address is not None or num_processes is not None
    try:
        import os
        if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
            # CPU clusters (dev / CI): without a cross-process collectives
            # implementation the CPU client comes up local-only and
            # process_count() silently stays 1
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError as e:
        msg = str(e).lower()
        # jax 0.9 wording: "distributed.initialize should only be called once."
        if "already" in msg or "once" in msg:
            return  # initialized earlier in this process — fine
        if explicit:
            # an intentional multi-host setup must fail fast, not silently
            # degrade to N uncoordinated single-host trainings
            raise
        log.warning("jax.distributed.initialize failed (%s); proceeding "
                    "single-host", e)
        return
    except Exception as e:
        if explicit:
            raise
        log.info("jax.distributed not initialized (%s); single-host mode", e)
        return
    log.info("jax.distributed: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


def make_multihost_mesh(ep_per_host: int = 1) -> Mesh:
    """(dp, ep) mesh over all global devices: ep within each host's chips (ICI),
    dp across the rest (ICI within a slice, DCN across hosts)."""
    devices = np.asarray(jax.devices())
    n = devices.size
    assert n % ep_per_host == 0
    return Mesh(devices.reshape(n // ep_per_host, ep_per_host), ("dp", "ep"))


def is_primary() -> bool:
    return jax.process_index() == 0


def sync_hosts(name: str = "sync"):
    """Barrier across hosts (psum of 1 over all devices)."""
    x = jax.numpy.ones(())
    jax.block_until_ready(
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
            jax.numpy.broadcast_to(x, (jax.local_device_count(),))))
