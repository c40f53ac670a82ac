"""Test configuration: run on a virtual 8-device CPU mesh so sharding tests work
without TPU hardware.

The axon sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon latched, so the env-var route is too late here —
``jax.config.update`` works post-import as long as no backend has initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
