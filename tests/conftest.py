"""Test harness config: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin (sitecustomize) registers itself before pytest starts,
so JAX_PLATFORMS set here would be ignored; jax.config.update before the
first backend use is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
