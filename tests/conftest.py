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

# Persistent compilation cache: the fused-pipeline tests are compile-bound
# (round-3 full suite ~49 min on this 1-core host); cached executables cut
# repeat runs to the actual test arithmetic.  Keyed by XLA version +
# program, so it is safe across code changes.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Budget trimming is a throughput optimization (smaller survivor lanes
# after a warm stream) that costs one extra XLA compile per plan — pure
# overhead for parity tests, where the suite is compile-bound.  Behavior
# is covered explicitly by the trim/grow tests, which set it back on.
os.environ.setdefault("JDA_TPU_BUDGET_TRIM", "0")
