"""Test harness: force an 8-virtual-device CPU backend so sharding/mesh tests run
without TPU hardware (SURVEY.md §4 test-strategy note).

Note: the environment's axon TPU plugin force-registers itself at jax import via
sitecustomize, ignoring JAX_PLATFORMS — so the platform is overridden through
jax.config *after* import, before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: no persistent compile cache here — XLA:CPU AOT reload warns about machine
# feature mismatches on this host (risk of SIGILL); CPU test graphs are small.
