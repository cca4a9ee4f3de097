"""Test harness config: CPU backend with 8 virtual devices, x64 enabled.

Per the build environment contract, sharding tests run on a virtual
8-device CPU mesh; physics/parity tests run in float64 on CPU.

NOTE: this image's axon sitecustomize registers the TPU backend in a way
that overrides the JAX_PLATFORMS *environment variable*, so the backend
must be forced through jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
