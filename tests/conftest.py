"""Test harness: run everything on a virtual 8-device CPU mesh.

The environment presets JAX_PLATFORMS=axon (TPU tunnel) and jax in this image
ignores env-var overrides, so the platform must be forced via jax.config
before any computation. XLA_FLAGS must be set before the CPU backend
initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for the test mesh"
