"""Test configuration: CPU backend with 8 virtual devices (multi-chip
sharding tests without TPU hardware) and float64 enabled (the reference is
double precision throughout, ``bp5/step-64.cu:206``)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon environment pins JAX_PLATFORMS=axon (the remote TPU tunnel); the
# config update below overrides it reliably where the env var does not
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) >= 8, "need xla_force_host_platform_device_count=8"
