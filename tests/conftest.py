"""Test config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers a tunneled TPU backend ("axon") and
force-sets jax_platforms="axon,cpu" via jax.config — which both trumps the
JAX_PLATFORMS env var and serializes every test process on the single remote
chip. Tests must stay on host CPU, so we override the config back *after*
import and before any backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert all(d.platform == "cpu" for d in jax.devices())
