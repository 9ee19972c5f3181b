"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native equivalent of the reference's "single-process when
RANK unset" fake-distributed story (reference distributed.py:18-21): sharding
tests execute against 8 virtual CPU devices so multi-chip code paths compile
and run without TPU hardware.

Note: the axon sitecustomize imports jax at interpreter start, so env vars
alone are too late here — but backend initialization is lazy, so overriding
via jax.config before the first backend use still works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
