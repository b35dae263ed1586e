"""Test harness config: force CPU with a virtual 8-device mesh.

Sharding paths are exercised on 8 virtual CPU devices; the real TPU chip
is reserved for bench.py. jax is already imported at interpreter startup
(sitecustomize), so we must go through jax.config rather than env vars —
but XLA_FLAGS is still read lazily at first backend init, which hasn't
happened yet when conftest runs.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
