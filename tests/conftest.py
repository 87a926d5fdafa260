"""Test harness: force an 8-device virtual CPU mesh.

The sandbox's axon sitecustomize pins ``jax_platforms="axon,cpu"`` via
jax.config at interpreter start, so env vars alone are not enough — we
re-pin to cpu here (conftest imports before any test builds arrays).

Real-TPU execution is exercised only via bench.py / __graft_entry__.py;
the test suite runs on the virtual 8-device CPU mesh so sharding tests
work without a pod slice.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
