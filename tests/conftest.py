"""Test harness: distributed tests without a cluster (SURVEY.md §4).

Forces the CPU backend with 8 fake XLA devices BEFORE jax initializes, so
mesh/row-sharding/all-to-all/top-k-merge tests run in CI on any machine and
are parameterized to run unchanged on a real TPU slice.
"""

import os

# Env vars alone are not enough here: a sitecustomize hook re-exports
# JAX_PLATFORMS for the TPU plugin, so the jax.config override below is the
# authoritative one.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from arec.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()   # the suite is compile-heavy; replays are free

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
