"""Test environment: CPU backend with 8 virtual devices (the TPU-native
analogue of a fake distributed backend — SURVEY.md §4), and x64 enabled so
float64 parity oracles are exact.

NOTE: this image's sitecustomize registers a TPU PJRT plugin at interpreter
start and force-sets ``jax_platforms="axon,cpu"`` via jax.config — overriding
the JAX_PLATFORMS env var. Unit tests must NOT run through the TPU tunnel, so
the platform is re-pinned to cpu through jax.config here (conftest runs after
sitecustomize, before any backend is initialized)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the XLA CPU compiler's cumulative memory: with 110+ tests in one
    process (several compiling large fused Pallas-interpret programs), the
    full suite deterministically segfaulted inside backend_compile around
    test #102 while module subsets passed — dropping compiled executables
    between modules keeps the process under the cliff. Costs nothing across
    modules (they share almost no jit signatures)."""
    yield
    jax.clear_caches()
