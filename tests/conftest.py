"""Test environment: force CPU with 8 virtual devices.

Distributed-behavior tests run on a simulated 8-device mesh
(`--xla_force_host_platform_device_count=8`) per SURVEY.md §4 — the TPU
analog of "multi-node without a cluster".

NOTE: this environment's sitecustomize registers a TPU PJRT plugin and
force-sets ``jax_platforms='axon,cpu'`` at interpreter start; initializing
that backend costs ~3 minutes of tunnel setup per process.  Tests must run
CPU-only, and the env var alone is overridden, so we update the jax config
*after* import but before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Drop compiled-program caches between test modules.

    The interpret-mode clustered megakernel (and its round-5 expansion
    pipeline) compiles to large XLA:CPU programs; with the whole suite's
    accumulated jit cache in one process, compiling them has segfaulted
    inside backend_compile_and_load (XLA:CPU under cache/memory
    pressure — each file passes in a fresh process).  Per-module cache
    clearing keeps the compiler's working set bounded."""
    yield
    jax.clear_caches()
