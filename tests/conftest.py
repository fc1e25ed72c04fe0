"""Test configuration: force an 8-device virtual CPU mesh.

Multi-host logic is validated without a pod by CPU mesh simulation (the
standard JAX substitute for distributed tests; SURVEY §4).

The container's ``sitecustomize`` registers a remote-TPU backend and pins the
platform via ``jax.config`` before env vars are consulted, so we override
through ``jax.config`` as well (before any backend is initialized).  Set
``GSTPU_TEST_TPU=1`` to run the suite on the real chip instead.
"""

import os

if os.environ.get("GSTPU_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the render custom-VJP graphs are expensive to
# compile on CPU; cache them across pytest runs.
import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/gstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# Two-tier suite (VERDICT r2 item 7): the full suite takes ~30 min on the
# 1-CPU container (compile-heavy end-to-end graphs).  The inner-loop tier is
# ``pytest -m fast`` (<5 min with a warm compile cache); the round gate runs
# everything.  Modules here compile whole train steps / sharded programs /
# the reference-golden chain and are excluded from the fast tier.
_SLOW_MODULES = {
    "test_trainer", "test_sharded", "test_golden", "test_tpu_compiled",
    "test_multihost", "test_ref_parity_densify",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
