"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths (mesh/pjit) are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache-cpu"
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# a sitecustomize may have force-registered an accelerator platform and
# overridden jax_platforms at interpreter start; override it back — tests
# must run on the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = pathlib.Path(__file__).parent / "golden"


# fast per-commit tier: `pytest -m smoke` (~2 min on this 1-core VM) —
# helloworld bit-compat, one golden joint scene, the Pallas solve middle in
# interpret mode at a tiny shape, and sharded bit-equality. The full suite
# stays the default (`pytest tests/`).
_SMOKE = {
    "test_helloworld_freefall_exact",
    "test_helloworld_terminal",
    "test_revolute_pendulum",
    "test_sharded_step_bit_equals_unsharded",
    "test_pallas_middle_matches_xla[pyramid]",
}

# long golden rollouts (240+ steps); deselect with -m "not slow"
_SLOW_PREFIX = ("test_golden_zoo.py", "test_golden_interactive.py")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SMOKE:
            item.add_marker(pytest.mark.smoke)
        if any(p in str(item.fspath) for p in _SLOW_PREFIX):
            item.add_marker(pytest.mark.slow)


_last_module = [None]


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_module(request):
    """Drop JAX's in-memory executable caches at each test-module boundary.
    One pytest process compiles ~100 distinct XLA programs across the
    suite; the accumulated live executables eventually segfault the CPU
    backend's JIT on this host (observed deterministically around program
    ~70). The persistent on-disk compilation cache (conftest sets
    JAX_COMPILATION_CACHE_DIR) makes the post-clear reloads cheap."""
    mod = request.module.__name__
    if _last_module[0] is not None and mod != _last_module[0]:
        jax.clear_caches()
    _last_module[0] = mod
    yield


def load_jsonl(name):
    with open(GOLDEN / name) as f:
        return [json.loads(line) for line in f]


@pytest.fixture(scope="session")
def golden_manifolds():
    return load_jsonl("manifolds.jsonl")


def golden_trace(name):
    """Load a golden trajectory: list of (steps, bodies) with bodies in
    reference GetBodyList order (reverse creation order)."""
    rows = load_jsonl(name)
    return [np.asarray(r["bodies"], np.float64) for r in rows]
