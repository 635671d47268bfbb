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
