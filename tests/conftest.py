"""Test configuration: force the CPU backend with 8 virtual devices.

The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must be
deterministic and multi-device-capable, so we override to CPU *before any
backend is initialized* (the sitecustomize hook imports jax early, so the
env var alone is not sufficient — jax.config.update works until first use).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

DATA = "/root/reference/data"


def _require_data():
    """Most tests use the bundled reference meshes; on runners without the
    reference checkout they should SKIP rather than error (ROADMAP CI
    item).  Synthetic-mesh tests (spheres, random fuzz) still run."""
    if not os.path.isdir(DATA):
        pytest.skip("bundled reference data not available on this runner")


@pytest.fixture(scope="session")
def mesh_5k_source():
    from pyfocusr_tpu.mesh import load_mesh

    _require_data()
    return load_mesh(f"{DATA}/source_mesh.vtk")


@pytest.fixture(scope="session")
def mesh_5k_target():
    from pyfocusr_tpu.mesh import load_mesh

    _require_data()
    return load_mesh(f"{DATA}/target_mesh.vtk")


@pytest.fixture(scope="session")
def topo_5k_source(mesh_5k_source):
    from pyfocusr_tpu.mesh import build_topology

    return build_topology(np.asarray(mesh_5k_source.triangles), mesh_5k_source.n_points)


def pytest_addoption(parser):
    parser.addoption("--run-slow", action="store_true", default=False)


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip = pytest.mark.skip(reason="slow; use --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
