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
# ~ expands portably (CI runs this on macOS/Windows runners too; on the
# primary dev image HOME=/root so the path is the usual /root/.jax_cache).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache")
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
# Persistent-cache WRITES are disabled during tests (reads stay on): this
# jaxlib's XLA:CPU `executable.serialize()` segfaults deterministically
# late in long-lived processes (ROADMAP "Infrastructure"; observed killing
# the default suite at the first new-program compile after ~10 min).
# `make test` pre-populates the cache via tools/warm_test_cache.py — a
# short-lived process that sets PYFOCUSR_TPU_CACHE_WRITES=1 to opt back in.
if os.environ.get("PYFOCUSR_TPU_CACHE_WRITES") != "1":
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10**9)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

DATA = "/root/reference/data"


def _require_data():
    """Tests comparing against stored goldens or the bundled files
    themselves need the real reference checkout; on runners without it
    they SKIP rather than error (ROADMAP CI item)."""
    if not os.path.isdir(DATA):
        pytest.skip("bundled reference data not available on this runner")


# Force the synthetic fixture pair even when the reference data exists —
# used to validate that the suite degrades gracefully on plain runners.
SYNTHETIC_FIXTURES = (
    os.environ.get("PYFOCUSR_TPU_TEST_SYNTHETIC") == "1" or not os.path.isdir(DATA)
)

# Standard icosahedron (12 vertices, 20 faces) — seed of the synthetic pair.
_ICO_T = (1.0 + 5.0 ** 0.5) / 2.0
_ICO_VERTS = np.array(
    [
        (-1, _ICO_T, 0), (1, _ICO_T, 0), (-1, -_ICO_T, 0), (1, -_ICO_T, 0),
        (0, -1, _ICO_T), (0, 1, _ICO_T), (0, -1, -_ICO_T), (0, 1, -_ICO_T),
        (_ICO_T, 0, -1), (_ICO_T, 0, 1), (-_ICO_T, 0, -1), (-_ICO_T, 0, 1),
    ],
    np.float64,
)
_ICO_FACES = np.array(
    [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ],
    np.int32,
)


def _synthetic_bone(seed: int):
    """Deterministic bone-like closed surface (~2562 vertices): an
    icosphere radially warped by seeded low-frequency bumps, elongated to
    bone proportions at mm scale, with a smooth ``thickness_change_(mm)``
    scalar.  Stands in for the bundled 5k pair when the reference data
    directory is absent, so oracle-based tests (scipy ARPACK / KDTree /
    live-transcription parity on the SAME mesh) still run on plain
    runners; golden-gated tests skip via ``_require_data``."""
    from pyfocusr_tpu.mesh import TriMesh
    from pyfocusr_tpu.multires import subdivide

    mesh = TriMesh(_ICO_VERTS.astype(np.float32), _ICO_FACES, {})
    for _ in range(4):  # 12 -> 42 -> 162 -> 642 -> 2562 vertices
        mesh = subdivide(mesh)
    u = np.asarray(mesh.points, np.float64)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    ph = rng.uniform(0, 2 * np.pi, 4)
    amp = rng.uniform(0.04, 0.10, 4)
    r = 1.0
    r = r + amp[0] * np.sin(2.0 * u[:, 0] + ph[0]) * np.cos(1.5 * u[:, 1] + ph[1])
    r = r + amp[1] * np.sin(3.0 * u[:, 2] + ph[2])
    r = r + amp[2] * np.cos(2.5 * u[:, 1] + ph[3]) * u[:, 2]
    r = r + amp[3] * u[:, 0] * u[:, 1]
    pts = u * r[:, None] * np.array([[16.0, 13.0, 38.0]])  # mm, elongated
    thickness = 1.0 + np.sin(3.0 * u[:, 2] + ph[0]) * np.cos(u[:, 0] + ph[2])
    return TriMesh(
        pts.astype(np.float32),
        np.asarray(mesh.triangles, np.int32),
        {"thickness_change_(mm)": thickness.astype(np.float32)},
    )


@pytest.fixture(scope="session")
def mesh_5k_source():
    if SYNTHETIC_FIXTURES:
        return _synthetic_bone(1)
    from pyfocusr_tpu.mesh import load_mesh

    return load_mesh(f"{DATA}/source_mesh.vtk")


@pytest.fixture(scope="session")
def mesh_5k_target():
    if SYNTHETIC_FIXTURES:
        return _synthetic_bone(2)
    from pyfocusr_tpu.mesh import load_mesh

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
