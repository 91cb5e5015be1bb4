"""Curvature operators (vtkCurvatures replacement) and ICP
(vtkIterativeClosestPointTransform replacement)."""

import jax.numpy as jnp
import numpy as np

from pyfocusr_tpu.mesh import build_topology
from pyfocusr_tpu.ops.curvature import principal_curvatures
from pyfocusr_tpu.ops.icp import icp, umeyama


def make_sphere(n_theta=24, n_phi=48, r=2.0):
    """UV sphere triangulation (closed; poles as fans)."""
    pts = [(0.0, 0.0, r)]
    for i in range(1, n_theta):
        th = np.pi * i / n_theta
        for j in range(n_phi):
            ph = 2 * np.pi * j / n_phi
            pts.append(
                (
                    r * np.sin(th) * np.cos(ph),
                    r * np.sin(th) * np.sin(ph),
                    r * np.cos(th),
                )
            )
    pts.append((0.0, 0.0, -r))
    pts = np.array(pts)
    tris = []
    def ring(i):  # index of first vertex of ring i (1-based rings)
        return 1 + (i - 1) * n_phi
    for j in range(n_phi):
        tris.append((0, ring(1) + j, ring(1) + (j + 1) % n_phi))
    for i in range(1, n_theta - 1):
        for j in range(n_phi):
            a = ring(i) + j
            b = ring(i) + (j + 1) % n_phi
            c = ring(i + 1) + j
            d = ring(i + 1) + (j + 1) % n_phi
            tris.append((a, c, b))
            tris.append((b, c, d))
    last = len(pts) - 1
    for j in range(n_phi):
        tris.append((last, ring(n_theta - 1) + (j + 1) % n_phi, ring(n_theta - 1) + j))
    return pts, np.array(tris, dtype=np.int32)


class TestCurvature:
    def test_sphere_principal_curvatures(self):
        r = 2.0
        pts, tris = make_sphere(r=r)
        topo = build_topology(tris, len(pts))
        kmin, kmax = principal_curvatures(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(tris),
            jnp.asarray(topo.edges),
            jnp.asarray(topo.edge_faces),
        )
        # Away from the pole fans, both principal curvatures ~ 1/r.
        interior = slice(49, len(pts) - 49)
        km = np.asarray(kmin)[interior]
        kM = np.asarray(kmax)[interior]
        assert abs(np.median(km) - 1.0 / r) < 0.15 / r
        assert abs(np.median(kM) - 1.0 / r) < 0.15 / r

    def test_sign_convention_convex(self):
        """A convex surface with outward-oriented triangles has positive
        mean curvature (vtk convention)."""
        pts, tris = make_sphere(r=1.0)
        topo = build_topology(tris, len(pts))
        kmin, kmax = principal_curvatures(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(tris),
            jnp.asarray(topo.edges),
            jnp.asarray(topo.edge_faces),
        )
        interior = slice(49, len(pts) - 49)
        assert np.median(np.asarray(kmax)[interior]) > 0


class TestICP:
    def test_umeyama_recovers_similarity(self):
        rng = np.random.default_rng(0)
        src = rng.normal(size=(200, 3)).astype(np.float32)
        ang = 0.4
        R_true = np.array(
            [
                [np.cos(ang), -np.sin(ang), 0],
                [np.sin(ang), np.cos(ang), 0],
                [0, 0, 1],
            ],
            dtype=np.float32,
        )
        s_true, t_true = 1.7, np.array([1.0, -2.0, 0.5], np.float32)
        dst = s_true * src @ R_true.T + t_true
        s, R, t = umeyama(jnp.asarray(src), jnp.asarray(dst), with_scale=True)
        assert abs(float(s) - s_true) < 1e-4
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)

    def test_icp_aligns_rotated_cloud(self, mesh_5k_source):
        pts = jnp.asarray(mesh_5k_source.points)[:2000]
        ang = 0.2
        R = jnp.asarray(
            [
                [np.cos(ang), -np.sin(ang), 0],
                [np.sin(ang), np.cos(ang), 0],
                [0, 0, 1],
            ],
            jnp.float32,
        )
        moved_pts = pts @ R.T + jnp.asarray([5.0, -3.0, 2.0])
        init_err = np.linalg.norm(np.asarray(moved_pts) - np.asarray(pts), axis=1)
        (s, Rf, t), aligned = icp(moved_pts, pts, mode="rigid", max_iterations=50)
        err = np.linalg.norm(np.asarray(aligned) - np.asarray(pts), axis=1)
        # Point-to-point ICP plateaus in a shallow local minimum on dense
        # surfaces (VTK's does too); FOCUSR only needs crude pre-alignment.
        assert err.mean() < 2.0
        assert err.mean() < 0.15 * init_err.mean()
