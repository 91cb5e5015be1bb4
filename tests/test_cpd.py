"""CPD registration tests (cycpd replacement, SURVEY §2.3 row 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyfocusr_tpu.ops.cpd import (
    affine_registration,
    deformable_registration,
    gaussian_kernel,
    low_rank_gaussian,
)


class TestAffine:
    def test_recovers_known_affine(self):
        rng = np.random.default_rng(0)
        N, D = 500, 5
        X = rng.normal(size=(N, D)).astype(np.float32)
        B_true = np.eye(D) + 0.1 * rng.normal(size=(D, D))
        t_true = rng.normal(size=D) * 0.5
        Y = ((X - t_true) @ np.linalg.inv(B_true).T).astype(np.float32)
        reg = affine_registration(X=X, Y=Y, max_iterations=150, tolerance=1e-10)
        TY, params = reg.register()
        assert np.abs(np.asarray(TY) - X).max() < 1e-3
        # Returned params follow the pycpd/cycpd convention TY = Y @ B + t,
        # so B is the transpose of the planted left-multiplying matrix ...
        assert np.abs(params["B"] - B_true.T).max() < 1e-3
        # ... and applying them directly reproduces the fit (the identity a
        # migrated cycpd caller relies on).
        np.testing.assert_allclose(
            Y @ params["B"] + params["t"], np.asarray(TY), atol=1e-5
        )
        # transform_point_cloud consistency
        Y2 = Y[:100]
        np.testing.assert_allclose(
            np.asarray(reg.transform_point_cloud(Y2)),
            np.asarray(TY)[:100],
            atol=1e-5,
        )

    def test_tolerance_stops_early(self):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(200, 3)).astype(np.float32)
        reg = affine_registration(X=X, Y=X.copy(), max_iterations=100, tolerance=1e-4)
        reg.register()
        assert reg.iterations_run < 100


class TestLowRankKernel:
    def test_matches_dense_eigh(self):
        rng = np.random.default_rng(0)
        Y = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
        beta = 1.5
        G = np.asarray(gaussian_kernel(jnp.asarray(Y), jnp.asarray(Y), beta))
        lam_ref = np.linalg.eigvalsh(G)[::-1]
        Q, lam = low_rank_gaussian(jnp.asarray(Y), beta, 40, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(lam), lam_ref[:40], rtol=3e-2)
        # Q orthonormal
        QtQ = np.asarray(Q).T @ np.asarray(Q)
        np.testing.assert_allclose(QtQ, np.eye(40), atol=1e-3)


class TestDeformable:
    def test_recovers_smooth_warp(self):
        rng = np.random.default_rng(0)
        M = 600
        Y = rng.uniform(-1, 1, size=(M, 3)).astype(np.float32)
        warp = lambda p: p + 0.15 * np.sin(2 * p[:, [1, 2, 0]])
        X = warp(Y).astype(np.float32)
        reg = deformable_registration(
            X=X, Y=Y, num_eig=80, max_iterations=300, tolerance=1e-10,
            alpha=2.0, beta=2.0,
        )
        TY, _ = reg.register()
        err = np.linalg.norm(np.asarray(TY) - X, axis=1)
        assert err.mean() < 0.05  # warp scale is 0.15

    def test_out_of_sample_consistent_with_fit(self):
        """transform_point_cloud at the fitting points must reproduce TY
        (the Nystrom-consistent projection, see ops/cpd.py)."""
        rng = np.random.default_rng(1)
        M = 400
        Y = rng.uniform(-1, 1, size=(M, 3)).astype(np.float32)
        X = (Y + 0.1 * np.sin(3 * Y[:, [1, 2, 0]])).astype(np.float32)
        reg = deformable_registration(
            X=X, Y=Y, num_eig=60, max_iterations=150, tolerance=1e-10,
            alpha=2.0, beta=2.0,
        )
        TY, _ = reg.register()
        TY2 = np.asarray(reg.transform_point_cloud(Y))
        err = np.linalg.norm(TY2 - np.asarray(TY), axis=1)
        assert err.max() < 0.02

    def test_outlier_w_downweights_gross_outliers(self):
        """Myronenko & Song's uniform outlier component (w > 0): with gross
        outlier points appended to the target, w=0 drags the warp toward them
        while w=0.3 keeps the clean-data fit.  Beyond-reference knob — the
        reference pins cycpd's default w=0 (``focusr.py:299-316``)."""
        rng = np.random.default_rng(3)
        M = 400
        Y = rng.uniform(-1, 1, size=(M, 3)).astype(np.float32)
        warp = lambda p: p + 0.1 * np.sin(2 * p[:, [1, 2, 0]])
        X_clean = warp(Y).astype(np.float32)
        outliers = rng.uniform(4, 6, size=(60, 3)).astype(np.float32)
        X = np.vstack([X_clean, outliers])

        def fit_err(w):
            reg = deformable_registration(
                X=X, Y=Y, num_eig=60, max_iterations=300, tolerance=1e-10,
                alpha=2.0, beta=2.0, w=w,
            )
            TY, _ = reg.register()
            return np.linalg.norm(np.asarray(TY) - X_clean, axis=1).mean()

        err_robust = fit_err(0.3)
        err_naive = fit_err(0.0)
        assert err_robust < 0.05
        assert err_robust < err_naive

    def test_out_of_sample_interpolates(self):
        rng = np.random.default_rng(2)
        M = 600
        Y = rng.uniform(-1, 1, size=(M, 3)).astype(np.float32)
        warp = lambda p: p + 0.15 * np.sin(2 * p[:, [1, 2, 0]])
        X = warp(Y).astype(np.float32)
        reg = deformable_registration(
            X=X, Y=Y, num_eig=80, max_iterations=300, tolerance=1e-10,
            alpha=2.0, beta=2.0,
        )
        reg.register()
        Y2 = rng.uniform(-0.9, 0.9, size=(300, 3)).astype(np.float32)
        T2 = np.asarray(reg.transform_point_cloud(Y2))
        err = np.linalg.norm(T2 - warp(Y2), axis=1)
        assert err.mean() < 0.07


class TestLandmarks:
    """Prior-correspondence (landmark) terms in the deformable M-step —
    beyond-reference capability (MAP CPD with known correspondences)."""

    def test_landmarks_pin_points(self):
        rng = np.random.default_rng(7)
        M = 400
        Y = rng.uniform(-1, 1, size=(M, 3)).astype(np.float32)
        X = (Y + 0.1 * np.sin(2 * Y[:, [1, 2, 0]])).astype(np.float32)
        # Pin 3 moving points to DISPLACED targets the data does not imply.
        lm_idx = np.array([5, 100, 300], np.int32)
        lm_pos = (Y[lm_idx] + np.array([0.3, -0.2, 0.25], np.float32)[:, None] * 0.5)
        lm_w = np.full(3, 100.0, np.float32)

        kw = dict(X=X, Y=Y, num_eig=80, max_iterations=150, tolerance=1e-10,
                  alpha=2.0, beta=2.0)
        TY0, _ = deformable_registration(**kw).register()
        reg = deformable_registration(landmarks=(lm_idx, lm_pos, lm_w), **kw)
        TY, _ = reg.register()
        TY, TY0 = np.asarray(TY), np.asarray(TY0)
        # Landmarked points land near their prescribed targets (the kernel
        # regularization keeps the field smooth, so exact pinning is neither
        # expected nor desirable) ...
        d_lm = np.linalg.norm(TY[lm_idx] - lm_pos, axis=1)
        d_lm0 = np.linalg.norm(TY0[lm_idx] - lm_pos, axis=1)
        assert d_lm.max() < 0.12, d_lm
        assert np.all(d_lm < 0.5 * d_lm0), (d_lm, d_lm0)  # >=2x closer
        # ...while the rest still registers onto the data.
        rest = np.setdiff1d(np.arange(M), lm_idx)
        d_rest = np.linalg.norm(TY[rest] - X[rest], axis=1)
        assert d_rest.mean() < 0.05, d_rest.mean()

    def test_no_landmarks_is_unchanged(self):
        rng = np.random.default_rng(0)
        M = 300
        Y = rng.uniform(-1, 1, size=(M, 3)).astype(np.float32)
        X = (Y + 0.1 * np.sin(2 * Y[:, [1, 2, 0]])).astype(np.float32)
        kw = dict(X=X, Y=Y, num_eig=60, max_iterations=50, tolerance=1e-10,
                  alpha=2.0, beta=2.0)
        TY_a, _ = deformable_registration(**kw).register()
        TY_b, _ = deformable_registration(landmarks=None, **kw).register()
        np.testing.assert_array_equal(np.asarray(TY_a), np.asarray(TY_b))
