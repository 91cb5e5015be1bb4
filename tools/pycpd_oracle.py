"""CPD oracle transcribing the *consumed library's* actual code path.

The reference delegates point-set registration to **cycpd**
(gattia/cycpd), a Cython port of **pycpd** (siavashk/pycpd); the consumed
API is ``cycpd.deformable_registration(X, Y, num_eig, max_iterations,
tolerance, alpha, beta)`` / ``cycpd.affine_registration(X, Y,
max_iterations, tolerance)`` + ``reg.register()`` +
``reg.transform_point_cloud(pts)`` (``/root/reference/pyfocusr/focusr.py:297-334``).

This module is a line-faithful f64 transcription of pycpd's
``EMRegistration`` / ``DeformableRegistration(low_rank=True)`` /
``AffineRegistration`` classes — the code cycpd cythonizes — NOT a
re-derivation from the Myronenko & Song equations.  Every behavioral
convention of that code path is preserved, including the ones a paper
re-derivation would get "wrong":

  * E-step denominator: ``clip(column_sum, float_eps) + c`` with
    ``c = (2*pi*sigma2)^(D/2) * w/(1-w) * M/N`` (uniform-outlier term).
  * ``low_rank_eigen``: full ``eigh`` of G, columns ordered by
    DESCENDING |eigenvalue|.
  * Deformable stopping: ``|sigma2 - sigma2_prev| <= tolerance`` (pycpd
    tracks the *variance* for deformable, unlike affine which tracks the
    objective q).
  * Affine stopping: ``|q - q_prev| <= tolerance`` with
    ``q = (xPx - 2 trAB + trBYPYB) / (2 sigma2) + D*Np/2 * log sigma2``.
  * ``sigma2 <= 0`` reset to ``tolerance / 10`` (both registrations).
  * Deformable OUT-OF-SAMPLE transform: ``pts + G(pts, Y0) @ W`` with the
    FULL Gaussian kernel and the *unprojected* W — even though the
    in-sample TY uses the low-rank ``Q S Q^T W``.  (pycpd's documented
    internal inconsistency; the reference hits exactly this path when it
    transforms the full target spectral cloud at ``focusr.py:334``.)
  * ``register()`` runs ``transform_point_cloud()`` once before the loop;
    each iteration is expectation -> update_transform ->
    transform_point_cloud -> update_variance.

The older ``tools/reference_pipeline.cpd_*`` helpers (round-2 oracle) were
derived from the paper; ``tests/test_cpd_oracles.py`` quantifies where the
two disagree and the golden gates now run through THIS transcription.
"""

from __future__ import annotations

import numpy as np


def gaussian_kernel(X, beta, Y=None):
    """pycpd ``utility.gaussian_kernel``: G_ij = exp(-|x_i - y_j|^2 / (2 beta^2))."""
    if Y is None:
        Y = X
    diff = X[:, None, :] - Y[None, :, :]
    diff = np.square(diff)
    diff = np.sum(diff, axis=2)
    return np.exp(-diff / (2 * beta**2))


def low_rank_eigen(G, num_eig):
    """pycpd ``utility.low_rank_eigen``: top-|lambda| eigenpairs via full eigh."""
    S, Q = np.linalg.eigh(G)
    eig_indices = list(np.argsort(np.abs(S))[::-1][: int(num_eig)])
    Q = Q[:, eig_indices]
    S = S[eig_indices]
    return Q, S


def initialize_sigma2(X, Y):
    """pycpd ``EMRegistration.initialize_sigma2``: mean pairwise sq dist / D."""
    (N, D) = X.shape
    (M, _) = Y.shape
    diff = X[None, :, :] - Y[:, None, :]
    err = diff**2
    return np.sum(err) / (D * M * N)


class EMRegistration:
    """pycpd ``emregistration.EMRegistration`` (the base EM loop cycpd
    cythonizes), f64 throughout."""

    def __init__(self, X, Y, sigma2=None, max_iterations=None, tolerance=None,
                 w=None, **kwargs):
        self.X = np.asarray(X, np.float64)
        self.Y = np.asarray(Y, np.float64)
        self.TY = np.array(self.Y, copy=True)
        self.sigma2 = sigma2
        (self.N, self.D) = self.X.shape
        (self.M, _) = self.Y.shape
        self.tolerance = 0.001 if tolerance is None else tolerance
        self.w = 0.0 if w is None else w
        self.max_iterations = 100 if max_iterations is None else int(max_iterations)
        self.iteration = 0
        self.diff = np.inf
        self.q = np.inf
        self.P = np.zeros((self.M, self.N))
        self.Pt1 = np.zeros((self.N,))
        self.P1 = np.zeros((self.M,))
        self.PX = np.zeros((self.M, self.D))
        self.Np = 0

    def register(self):
        if self.sigma2 is None:
            self.sigma2 = initialize_sigma2(self.X, self.Y)
        self.transform_point_cloud()
        while self.iteration < self.max_iterations and self.diff > self.tolerance:
            self.iterate()
        return self.TY, self.get_registration_parameters()

    def iterate(self):
        self.expectation()
        self.maximization()
        self.iteration += 1

    def expectation(self):
        # P_mn = exp(-|x_n - T(y_m)|^2 / (2 sigma2)), column-normalized with
        # the uniform-outlier constant c (pycpd expectation()).
        P = np.sum((self.X[None, :, :] - self.TY[:, None, :]) ** 2, axis=2)
        P = np.exp(-P / (2 * self.sigma2))
        c = (2 * np.pi * self.sigma2) ** (self.D / 2)
        c = c * self.w / (1.0 - self.w)
        c = c * self.M / self.N
        den = np.sum(P, axis=0)
        den = np.clip(den, np.finfo(self.X.dtype).eps, None) + c
        self.P = np.divide(P, den[None, :])
        self.Pt1 = np.sum(self.P, axis=0)
        self.P1 = np.sum(self.P, axis=1)
        self.Np = np.sum(self.P1)
        self.PX = np.matmul(self.P, self.X)

    def maximization(self):
        self.update_transform()
        self.transform_point_cloud()
        self.update_variance()

    # subclass responsibilities
    def update_transform(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def transform_point_cloud(self, Y=None):  # pragma: no cover - abstract
        raise NotImplementedError

    def update_variance(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def get_registration_parameters(self):  # pragma: no cover - abstract
        raise NotImplementedError


class DeformableRegistration(EMRegistration):
    """pycpd ``deformable_registration.DeformableRegistration`` with
    ``low_rank=True`` — the cycpd path the reference consumes (``num_eig``
    kwarg, ``focusr.py:307``)."""

    def __init__(self, alpha=None, beta=None, num_eig=100, **kwargs):
        super().__init__(**kwargs)
        self.alpha = 2 if alpha is None else alpha
        self.beta = 2 if beta is None else beta
        self.W = np.zeros((self.M, self.D))
        self.G = gaussian_kernel(self.Y, self.beta)
        self.num_eig = int(num_eig)
        self.Q, self.S = low_rank_eigen(self.G, self.num_eig)
        self.inv_S = np.diag(1.0 / self.S)
        self.S = np.diag(self.S)
        self.E = 0.0

    def update_transform(self):
        # Low-rank Woodbury solve for W (pycpd update_transform, low_rank
        # branch): W = 1/(alpha sigma2) (F - dPQ (alpha sigma2 inv_S
        # + Q^T dPQ)^{-1} Q^T F), F = PX - diag(P1) Y.
        dP = self.P1[:, None]  # diag(P1) applied row-wise
        dPQ = dP * self.Q
        F = self.PX - dP * self.Y
        self.W = (
            1
            / (self.alpha * self.sigma2)
            * (
                F
                - np.matmul(
                    dPQ,
                    np.linalg.solve(
                        self.alpha * self.sigma2 * self.inv_S
                        + np.matmul(self.Q.T, dPQ),
                        np.matmul(self.Q.T, F),
                    ),
                )
            )
        )
        QtW = np.matmul(self.Q.T, self.W)
        self.E = self.E + self.alpha / 2 * np.trace(
            np.matmul(QtW.T, np.matmul(self.S, QtW))
        )

    def transform_point_cloud(self, Y=None):
        if Y is not None:
            # OUT-OF-SAMPLE: full kernel vs the ORIGINAL control points,
            # unprojected W (pycpd's convention; hit at focusr.py:334).
            G = gaussian_kernel(X=np.asarray(Y, np.float64), beta=self.beta,
                                Y=self.Y)
            return np.asarray(Y, np.float64) + np.dot(G, self.W)
        # in-sample: the low-rank reconstruction Q S Q^T W
        self.TY = self.Y + np.matmul(
            self.Q, np.matmul(self.S, np.matmul(self.Q.T, self.W))
        )

    def update_variance(self):
        # pycpd deformable update_variance: the convergence test tracks the
        # CHANGE IN sigma2 (not the objective q, which pycpd sets to inf).
        qprev = self.sigma2
        self.q = np.inf
        xPx = np.dot(
            np.transpose(self.Pt1), np.sum(np.multiply(self.X, self.X), axis=1)
        )
        yPy = np.dot(
            np.transpose(self.P1), np.sum(np.multiply(self.TY, self.TY), axis=1)
        )
        trPXY = np.sum(np.multiply(self.TY, self.PX))
        self.sigma2 = (xPx - 2 * trPXY + yPy) / (self.Np * self.D)
        if self.sigma2 <= 0:
            self.sigma2 = self.tolerance / 10
        self.diff = np.abs(self.sigma2 - qprev)

    def get_registration_parameters(self):
        return self.G, self.W


class AffineRegistration(EMRegistration):
    """pycpd ``affine_registration.AffineRegistration`` (cycpd substitutes
    this for rigid at D > 3, reference comment ``focusr.py:318``)."""

    def __init__(self, B=None, t=None, **kwargs):
        super().__init__(**kwargs)
        self.B = np.eye(self.D) if B is None else B
        self.t = np.atleast_2d(np.zeros((1, self.D))) if t is None else t
        self.YPY = None
        self.A = None
        self.X_hat = None

    def update_transform(self):
        muX = np.divide(np.sum(self.PX, axis=0), self.Np)
        muY = np.divide(
            np.sum(np.dot(np.transpose(self.P), self.Y), axis=0), self.Np
        )
        self.X_hat = self.X - np.tile(muX, (self.N, 1))
        Y_hat = self.Y - np.tile(muY, (self.M, 1))
        self.A = np.dot(np.transpose(self.X_hat), np.transpose(self.P))
        self.A = np.dot(self.A, Y_hat)
        self.YPY = np.dot(np.transpose(Y_hat), np.diag(self.P1))
        self.YPY = np.dot(self.YPY, Y_hat)
        # pycpd's B right-multiplies Y (TY = Y B + t).
        self.B = np.linalg.solve(np.transpose(self.YPY), np.transpose(self.A))
        self.t = np.transpose(muX) - np.dot(np.transpose(self.B), np.transpose(muY))

    def transform_point_cloud(self, Y=None):
        if Y is not None:
            return np.dot(np.asarray(Y, np.float64), self.B) + self.t
        self.TY = np.dot(self.Y, self.B) + np.tile(self.t, (self.M, 1))

    def update_variance(self):
        qprev = self.q
        trAB = np.trace(np.dot(self.A, self.B))
        xPx = np.dot(
            np.transpose(self.Pt1),
            np.sum(np.multiply(self.X_hat, self.X_hat), axis=1),
        )
        # Transcribed as pycpd writes it (B YPY B, no transpose on the first
        # factor); only feeds the q-diff stopping test, never the fit.
        trBYPYB = np.trace(np.dot(np.dot(self.B, self.YPY), self.B))
        self.q = (xPx - 2 * trAB + trBYPYB) / (2 * self.sigma2) + self.D * self.Np / 2 * np.log(self.sigma2)
        self.diff = np.abs(self.q - qprev)
        self.sigma2 = (xPx - trAB) / (self.Np * self.D)
        if self.sigma2 <= 0:
            self.sigma2 = self.tolerance / 10

    def get_registration_parameters(self):
        return self.B, self.t


# ---------------------------------------------------------------------------
# cycpd-shaped constructors (the names/kwargs focusr.py consumes)
# ---------------------------------------------------------------------------

def deformable_registration(**kwargs):
    """cycpd-consumed constructor shape (``focusr.py:299-316``)."""
    kwargs.pop("verbose", None)
    return DeformableRegistration(**kwargs)


def affine_registration(**kwargs):
    """cycpd-consumed constructor shape (``focusr.py:319-331``)."""
    kwargs.pop("verbose", None)
    return AffineRegistration(**kwargs)
