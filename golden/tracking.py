"""Golden speaker tracker: iterated EKF on TDOA observations.

Capability parity target: the reference's Kalman speaker tracking
(McDonough-Klee IEKF on TDOAs, square-root propagation) (SURVEY.md §2.1
"tracker" [K]; BASELINE.json config 3).

State: source position p ∈ R³ (random-walk process model).
Observation: pairwise TDOAs h(p) with Jacobian from unit vectors.
"""

from __future__ import annotations

import numpy as np

from golden.tde import expected_tdoas


def tdoa_jacobian(pos, mics, pairs, c):
    d = np.linalg.norm(mics - pos[None, :], axis=1)
    u = (pos[None, :] - mics) / np.maximum(d[:, None], 1e-9)
    return np.stack([(u[j] - u[i]) / c for i, j in pairs])


class IekfTracker:
    """Iterated EKF with Joseph-form covariance update."""

    def __init__(self, x0, P0, q, r, mics, pairs, c=343.0, iters=3):
        self.x = np.asarray(x0, np.float64)
        self.P = np.asarray(P0, np.float64)
        self.q = q  # process noise (position random walk variance / step)
        self.r = r  # TDOA observation noise variance
        self.mics = mics
        self.pairs = pairs
        self.c = c
        self.iters = iters

    def step(self, tdoas: np.ndarray) -> np.ndarray:
        # predict
        self.P = self.P + self.q * np.eye(3)
        # iterated update
        x0 = self.x.copy()
        xi = self.x.copy()
        R = self.r * np.eye(len(self.pairs))
        for _ in range(self.iters):
            h = expected_tdoas(xi, self.mics, self.pairs, self.c)
            H = tdoa_jacobian(xi, self.mics, self.pairs, self.c)
            S = H @ self.P @ H.T + R
            K = self.P @ H.T @ np.linalg.inv(S)
            xi = x0 + K @ (tdoas - h - H @ (x0 - xi))
        H = tdoa_jacobian(xi, self.mics, self.pairs, self.c)
        K = self.P @ H.T @ np.linalg.inv(H @ self.P @ H.T + R)
        IKH = np.eye(3) - K @ H
        self.P = IKH @ self.P @ IKH.T + K @ R @ K.T  # Joseph form
        self.x = xi
        return self.x


def _qr_lower(M: np.ndarray) -> np.ndarray:
    """QR-based lower-triangular factor: returns L with L Lᵀ = Mᵀ M."""
    R = np.linalg.qr(M, mode="r")
    # fix signs so the diagonal is non-negative (unique Cholesky factor)
    s = np.sign(np.diag(R))
    s[s == 0] = 1.0
    return (R * s[:, None]).T


class SqrtIekfTracker:
    """Square-root IEKF: covariance propagated as a Cholesky factor.

    Capability parity: the reference's square-root (Cholesky/Givens)
    Kalman propagation (`btk/squareRoot/` [K], SURVEY.md §2.1 tracker).
    Here the Givens-rotation triangularisation is realised as a QR
    factorisation of the Kailath pre-array:

        [[R^{1/2}  H S⁻],      QR       [[S_yy    0  ],
         [0        S⁻  ]]   =======>     [K̄       S⁺ ]]   (lower post-array)

    with Kalman gain K = K̄ S_yy⁻¹ and S⁺ the posterior Cholesky factor —
    algebraically identical to the Joseph form but never forming P.
    """

    def __init__(self, x0, S0, q, r, mics, pairs, c=343.0, iters=3):
        self.x = np.asarray(x0, np.float64)
        self.S = np.asarray(S0, np.float64)  # lower-triangular, P = S Sᵀ
        self.q = q
        self.r = r
        self.mics = mics
        self.pairs = pairs
        self.c = c
        self.iters = iters

    def step(self, tdoas: np.ndarray) -> np.ndarray:
        n = self.S.shape[0]
        m = len(self.pairs)
        # predict: chol(S Sᵀ + q I) via QR of the stacked pre-array
        S_pred = _qr_lower(np.vstack([self.S.T, np.sqrt(self.q) * np.eye(n)]))
        P_pred = S_pred @ S_pred.T
        # iterated state update (gain from the factored covariance)
        x0 = self.x.copy()
        xi = x0.copy()
        R = self.r * np.eye(m)
        for _ in range(self.iters):
            h = expected_tdoas(xi, self.mics, self.pairs, self.c)
            H = tdoa_jacobian(xi, self.mics, self.pairs, self.c)
            Sy = H @ P_pred @ H.T + R
            K = np.linalg.solve(Sy, H @ P_pred).T
            xi = x0 + K @ (tdoas - h - H @ (x0 - xi))
        # covariance update: one QR of the Kailath pre-array at the final xi
        H = tdoa_jacobian(xi, self.mics, self.pairs, self.c)
        pre = np.zeros((m + n, m + n))
        pre[:m, :m] = np.sqrt(self.r) * np.eye(m)
        pre[:m, m:] = H @ S_pred
        pre[m:, m:] = S_pred
        post = _qr_lower(pre.T)  # L Lᵀ = pre preᵀ → [[S_yy, 0], [K̄, S_post]]
        self.S = post[m:, m:]
        self.x = xi
        return self.x
