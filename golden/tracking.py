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
