"""Constant-velocity Kalman filters for track-state estimation (numpy).

Counterpart of the reference filters
(/root/reference/ultralytics/trackers/utils/kalman_filter.py:7 KalmanFilterXYAH,
:289 KalmanFilterXYWH): 8-dim state (center, aspect/size, velocities),
chi-square gating. Host-side — tracking is sequential per-video logic, not
device work.
"""

from __future__ import annotations

import numpy as np

# 0.95 chi-square quantiles for gating (dim -> threshold)
chi2inv95 = {1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877, 5: 11.070, 6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919}


class KalmanFilterXYAH:
    """State: [x, y, a, h, vx, vy, va, vh] (a = aspect ratio)."""

    ndim = 4

    def __init__(self):
        dt = 1.0
        self._motion_mat = np.eye(2 * self.ndim)
        for i in range(self.ndim):
            self._motion_mat[i, self.ndim + i] = dt
        self._update_mat = np.eye(self.ndim, 2 * self.ndim)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def _pos_std(self, mean):
        return mean[3]

    def initiate(self, measurement: np.ndarray):
        mean = np.concatenate([measurement, np.zeros(4)])
        m = self._pos_std(mean)
        std = [
            2 * self._std_weight_position * m, 2 * self._std_weight_position * m,
            1e-2, 2 * self._std_weight_position * m,
            10 * self._std_weight_velocity * m, 10 * self._std_weight_velocity * m,
            1e-5, 10 * self._std_weight_velocity * m,
        ]
        return mean, np.diag(np.square(std))

    def predict(self, mean: np.ndarray, covariance: np.ndarray):
        m = self._pos_std(mean)
        std_pos = [self._std_weight_position * m] * 2 + [1e-2, self._std_weight_position * m]
        std_vel = [self._std_weight_velocity * m] * 2 + [1e-5, self._std_weight_velocity * m]
        motion_cov = np.diag(np.square(np.concatenate([std_pos, std_vel])))
        mean = self._motion_mat @ mean
        covariance = self._motion_mat @ covariance @ self._motion_mat.T + motion_cov
        return mean, covariance

    def project(self, mean: np.ndarray, covariance: np.ndarray):
        m = self._pos_std(mean)
        std = [self._std_weight_position * m] * 2 + [1e-1, self._std_weight_position * m]
        innovation_cov = np.diag(np.square(std))
        mean_p = self._update_mat @ mean
        cov_p = self._update_mat @ covariance @ self._update_mat.T + innovation_cov
        return mean_p, cov_p

    def update(self, mean: np.ndarray, covariance: np.ndarray, measurement: np.ndarray):
        proj_mean, proj_cov = self.project(mean, covariance)
        chol = np.linalg.cholesky(proj_cov)
        kalman_gain = np.linalg.solve(
            chol.T, np.linalg.solve(chol, (covariance @ self._update_mat.T).T)
        ).T
        innovation = measurement - proj_mean
        new_mean = mean + kalman_gain @ innovation
        new_cov = covariance - kalman_gain @ proj_cov @ kalman_gain.T
        return new_mean, new_cov

    def gating_distance(self, mean, covariance, measurements, only_position=False, metric="maha"):
        proj_mean, proj_cov = self.project(mean, covariance)
        if only_position:
            proj_mean, proj_cov = proj_mean[:2], proj_cov[:2, :2]
            measurements = measurements[:, :2]
        d = measurements - proj_mean
        if metric == "gaussian":
            return np.sum(d * d, axis=1)
        chol = np.linalg.cholesky(proj_cov)
        z = np.linalg.solve(chol, d.T)
        return np.sum(z * z, axis=0)

    def multi_predict(self, means: np.ndarray, covariances: np.ndarray):
        out_m = np.empty_like(means)
        out_c = np.empty_like(covariances)
        for i in range(len(means)):
            out_m[i], out_c[i] = self.predict(means[i], covariances[i])
        return out_m, out_c


class KalmanFilterXYWH(KalmanFilterXYAH):
    """State: [x, y, w, h, ...] — size-proportional noise on both w and h
    (reference: kalman_filter.py:289). Used by BoT-SORT."""

    def _std3(self, mean, weight):
        return [weight * mean[2], weight * mean[3], weight * mean[2], weight * mean[3]]

    def initiate(self, measurement):
        mean = np.concatenate([measurement, np.zeros(4)])
        std = self._std3(mean, 2 * self._std_weight_position) + self._std3(mean, 10 * self._std_weight_velocity)
        return mean, np.diag(np.square(std))

    def predict(self, mean, covariance):
        std = self._std3(mean, self._std_weight_position) + self._std3(mean, self._std_weight_velocity)
        motion_cov = np.diag(np.square(std))
        mean = self._motion_mat @ mean
        covariance = self._motion_mat @ covariance @ self._motion_mat.T + motion_cov
        return mean, covariance

    def project(self, mean, covariance):
        std = self._std3(mean, self._std_weight_position)
        innovation_cov = np.diag(np.square(std))
        mean_p = self._update_mat @ mean
        cov_p = self._update_mat @ covariance @ self._update_mat.T + innovation_cov
        return mean_p, cov_p
