"""Position/velocity track filter: a 6-state Kalman filter fusing the
Gauss-Newton position fixes with the Doppler velocity solves.

No reference equivalent — the reference reports raw per-epoch fixes and
a running mean (gpseval.py:320-369), which is only meaningful for a
static receiver.  Here every fix carries a real covariance
((J'WJ)^-1 from calibrated per-satellite sigmas, ops/pvt.py) and every
reporting interval yields an independent carrier-derived velocity with
its own covariance, so the textbook constant-velocity Kalman filter
applies with *measured* noise models, not hand-tuned ones:

  state   x = [pos(3), vel(3)] ECEF
  predict F = [[I, dt I], [0, I]],  Q = white-acceleration q_accel^2
  update  position fixes (H = [I 0]) and velocity solves (H = [0 I])

Host float64; one 6x6 filter per receiver — microseconds per epoch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class TrackFilter:
    """Constant-velocity Kalman filter over ECEF position/velocity.

    q_accel: white-acceleration process noise [m/s^2] — the expected
    unmodeled acceleration (0.5 walking, ~3 driving, 0 static-surveys).
    """

    q_accel: float = 1.0
    x: np.ndarray | None = None          # [6]
    p: np.ndarray = field(default_factory=lambda: np.zeros((6, 6)))
    t: float | None = None               # time of current state, s

    def _predict(self, t_new: float) -> None:
        dt = t_new - self.t
        if dt <= 0:
            return
        f = np.eye(6)
        f[:3, 3:] = dt * np.eye(3)
        self.x = f @ self.x
        # white-acceleration Q (discretized): [[dt^4/4, dt^3/2],
        # [dt^3/2, dt^2]] * q^2 per axis
        q2 = self.q_accel ** 2
        q = np.zeros((6, 6))
        q[:3, :3] = np.eye(3) * (0.25 * dt ** 4 * q2)
        q[:3, 3:] = q[3:, :3] = np.eye(3) * (0.5 * dt ** 3 * q2)
        q[3:, 3:] = np.eye(3) * (dt ** 2 * q2)
        self.p = f @ self.p @ f.T + q
        self.t = t_new

    def _update(self, h: np.ndarray, z: np.ndarray, r: np.ndarray,
                gate_sigma: float | None = None) -> bool:
        y = z - h @ self.x
        s = h @ self.p @ h.T + r
        try:
            si = np.linalg.inv(s)
        except np.linalg.LinAlgError:
            return False
        if gate_sigma is not None:
            # Mahalanobis innovation gate: reject measurements wildly
            # inconsistent with the track (multipath-class outliers the
            # running-mean gate would average in)
            if float(y @ si @ y) > gate_sigma ** 2 * len(z):
                return False
        k = self.p @ h.T @ si
        self.x = self.x + k @ y
        ikh = np.eye(6) - k @ h
        # Joseph form: keeps P symmetric positive under roundoff
        self.p = ikh @ self.p @ ikh.T + k @ r @ k.T
        return True

    def update_pos(self, t: float, pos: np.ndarray,
                   cov: np.ndarray | None,
                   gate_sigma: float = 6.0) -> bool:
        """Fuse one position fix [3] with covariance [3, 3] (m^2)."""
        r = (np.asarray(cov, np.float64) if cov is not None
             else np.eye(3) * 100.0)
        if self.x is None:
            self.x = np.concatenate([pos, np.zeros(3)])
            self.p = np.zeros((6, 6))
            self.p[:3, :3] = r
            self.p[3:, 3:] = np.eye(3) * 100.0       # unknown velocity
            self.t = t
            return True
        self._predict(t)
        h = np.zeros((3, 6))
        h[:, :3] = np.eye(3)
        return self._update(h, np.asarray(pos, np.float64), r,
                            gate_sigma)

    def update_vel(self, t: float, vel: np.ndarray,
                   cov: np.ndarray | None,
                   gate_sigma: float = 6.0) -> bool:
        """Fuse one Doppler velocity solve [3] with covariance [3, 3]."""
        if self.x is None:
            return False
        self._predict(t)
        r = (np.asarray(cov, np.float64) if cov is not None
             else np.eye(3) * 1.0)
        h = np.zeros((3, 6))
        h[:, 3:] = np.eye(3)
        return self._update(h, np.asarray(vel, np.float64), r,
                            gate_sigma)

    @property
    def pos(self) -> np.ndarray | None:
        return None if self.x is None else self.x[:3]

    @property
    def vel(self) -> np.ndarray | None:
        return None if self.x is None else self.x[3:]
