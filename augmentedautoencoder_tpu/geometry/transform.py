"""Rotation / quaternion utilities.

Fresh implementations of the standard rotation math the reference pulls from
Gohlke's transformations library (auto_pose/ae/pysixd_stuff/transform.py):
axis-angle rotation matrices, quaternion<->matrix conversion, uniform random
rotations (Shoemake's subgroup algorithm), and angular distance.

Quaternions use (w, x, y, z) ordering.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np


def unit_vector(v: Sequence[float]) -> np.ndarray:
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def rotation_matrix(
    angle: float, direction: Sequence[float], point: Optional[Sequence[float]] = None
) -> np.ndarray:
    """4x4 homogeneous matrix rotating by `angle` around axis `direction`
    (through `point` if given). Matches Gohlke's convention
    (reference transform.py rotation_matrix)."""
    sina = math.sin(angle)
    cosa = math.cos(angle)
    d = unit_vector(direction[:3])

    R = np.diag([cosa, cosa, cosa])
    R += np.outer(d, d) * (1.0 - cosa)
    d_s = d * sina
    R += np.array(
        [
            [0.0, -d_s[2], d_s[1]],
            [d_s[2], 0.0, -d_s[0]],
            [-d_s[1], d_s[0], 0.0],
        ]
    )
    M = np.identity(4)
    M[:3, :3] = R
    if point is not None:
        point = np.asarray(point[:3], dtype=np.float64)
        M[:3, 3] = point - R.dot(point)
    return M


def quaternion_matrix(q: Sequence[float]) -> np.ndarray:
    """4x4 rotation matrix from quaternion (w, x, y, z)."""
    q = np.asarray(q, dtype=np.float64)
    n = np.dot(q, q)
    if n < 1e-12:
        return np.identity(4)
    q = q * math.sqrt(2.0 / n)
    q = np.outer(q, q)
    M = np.array(
        [
            [1.0 - q[2, 2] - q[3, 3], q[1, 2] - q[3, 0], q[1, 3] + q[2, 0], 0.0],
            [q[1, 2] + q[3, 0], 1.0 - q[1, 1] - q[3, 3], q[2, 3] - q[1, 0], 0.0],
            [q[1, 3] - q[2, 0], q[2, 3] + q[1, 0], 1.0 - q[1, 1] - q[2, 2], 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    return M


def quaternion_from_matrix(M: np.ndarray) -> np.ndarray:
    """Quaternion (w, x, y, z) from a rotation matrix (3x3 or 4x4)."""
    R = np.asarray(M, dtype=np.float64)[:3, :3]
    t = np.trace(R)
    if t > 0.0:
        s = math.sqrt(t + 1.0) * 2.0
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = math.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2.0
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = math.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2.0
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = math.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2.0
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def random_quaternion(rand: Optional[np.ndarray] = None) -> np.ndarray:
    """Uniform random unit quaternion (w, x, y, z), Shoemake's method.

    Same construction as the reference's random_quaternion so that seeded
    random view generation is reproducible across the two codebases.
    """
    if rand is None:
        rand = np.random.rand(3)
    else:
        rand = np.asarray(rand, dtype=np.float64)
        assert rand.shape == (3,)
    r1 = math.sqrt(1.0 - rand[0])
    r2 = math.sqrt(rand[0])
    t1 = 2.0 * math.pi * rand[1]
    t2 = 2.0 * math.pi * rand[2]
    return np.array(
        [math.cos(t2) * r2, math.sin(t1) * r1, math.cos(t1) * r1, math.sin(t2) * r2]
    )


def random_rotation_matrix(rand: Optional[np.ndarray] = None) -> np.ndarray:
    """4x4 uniform random rotation matrix."""
    return quaternion_matrix(random_quaternion(rand))


def rotation_angle(R: np.ndarray) -> float:
    """Geodesic rotation angle of R in radians."""
    c = (np.trace(np.asarray(R)[:3, :3]) - 1.0) * 0.5
    return float(np.arccos(np.clip(c, -1.0, 1.0)))


def rotation_error(R1: np.ndarray, R2: np.ndarray) -> float:
    """Angular distance between two rotations in radians (the `re` metric)."""
    return rotation_angle(np.asarray(R1)[:3, :3].T @ np.asarray(R2)[:3, :3])


def rotz(angle: float) -> np.ndarray:
    """3x3 rotation about +z."""
    c, s = math.cos(angle), math.sin(angle)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
