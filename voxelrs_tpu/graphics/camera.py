"""Camera math: basis vectors, view matrices, radar frustum culling
(reference: src/graphics/camera.rs:7-99)."""

from __future__ import annotations

import math

import numpy as np


def _normalize(v):
    return v / np.linalg.norm(v)


class Camera:
    def __init__(self, fov_y_deg: float, aspect_ratio: float, near: float, far: float):
        self.position = np.zeros(3, np.float32)
        self.forward = np.array([0.0, 0.0, -1.0], np.float32)
        self.up = np.array([0.0, 1.0, 0.0], np.float32)
        self.fov_y_deg = fov_y_deg
        self.aspect_ratio = aspect_ratio
        self.near = near
        self.far = far

    def right(self) -> np.ndarray:
        return _normalize(np.cross(self.forward, self.up))

    def set_rotation(self, pitch: float, yaw: float) -> None:
        """Euler rotation in radians (reference gameplay convention:
        forward = (cos(yaw)cos(pitch), sin(pitch), sin(yaw)cos(pitch)))."""
        self.forward = _normalize(
            np.array(
                [
                    math.cos(yaw) * math.cos(pitch),
                    math.sin(pitch),
                    math.sin(yaw) * math.cos(pitch),
                ],
                np.float32,
            )
        )

    def camera_basis(self):
        """Right/up/forward orthonormal basis for ray generation (the rows of
        the camera-to-world rotation used by world.glsl:121-129)."""
        f = _normalize(self.forward.astype(np.float64))
        s = _normalize(np.cross(f, self.up.astype(np.float64)))
        u = np.cross(s, f)
        return s.astype(np.float32), u.astype(np.float32), f.astype(np.float32)

    def get_world_to_camera_matrix(self) -> np.ndarray:
        s, u, f = self.camera_basis()
        eye = self.position
        m = np.eye(4, dtype=np.float32)
        m[0, :3], m[1, :3], m[2, :3] = s, u, -f
        m[0, 3] = -float(np.dot(s, eye))
        m[1, 3] = -float(np.dot(u, eye))
        m[2, 3] = float(np.dot(f, eye))
        return m

    def get_camera_to_world_matrix(self) -> np.ndarray:
        return np.linalg.inv(self.get_world_to_camera_matrix())

    def is_in_frustum(self, point, r: float) -> bool:
        """Radar frustum culling of a sphere (reference: camera.rs:75-99)."""
        cp = np.asarray(point, np.float32) - self.position
        cz = float(np.dot(cp, self.forward))
        if cz + r < self.near or cz - r > self.far:
            return False
        cz -= self.near

        right = self.right()
        up = np.cross(self.forward, right)
        cy = float(np.dot(cp, up))
        hh = cz * math.tan(math.radians(self.fov_y_deg) / 2.0)
        if cy + r < -hh or cy - r > hh:
            return False

        cx = float(np.dot(cp, right))
        wh = hh * self.aspect_ratio
        if cx + r < -wh or cx - r > wh:
            return False
        return True
