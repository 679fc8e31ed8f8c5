"""Fly-camera controller — host-side parity with App::update / handle_event.

Reference semantics (app.cpp:109-171): WASD strafes along forward/right,
space/ctrl along world up, speed 10 u/s and mouse sensitivity 0.5 deg/px
defaults (app.hpp:37-38); mouse-look adds xrel*sens to yaw and subtracts
yrel*sens from pitch; right = cross(forward, up) (note: no renormalization,
matching the reference).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from arctic_tpu.core.scene import Camera


@dataclasses.dataclass
class FlyCamera:
    speed: float = 10.0  # app.hpp:37
    sensitivity: float = 0.5  # app.hpp:38

    def move(
        self,
        camera: Camera,
        dt: float,
        forward_input: float = 0.0,
        right_input: float = 0.0,
        up_input: float = 0.0,
    ) -> Camera:
        import jax.numpy as jnp

        rot = np.asarray(camera.rotation, np.float32)
        x, y = np.radians(rot[0]), np.radians(rot[1])
        fwd = np.array([np.cos(x) * np.cos(y), np.sin(x), np.cos(x) * np.sin(y)], np.float32)
        up = np.array([0.0, 1.0, 0.0], np.float32)
        right = np.cross(fwd, up)
        eye = np.asarray(camera.eye, np.float32)
        eye = eye + self.speed * dt * (
            forward_input * fwd + up_input * up + right_input * right
        )
        return dataclasses.replace(camera, eye=jnp.asarray(eye))

    def look(self, camera: Camera, dx_px: float, dy_px: float) -> Camera:
        import jax.numpy as jnp

        rot = np.asarray(camera.rotation, np.float32)
        rot = rot + np.array([-dy_px * self.sensitivity, dx_px * self.sensitivity], np.float32)
        return dataclasses.replace(camera, rotation=jnp.asarray(rot))
