"""App layer: CLI render smoke test + fly-camera parity math."""

import numpy as np
import jax.numpy as jnp

from arctic_tpu.app.camera import FlyCamera
from arctic_tpu.app.cli import main
from arctic_tpu.core.scene import default_scene_params
from arctic_tpu.utils.profiling import FrameStats


def test_cli_renders_procedural_scene(tmp_path):
    out = tmp_path / "frame.png"
    rc = main(
        [
            "render",
            "--procedural",
            "cornell",
            "--width",
            "96",
            "--height",
            "64",
            "--shadow-size",
            "96",
            "--bruteforce",
            "--tm",
            "aces",
            "--camera",
            "0,4,3,-25,-90",
            "--out",
            str(out),
            "--stats",
        ]
    )
    assert rc == 0
    from PIL import Image

    with Image.open(out) as im:
        assert im.size == (96, 64)
        img = np.asarray(im)
    assert img.std() > 10  # actual content


def test_fly_camera_matches_reference_math():
    cam = default_scene_params().camera
    fc = FlyCamera()
    # One second forward at default yaw 0 -> forward is +X (dir_from_rot).
    moved = fc.move(cam, dt=1.0, forward_input=1.0)
    np.testing.assert_allclose(np.asarray(moved.eye), [10.0, 5.0, 0.0], atol=1e-5)
    # Right = cross(forward, up) = (0,0, ... ) for fwd=+X, up=+Y: right=-Z?
    moved = fc.move(cam, dt=0.5, right_input=1.0)
    fwd = np.array([1.0, 0, 0])
    right = np.cross(fwd, [0, 1, 0])
    np.testing.assert_allclose(np.asarray(moved.eye), np.array([0, 5, 0]) + 5 * right, atol=1e-5)
    # Mouse look: +dx yaw, -dy pitch at 0.5 deg/px (app.cpp:143-147).
    looked = fc.look(cam, dx_px=10, dy_px=4)
    np.testing.assert_allclose(np.asarray(looked.rotation), [-2.0, 5.0], atol=1e-6)


def test_frame_stats():
    s = FrameStats(capacity=4)
    for _ in range(6):
        s.tick()
    assert len(s.history) == 4
    assert "fps" in s.summary()
