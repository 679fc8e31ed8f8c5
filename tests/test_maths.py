"""Unit tests for core matrix math vs independent numpy reimplementations.

These check the GLM RH / ZERO_TO_ONE conventions the reference relies on
(scene.cpp:26-70) against hand-written numpy formulas and known values.
"""

import numpy as np
import jax.numpy as jnp

from arctic_tpu.core import maths
from arctic_tpu.core.scene import Camera, DirectionalLight, default_scene_params


def np_look_at_rh(eye, center, up):
    eye, center, up = map(lambda v: np.asarray(v, np.float64), (eye, center, up))
    f = center - eye
    f /= np.linalg.norm(f)
    s = np.cross(f, up)
    s /= np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4)
    m[0, :3], m[1, :3], m[2, :3] = s, u, -f
    m[0, 3], m[1, 3], m[2, 3] = -s @ eye, -u @ eye, f @ eye
    return m


def np_perspective_rh_zo(fovy, aspect, n, f):
    t = np.tan(fovy / 2)
    m = np.zeros((4, 4))
    m[0, 0] = 1 / (aspect * t)
    m[1, 1] = 1 / t
    m[2, 2] = f / (n - f)
    m[2, 3] = -f * n / (f - n)
    m[3, 2] = -1
    return m


def np_ortho_rh_zo(l, r, b, t, n, f):
    m = np.eye(4)
    m[0, 0] = 2 / (r - l)
    m[1, 1] = 2 / (t - b)
    m[2, 2] = -1 / (f - n)
    m[0, 3] = -(r + l) / (r - l)
    m[1, 3] = -(t + b) / (t - b)
    m[2, 3] = -n / (f - n)
    return m


def test_dir_from_rot():
    # scene.cpp:9-19: (cos x cos y, sin x, cos x sin y), degrees.
    d = np.asarray(maths.dir_from_rot(jnp.array([0.0, 0.0])))
    np.testing.assert_allclose(d, [1, 0, 0], atol=1e-6)
    d = np.asarray(maths.dir_from_rot(jnp.array([90.0, 0.0])))
    np.testing.assert_allclose(d, [0, 1, 0], atol=1e-6)
    d = np.asarray(maths.dir_from_rot(jnp.array([0.0, 90.0])))
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)
    d = np.asarray(maths.dir_from_rot(jnp.array([-70.0, 12.0])))
    x = np.radians(-70.0)
    y = np.radians(12.0)
    np.testing.assert_allclose(
        d, [np.cos(x) * np.cos(y), np.sin(x), np.cos(x) * np.sin(y)], rtol=1e-6
    )


def test_look_at_rh():
    eye, center, up = [1.0, 2.0, 3.0], [4.0, -1.0, 0.5], [0.0, 1.0, 0.0]
    got = np.asarray(maths.look_at_rh(jnp.array(eye), jnp.array(center), jnp.array(up)))
    np.testing.assert_allclose(got, np_look_at_rh(eye, center, up), atol=1e-6)
    # Camera at origin looking down -Z is identity.
    got = np.asarray(
        maths.look_at_rh(jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]), jnp.array([0, 1.0, 0]))
    )
    np.testing.assert_allclose(got, np.eye(4), atol=1e-7)


def test_perspective_depth_range_zero_to_one():
    # GLM_FORCE_DEPTH_ZERO_TO_ONE (CMakeLists.txt:150): near -> z/w = 0, far -> 1.
    n, f = 0.1, 1000.0
    p = np.asarray(maths.perspective_rh_zo(np.radians(45.0), 16 / 9, n, f))
    np.testing.assert_allclose(p, np_perspective_rh_zo(np.radians(45.0), 16 / 9, n, f), rtol=1e-6)
    for z_view, expect in [(-n, 0.0), (-f, 1.0)]:
        clip = p @ np.array([0, 0, z_view, 1.0])
        np.testing.assert_allclose(clip[2] / clip[3], expect, atol=1e-6)
        assert clip[3] > 0  # w = -z_view for points in front


def test_ortho_rh_zo():
    got = np.asarray(maths.ortho_rh_zo(-16.0, 16.0, -16.0, 16.0, 0.1, 50.0))
    np.testing.assert_allclose(got, np_ortho_rh_zo(-16, 16, -16, 16, 0.1, 50.0), rtol=1e-6)
    # Depth: view z = -near -> 0, view z = -far -> 1.
    np.testing.assert_allclose(got @ [0, 0, -0.1, 1], [0, 0, 0, 1], atol=1e-7)
    np.testing.assert_allclose(got @ [0, 0, -50.0, 1], [0, 0, 1, 1], atol=1e-6)


def test_camera_proj_view_projects_known_point():
    cam = Camera(
        eye=jnp.array([0.0, 5.0, 0.0]),
        rotation=jnp.array([0.0, 0.0]),  # forward = +X
        aspect=jnp.float32(16 / 9),
        fov_y=jnp.float32(45.0),
        z_near=jnp.float32(0.1),
        z_far=jnp.float32(1000.0),
    )
    pv = np.asarray(cam.proj_view())
    ref = np_perspective_rh_zo(np.radians(45.0), 16 / 9, 0.1, 1000.0) @ np_look_at_rh(
        [0, 5, 0], [1, 5, 0], [0, 1, 0]
    )
    np.testing.assert_allclose(pv, ref, atol=1e-5)
    # A point straight ahead lands at NDC center with w = distance.
    clip = pv @ np.array([10.0, 5.0, 0.0, 1.0])
    np.testing.assert_allclose(clip[:2], [0, 0], atol=1e-5)
    np.testing.assert_allclose(clip[3], 10.0, rtol=1e-6)


def test_no_translation_matrix_ignores_eye():
    cam_args = dict(
        rotation=jnp.array([10.0, 30.0]),
        aspect=jnp.float32(1.5),
        fov_y=jnp.float32(45.0),
        z_near=jnp.float32(0.1),
        z_far=jnp.float32(1000.0),
    )
    a = Camera(eye=jnp.array([0.0, 0.0, 0.0]), **cam_args).proj_view_no_translation()
    b = Camera(eye=jnp.array([5.0, -3.0, 9.0]), **cam_args).proj_view_no_translation()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sun_proj_view_matches_reference_constants():
    sun = DirectionalLight(
        position=jnp.array([-10.0, 32.0, -2.48]),
        rotation=jnp.array([-70.0, 12.0]),
        color=jnp.array([8.0, 8.0, 8.0]),
    )
    got = np.asarray(sun.proj_view())
    fwd = np.asarray(maths.dir_from_rot(jnp.array([-70.0, 12.0])))
    ref = np_ortho_rh_zo(-16, 16, -16, 16, 0.1, 50.0) @ np_look_at_rh(
        [-10, 32, -2.48], np.array([-10, 32, -2.48]) + fwd, [0, 1, 0]
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_default_scene_matches_reference_defaults():
    s = default_scene_params()
    np.testing.assert_allclose(np.asarray(s.camera.eye), [0, 5, 0])
    np.testing.assert_allclose(float(s.ambient), 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.sun.position), [-10, 32, -2.48], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.sun.color), [8, 8, 8])
    assert int(s.point_lights.count) == 1
    np.testing.assert_allclose(np.asarray(s.point_lights.color[0]), [10, 0, 0])


def test_trs_compose():
    m = np.asarray(
        maths.trs_compose(
            jnp.array([1.0, 2.0, 3.0]),
            jnp.array([1.0, 0.0, 0.0, 0.0]),  # identity quat (w,x,y,z)
            jnp.array([2.0, 2.0, 2.0]),
        )
    )
    expect = np.diag([2.0, 2.0, 2.0, 1.0])
    expect[:3, 3] = [1, 2, 3]
    np.testing.assert_allclose(m, expect, atol=1e-7)
    # 90deg about Z: x-axis -> y-axis.
    q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    m = np.asarray(maths.trs_compose(jnp.zeros(3), jnp.array(q), jnp.ones(3)))
    np.testing.assert_allclose(m[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-6)
