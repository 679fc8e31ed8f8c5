"""Rasterizer conformance tests (SURVEY.md §4 test plan).

Covers: single-triangle coverage vs a numpy point-in-triangle oracle, depth
ordering/ties, face culling conventions, near-plane clipping via reprojection
consistency, watertight shared edges, and perspective-correct interpolation.
"""

import numpy as np
import jax.numpy as jnp

from arctic_tpu.core import maths
from arctic_tpu.ops import raster


def make_setup(ndc_tris, width, height, cull="back", w=None):
    """ndc_tris: (T, 3, 3) array of NDC positions; w: optional (T, 3)."""
    ndc_tris = np.asarray(ndc_tris, np.float32)
    T = ndc_tris.shape[0]
    if w is None:
        w = np.ones((T, 3), np.float32)
    clip = np.concatenate([ndc_tris * w[..., None], w[..., None]], axis=-1)
    verts = jnp.asarray(clip.reshape(T * 3, 4))
    indices = jnp.arange(T * 3, dtype=jnp.int32).reshape(T, 3)
    clipped = raster.near_clip_triangles(verts, indices, jnp.ones(T, bool))
    return raster.setup_screen_triangles(clipped, width, height, cull=cull), indices


def np_coverage(tri_screen, width, height):
    """Oracle: pixel centers strictly inside the screen-space triangle."""
    px, py = np.meshgrid(np.arange(width) + 0.5, np.arange(height) + 0.5)
    (x0, y0), (x1, y1), (x2, y2) = tri_screen
    e0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    e1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
    e2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    pos = (e0 > 0) & (e1 > 0) & (e2 > 0)
    neg = (e0 < 0) & (e1 < 0) & (e2 < 0)
    return pos | neg


def to_screen(ndc_xy, width, height):
    x = (ndc_xy[..., 0] + 1) * width / 2
    y = (1 - ndc_xy[..., 1]) * height / 2
    return np.stack([x, y], axis=-1)


def test_single_triangle_coverage_matches_oracle():
    W = H = 32
    # Vertices chosen so no edge passes exactly through a pixel center.
    tri = np.array([[[-0.62, -0.55, 0.5], [0.71, -0.48, 0.5], [0.03, 0.77, 0.5]]])
    setup, _ = make_setup(tri, W, H, cull="none")
    zbuf, ibuf = raster.rasterize_bruteforce(setup, H, W)
    got = np.asarray(ibuf) >= 0
    want = np_coverage(to_screen(tri[0, :, :2], W, H), W, H)
    np.testing.assert_array_equal(got, want)
    assert np.allclose(np.asarray(zbuf)[got], 0.5, atol=1e-5)


def test_depth_order_and_tie_break():
    W = H = 16
    fullscreen = [[-4.0, -4.0], [4.0, -4.0], [0.0, 4.0]]
    near = np.array([[[x, y, 0.25] for x, y in fullscreen]])
    far = np.array([[[x, y, 0.75] for x, y in fullscreen]])
    # Far drawn first, near second: near must win everywhere.
    setup, _ = make_setup(np.concatenate([far, near]), W, H, cull="none")
    _, ibuf = raster.rasterize_bruteforce(setup, H, W)
    tri = np.asarray(setup.orig_tri)[np.asarray(ibuf)]
    assert np.all(tri == 1)  # second (near) triangle wins
    # Equal depth: first-drawn wins (depth func LESS, forward_pass default).
    setup, _ = make_setup(np.concatenate([far, far]), W, H, cull="none")
    _, ibuf = raster.rasterize_bruteforce(setup, H, W)
    tri = np.asarray(setup.orig_tri)[np.asarray(ibuf)]
    assert np.all(tri == 0)


def test_culling_conventions():
    W = H = 16
    # This triangle is front-facing for the camera pass (visually CCW):
    # v0 bottom-left, v1 bottom-right, v2 top — glTF-style CCW in y-up NDC.
    tri = np.array([[[-0.8, -0.8, 0.5], [0.8, -0.8, 0.5], [0.0, 0.8, 0.5]]])
    rev = tri[:, ::-1]
    for t, cull, visible in [
        (tri, "back", True),
        (rev, "back", False),
        (tri, "front", False),
        (rev, "front", True),
        (tri, "none", True),
    ]:
        setup, _ = make_setup(t, W, H, cull=cull)
        _, ibuf = raster.rasterize_bruteforce(setup, H, W)
        assert (np.asarray(ibuf) >= 0).any() == visible, (cull, visible)


def test_watertight_shared_edge():
    W = H = 64
    # A quad split along an awkward diagonal; every covered pixel must be
    # covered by exactly one of the two triangles (no cracks, no overlap).
    q = np.array(
        [[-0.83, -0.71, 0.5], [0.77, -0.64, 0.5], [0.69, 0.81, 0.5], [-0.74, 0.66, 0.5]]
    )
    t0 = np.array([[q[0], q[1], q[2]]])
    t1 = np.array([[q[0], q[2], q[3]]])
    both, _ = make_setup(np.concatenate([t0, t1]), W, H, cull="none")
    _, ibuf_both = raster.rasterize_bruteforce(both, H, W)
    s0, _ = make_setup(t0, W, H, cull="none")
    _, ibuf0 = raster.rasterize_bruteforce(s0, H, W)
    s1, _ = make_setup(t1, W, H, cull="none")
    _, ibuf1 = raster.rasterize_bruteforce(s1, H, W)
    c_both = np.asarray(ibuf_both) >= 0
    c0 = np.asarray(ibuf0) >= 0
    c1 = np.asarray(ibuf1) >= 0
    # No overlap along the shared edge and no holes: union == joint coverage.
    assert not (c0 & c1).any(), "shared-edge pixels hit twice"
    np.testing.assert_array_equal(c_both, c0 | c1)
    # Interior sanity: the quad center region is covered.
    assert c_both[24:40, 24:40].all()


def _perspective_scene(W, H, quad_world):
    """Project a world quad with the reference camera stack; return setup+data."""
    pv = np.asarray(
        maths.camera_proj_view(
            jnp.array([0.0, 0.0, 0.0]),
            jnp.array([0.0, -90.0]),  # forward = -Z (scene.cpp dir_from_rot)
            jnp.float32(W / H),
            45.0,
            0.1,
            100.0,
        )
    )
    world = np.concatenate([quad_world, np.ones((len(quad_world), 1))], axis=1)
    clip = (pv @ world.T).T.astype(np.float32)
    indices = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    clipped = raster.near_clip_triangles(jnp.asarray(clip), indices, jnp.ones(2, bool))
    setup = raster.setup_screen_triangles(clipped, W, H, cull="none")
    return setup, indices, pv


def test_near_clip_reprojection_consistency():
    W = H = 48
    # Ground quad from 0.02 in front of the camera to far — crosses the near
    # plane (0.1), so it must be clipped. Interpolated world positions at
    # covered pixels must reproject onto those pixels.
    quad = np.array(
        [[-5.0, -1.0, -0.02], [5.0, -1.0, -0.02], [5.0, -1.0, -50.0], [-5.0, -1.0, -50.0]],
        np.float32,
    )
    setup, indices, pv = _perspective_scene(W, H, quad)
    zbuf, ibuf = raster.rasterize_bruteforce(setup, H, W)
    covered = np.asarray(ibuf) >= 0
    assert covered.sum() > 100, "clipped quad should still cover many pixels"
    assert np.isfinite(np.asarray(zbuf)).all()

    bary, _ = raster.pixel_barycentrics(setup, ibuf, H, W)
    attrs = jnp.asarray(quad)  # world positions as the attribute
    wp = np.asarray(raster.interpolate(setup, ibuf, indices, attrs, bary))
    ph = (pv @ np.concatenate([wp, np.ones((H, W, 1))], axis=-1).reshape(-1, 4).T).T
    ph = ph.reshape(H, W, 4)
    sx = (ph[..., 0] / ph[..., 3] + 1) * W / 2
    sy = (1 - ph[..., 1] / ph[..., 3]) * H / 2
    px, py = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    # 1/16 snap + f32 edge math: allow a third of a pixel.
    assert np.abs(sx - px)[covered].max() < 0.34
    assert np.abs(sy - py)[covered].max() < 0.34


def test_perspective_correct_interpolation():
    W = H = 64
    # Wall quad at an oblique angle; uv must interpolate perspective-correct.
    quad = np.array(
        [[-1.0, -1.0, -2.0], [1.0, -1.0, -8.0], [1.0, 1.0, -8.0], [-1.0, 1.0, -2.0]],
        np.float32,
    )
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    setup, indices, pv = _perspective_scene(W, H, quad)
    zbuf, ibuf = raster.rasterize_bruteforce(setup, H, W)
    covered = np.asarray(ibuf) >= 0
    assert covered.sum() > 200
    bary, _ = raster.pixel_barycentrics(setup, ibuf, H, W)
    got_uv = np.asarray(raster.interpolate(setup, ibuf, indices, jnp.asarray(uv), bary))
    got_wp = np.asarray(
        raster.interpolate(setup, ibuf, indices, jnp.asarray(quad), bary)
    )
    # Analytic uv from interpolated world position (quad is a bilinear patch
    # in x/z): u from depth, v from y.
    u_true = (-got_wp[..., 2] - 2.0) / 6.0
    v_true = (got_wp[..., 1] + 1.0) / 2.0
    assert np.abs(got_uv[..., 0] - u_true)[covered].max() < 2e-3
    assert np.abs(got_uv[..., 1] - v_true)[covered].max() < 2e-3
    # Screen-center pixel: compare against an exact ray/plane intersection.
    # Plane through the quad: param by x: z = -2 + (x+1) * -3.
    i, j = H // 2, W // 2
    if covered[i, j]:
        x, y, z = got_wp[i, j]
        assert abs(z - (-2.0 + (x + 1.0) * -3.0)) < 1e-2


def test_fully_behind_camera_is_culled():
    W = H = 16
    quad = np.array(
        [[-1.0, -1.0, 5.0], [1.0, -1.0, 5.0], [1.0, 1.0, 5.0], [-1.0, 1.0, 5.0]],
        np.float32,
    )
    setup, _, _ = _perspective_scene(W, H, quad)
    _, ibuf = raster.rasterize_bruteforce(setup, H, W)
    assert (np.asarray(ibuf) == -1).all()
