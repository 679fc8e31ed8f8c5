"""Unit tests for sampling / PBR / tonemap / shadow / sky ops vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from arctic_tpu.ops import pbr, sampling, shadow, sky, tonemap


def test_tonemap_curves():
    c = jnp.asarray(np.random.default_rng(1).uniform(0, 8, (64, 3)).astype(np.float32))
    cn = np.asarray(c)
    np.testing.assert_allclose(
        np.asarray(tonemap.tm_reinhard(c)), cn / (cn + 1), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(tonemap.tm_exposure(c, jnp.float32(1.7))),
        1 - np.exp(-cn * 1.7),
        rtol=1e-5,
    )
    # ACES: spot values via the published fit, constants verbatim.
    inp = np.array([[0.59719, 0.35458, 0.04823], [0.076, 0.90834, 0.01566], [0.0284, 0.13383, 0.837]])
    out = np.array([[1.60475, -0.53108, -0.07367], [-0.10208, 1.10813, -0.00605], [-0.00327, -0.07276, 1.07]])
    x = inp @ cn.T
    a = x * (x + 0.0245786) - 0.000090537
    b = x * (0.983729 * x + 0.4329510) + 0.238081
    want = np.clip((out @ (a / b)).T, 0, 1)
    np.testing.assert_allclose(np.asarray(tonemap.tm_aces(c)), want, atol=1e-5)
    # Gamma with abs (post_process.hlsl:36).
    g = tonemap.correct_gamma(jnp.asarray([-0.5, 0.25]), jnp.float32(2.2))
    np.testing.assert_allclose(np.asarray(g), np.abs([-0.5, 0.25]) ** (1 / 2.2), rtol=1e-5)
    # Dispatcher follows tm_method.
    full = tonemap.tonemap(c, jnp.int32(1), jnp.float32(2.2), jnp.float32(1.7))
    np.testing.assert_allclose(
        np.asarray(full), (1 - np.exp(-cn * 1.7)) ** (1 / 2.2), atol=1e-5
    )


def np_radiance(n, wo, wi, ingoing, base, metal, rough):
    PI = 3.14159265
    h = wo + wi
    h = h / np.linalg.norm(h)
    f0 = 0.04 + (base - 0.04) * metal
    F = f0 + (1 - f0) * np.clip(1 - max(h @ wo, 0.0), 0, 1) ** 5
    a2 = rough**4
    ndh = max(n @ h, 0.0)
    ndf = a2 / (PI * (ndh * ndh * (a2 - 1) + 1) ** 2)
    k = (rough + 1) ** 2 / 8
    ndwo, ndwi = max(n @ wo, 0.0), max(n @ wi, 0.0)
    G = (ndwo / (ndwo * (1 - k) + k)) * (ndwi / (ndwi * (1 - k) + k))
    spec = ndf * G * F / (4 * ndwo * ndwi + 1e-4)
    kd = (1 - F) * (1 - metal)
    return (kd * base / PI + spec) * ingoing * ndwi


def test_pbr_matches_reference_formulas(rng):
    for _ in range(10):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        wo = rng.normal(size=3)
        wo /= np.linalg.norm(wo)
        wi = rng.normal(size=3)
        wi /= np.linalg.norm(wi)
        base = rng.uniform(0, 1, 3)
        metal = rng.uniform(0, 1)
        rough = rng.uniform(0.05, 1)
        ingoing = rng.uniform(0, 10, 3)
        got = np.asarray(
            pbr.outgoing_radiance(
                jnp.asarray(n, jnp.float32),
                jnp.asarray(wo, jnp.float32),
                jnp.asarray(wi, jnp.float32),
                jnp.asarray(ingoing, jnp.float32),
                jnp.asarray(base, jnp.float32),
                jnp.float32(metal),
                jnp.float32(rough),
            )
        )
        want = np_radiance(n, wo, wi, ingoing, base, metal, rough)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_bilinear_sample_basics():
    tex = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    # Texel centers: uv = (x+0.5)/4 -> exact texel value.
    for y in range(4):
        for x in range(4):
            uv = jnp.asarray([(x + 0.5) / 4, (y + 0.5) / 4])
            v = float(sampling.sample_bilinear_wrap(tex, uv)[0])
            assert v == y * 4 + x
    # Midpoint between texels (0,0) and (1,0): average.
    v = float(sampling.sample_bilinear_wrap(tex, jnp.asarray([0.5, 0.125]))[0])
    assert abs(v - 1.5) < 1e-6
    # Wrap: uv of -0.125 == uv of 0.875 (texel 3).
    a = sampling.sample_bilinear_wrap(tex, jnp.asarray([-0.125, 0.125]))
    b = sampling.sample_bilinear_wrap(tex, jnp.asarray([0.875, 0.125]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_atlas_region_sampling_matches_whole_texture(rng):
    from arctic_tpu.core.scene import TextureAtlas
    from arctic_tpu.io.build import pack_atlas, pack_atlas_quads

    tex = rng.uniform(0, 1, (8, 16, 4)).astype(np.float32)
    other = rng.uniform(0, 1, (4, 4, 4)).astype(np.float32)
    data, locs = pack_atlas([other, tex])
    atlas = TextureAtlas(
        data=jnp.asarray(data),
        quads=jnp.asarray(pack_atlas_quads(data)),
        regions=jnp.asarray(locs.reshape(1, 2, 4)[:, :3]),
    )
    region = jnp.asarray(locs[1], jnp.int32)
    assert tuple(locs[1][2:]) == (8, 16)
    uvs = rng.uniform(-1.5, 2.5, (50, 2)).astype(np.float32)  # exercises wrap
    got = sampling.sample_atlas(atlas, region, jnp.asarray(uvs))
    want = sampling.sample_bilinear_wrap(jnp.asarray(tex), jnp.asarray(uvs))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def pcf_literal(shadow_map, lsp):
    """Direct translation of calculate_shadow (forward.hlsl:68-96) using the
    independently-tested bilinear sampler — oracle for the windowed version."""
    s = shadow_map.shape[0]
    w = lsp[..., 3]
    proj = lsp[..., :3] / w[..., None]
    u = proj[..., 0] * 0.5 + 0.5
    v = 1.0 - (proj[..., 1] * 0.5 + 0.5)
    z = proj[..., 2]
    outside = (z > 1.0) | (u < 0) | (v < 0) | (u > 1) | (v > 1)
    acc = jnp.zeros_like(z)
    tex = shadow_map[..., None]
    for i in range(-2, 3):
        for j in range(-2, 3):
            uv = jnp.stack([u + i * 1e-4, v + j * 1e-4], axis=-1)
            closest = sampling.sample_bilinear_wrap(tex, uv)[..., 0]
            acc = acc + jnp.where(z > closest, 1.0, 0.0)
    return jnp.where(outside, 0.0, acc / 25.0)


def test_pcf_window_matches_literal(rng):
    s = 64
    smap = jnp.asarray(rng.uniform(0.2, 0.8, (s, s)).astype(np.float32))
    # Random light-space positions incl. outside-frustum and border cases.
    xy = rng.uniform(-1.3, 1.3, (200, 2)).astype(np.float32)
    z = rng.uniform(-0.1, 1.2, (200, 1)).astype(np.float32)
    lsp = jnp.asarray(np.concatenate([xy, z, np.ones((200, 1), np.float32)], axis=1))
    got = np.asarray(shadow.pcf_shadow(smap, lsp))
    want = np.asarray(pcf_literal(smap, lsp))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sky_directions_and_sampling():
    env = np.zeros((64, 128, 3), np.float32)
    env[:32] = [1, 0, 0]  # note: v in [0, 0.5) ...
    env[32:] = [0, 1, 0]
    # y=0.7: v = -(asin(0.7)*0.3183+0.5) wraps to ~0.253 -> upper (red) half.
    d = np.array([np.sqrt(1 - 0.49), 0.7, 0.0])
    c = np.asarray(sky.sample_environment(jnp.asarray(env), jnp.asarray(d, jnp.float32)))
    assert c[0] > 0.9 and c[1] < 0.1
    d = np.array([np.sqrt(1 - 0.49), -0.7, 0.0])
    c = np.asarray(sky.sample_environment(jnp.asarray(env), jnp.asarray(d, jnp.float32)))
    assert c[1] > 0.9 and c[0] < 0.1

    from arctic_tpu.core.scene import Camera

    cam = Camera(
        eye=jnp.zeros(3),
        rotation=jnp.asarray([0.0, 35.0]),
        aspect=jnp.float32(1.5),
        fov_y=jnp.float32(60.0),
        z_near=jnp.float32(0.1),
        z_far=jnp.float32(100.0),
    )
    dirs = np.asarray(sky.camera_ray_directions(cam, 33, 49))
    center = dirs[16, 24]
    center = center / np.linalg.norm(center)
    fwd = np.array([np.cos(np.radians(35.0)), 0, np.sin(np.radians(35.0))])
    assert np.dot(center, fwd) > 0.999
    # Vertical fov: angle between top and bottom center-column rays ~ fov_y.
    top = dirs[0, 24] / np.linalg.norm(dirs[0, 24])
    bot = dirs[32, 24] / np.linalg.norm(dirs[32, 24])
    ang = np.degrees(np.arccos(np.clip(np.dot(top, bot), -1, 1)))
    assert abs(ang - 60.0) < 2.5  # pixel centers inset by half a pixel
