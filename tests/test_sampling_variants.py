"""Equivalence tests between sampling variants used in different paths."""

import numpy as np
import jax.numpy as jnp

from arctic_tpu.core.scene import TextureAtlas
from arctic_tpu.io.build import pack_atlas, pack_atlas_quads
from arctic_tpu.ops import sampling, sky


def _atlas(rng, shapes):
    imgs = [rng.uniform(0, 1, s).astype(np.float32) for s in shapes]
    data, locs = pack_atlas(imgs)
    return (
        TextureAtlas(
            data=jnp.asarray(data),
            quads=jnp.asarray(pack_atlas_quads(data)),
            regions=jnp.asarray(locs.reshape(1, len(shapes), 4)),
        ),
        imgs,
        locs,
    )


def test_multi_matches_single(rng):
    atlas, imgs, locs = _atlas(rng, [(8, 16, 4), (4, 4, 4), (32, 8, 4)])
    uv = rng.uniform(-1.0, 2.0, (40, 2)).astype(np.float32)
    regions = jnp.broadcast_to(jnp.asarray(locs), (40, 3, 4))
    multi = np.asarray(sampling.sample_atlas_multi(atlas, regions, jnp.asarray(uv)))
    for i in range(3):
        single = np.asarray(
            sampling.sample_atlas(atlas, jnp.asarray(locs[i]), jnp.asarray(uv))
        )
        np.testing.assert_array_equal(multi[:, i], single)


def test_env_atlas_matches_raw_sampling(rng):
    env = rng.uniform(0, 30, (16, 32, 3)).astype(np.float32)
    rgba = np.concatenate([env, np.ones((16, 32, 1), np.float32)], -1)
    data, locs = pack_atlas([rgba])
    env_atlas = TextureAtlas(
        data=jnp.asarray(data),
        quads=jnp.asarray(pack_atlas_quads(data)),
        regions=jnp.asarray(locs.reshape(1, 1, 4)),
    )

    class EnvLike:
        atlas = env_atlas
        data = jnp.asarray(env)

    dirs = rng.normal(size=(100, 3)).astype(np.float32)
    via_atlas = np.asarray(sky.sample_environment(EnvLike(), jnp.asarray(dirs)))
    via_raw = np.asarray(sky.sample_environment(jnp.asarray(env), jnp.asarray(dirs)))
    np.testing.assert_allclose(via_atlas, via_raw, rtol=1e-6, atol=1e-6)
