"""Light-space footprint of camera-visible geometry over the bench path.

If the visible footprint fits a crop of the 4000^2 shadow map whose window
LUT is <= ~96 MB (the gather table-size cliff), a per-frame cropped LUT
drops the 23 ms PCF gather to ~5.3 ns/row. Conservative estimate: sun-clip
bbox of every triangle whose camera-clip bbox intersects the frustum
(includes occluded geometry -> overestimates)."""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from arctic_tpu.core.scene import default_scene_params
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline

    S = 4000
    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    base = default_scene_params(aspect=1920 / 1080)

    @jax.jit
    def footprint(bufs, params):
        geom = bufs.geometry
        wc = pipeline.world_corners(geom)
        cam = pipeline.corners_clip(wc, params.camera.proj_view())
        sun = pipeline.corners_clip(wc, params.sun.proj_view())
        valid = jnp.arange(geom.capacity) < geom.num_tris

        # Conservative frustum test: any corner inside, or bbox straddles.
        inside = None
        for c in range(3):
            x, y, z, w = cam[c]
            ok = (jnp.abs(x) <= w) & (jnp.abs(y) <= w) & (z >= 0) & (z <= w) & (w > 0)
            inside = ok if inside is None else (inside | ok)
        vis = valid & inside

        big = jnp.float32(1e30)
        mins = []
        maxs = []
        for axis in range(2):  # sun-clip x (-> u) and y (-> v)
            lo = jnp.minimum(jnp.minimum(sun[0][axis], sun[1][axis]), sun[2][axis])
            hi = jnp.maximum(jnp.maximum(sun[0][axis], sun[1][axis]), sun[2][axis])
            mins.append(jnp.min(jnp.where(vis, lo, big)))
            maxs.append(jnp.max(jnp.where(vis, hi, -big)))
        return jnp.stack(mins), jnp.stack(maxs)

    ext_lo = np.array([1e30, 1e30])
    ext_hi = np.array([-1e30, -1e30])
    for i in range(20):
        p = dataclasses.replace(
            base,
            camera=dataclasses.replace(
                base.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
            ),
        )
        lo, hi = footprint(bufs, p)
        ext_lo = np.minimum(ext_lo, np.asarray(lo))
        ext_hi = np.maximum(ext_hi, np.asarray(hi))

    # NDC -> texels (u = x*.5+.5 -> * S; v = 1-(y*.5+.5) -> * S)
    u0, u1 = (ext_lo[0] * 0.5 + 0.5) * S, (ext_hi[0] * 0.5 + 0.5) * S
    v0, v1 = (1 - (ext_hi[1] * 0.5 + 0.5)) * S, (1 - (ext_lo[1] * 0.5 + 0.5)) * S
    du, dv = u1 - u0, v1 - v0
    print(f"fly-through footprint: u [{u0:.0f}, {u1:.0f}] ({du:.0f} texels), "
          f"v [{v0:.0f}, {v1:.0f}] ({dv:.0f} texels)")
    # PCF taps extend +-1 texel + window 4: add margin 8
    crop_w = min(du + 16, S + 1)
    crop_h = min(dv + 16, S + 1)
    mb = (crop_h / 4 + 1) * (crop_w / 8 + 1) * 2 * 512 / 1e6
    print(f"cropped two-8x8-block LUT: {mb:.0f} MB (cliff ~96-126 MB; "
          f"full-map LUT is 257 MB)")


if __name__ == "__main__":
    main()
