"""Measure PCF penumbra rates on the bench fly-through (round-4 probe).

Questions (VERDICT r3 next-round #1):
  1. What fraction of consumed pixels have fractional (0 < s < 1) PCF?
  2. What fraction of 128-px rows are non-uniform (the compaction's
     upper bound on classifiable rows)?
  3. What fraction does the CONSERVATIVE min/max-pyramid classifier
     actually classify (what shadow.classify_pcf_rows fires on)?

Run on the TPU: python tools/probe_penumbra.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import PointLights, default_scene_params, default_settings
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import sponza_like_scene
from arctic_tpu.models import pipeline
from arctic_tpu.ops import raster, shadow


def main() -> None:
    W, H = 1920, 1080
    config = RenderConfig(
        width=W, height=H, shadow_size=4000,
        pair_cap_cam=196608, pair_cap_shadow=327680, static_point_lights=4,
    )
    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    base = default_scene_params(aspect=W / H)
    base = dataclasses.replace(
        base,
        sun=dataclasses.replace(
            base.sun, position=jnp.asarray([0.0, 24.0, 0.0]),
            rotation=jnp.asarray([-65.0, 30.0]),
        ),
        point_lights=PointLights.from_list(
            [
                ((-6.0, 3.0, -4.0), (30.0, 20.0, 8.0)),
                ((0.0, 3.0, 4.0), (30.0, 20.0, 8.0)),
                ((6.0, 3.0, -4.0), (8.0, 20.0, 30.0)),
                ((12.0, 3.0, 4.0), (30.0, 8.0, 8.0)),
            ]
        ),
    )

    def frame_params(i):
        return dataclasses.replace(
            base,
            camera=dataclasses.replace(
                base.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
            ),
        )

    @jax.jit
    def probe(bufs, params):
        from arctic_tpu.ops import raster_tiles

        geom = bufs.geometry
        sun_pv = params.sun.proj_view()
        cam_pv = params.camera.proj_view()
        wc = pipeline.world_corners(geom)
        sun_clip = pipeline.corners_clip(wc, sun_pv)
        shadow_map, _, _ = pipeline.shadow_pass(geom, sun_pv, config, sun_clip=sun_clip)

        tri_valid = jnp.arange(geom.capacity) < geom.num_tris
        clipped = raster.near_clip_corners(pipeline.corners_clip(wc, cam_pv), tri_valid)
        setup = raster.setup_screen_triangles(clipped, W, H, cull="back")
        shade_rows = pipeline.build_shade_rows(
            setup, geom, sun_pv, wc=wc, lsp=tuple(c[:3] for c in sun_clip)
        )
        shade_rows = jax.lax.optimization_barrier(shade_rows)
        ibuf_tiles, gbuf, _ = raster_tiles.raster_gbuffer(
            setup, shade_rows, H, W, config
        )
        covered = ibuf_tiles >= 0
        x, y, z = gbuf[14], gbuf[15], gbuf[16]

        # Replicate pcf_shadow_proj's window-origin prologue.
        s = shadow_map.shape[0]
        u = x * 0.5 + 0.5
        v = 1.0 - (y * 0.5 + 0.5)
        outside = (z > 1.0) | (u < 0) | (v < 0) | (u > 1) | (v > 1)
        tx = u * s - 0.5
        ty = v * s - 0.5
        start_y = jnp.clip(jnp.floor(ty).astype(jnp.int32) - 1 + 2, 0, s)
        start_x = jnp.clip(jnp.floor(tx).astype(jnp.int32) - 1 + 2, 0, s)
        care = covered & ~outside

        pyr, meta = shadow.build_shadow_pyramid(shadow_map)
        R = care.shape[0] * care.shape[1] // 128
        f2 = lambda a: a.reshape(R, 128)
        variants = {}
        for sub, corners in [(1, 1), (4, 2), (8, 1), (8, 2), (16, 1), (16, 2), (32, 1)]:
            lq, sq = shadow.classify_pcf_rows(
                pyr, meta, f2(start_y), f2(start_x), f2(z), f2(care),
                sub=sub, corners=corners,
            )
            variants[f"s{sub}c{corners}"] = jnp.sum(
                (~jnp.all(lq | sq, axis=1)).astype(jnp.int32)
            )
        lit, shd = shadow.classify_pcf_rows(
            pyr, meta, f2(start_y), f2(start_x), f2(z), f2(care),
            sub=1, corners=1,
        )
        lit, shd = lit[:, 0], shd[:, 0]

        # Exact per-pixel shadow for the upper bounds.
        sh = shadow.pcf_shadow_proj(shadow_map, x, y, z, quant=True)
        frac = care & (sh > 0.0) & (sh < 1.0)
        sh_r = f2(jnp.where(care, sh, -1.0))
        care_r = f2(care)
        any_care = jnp.any(care_r, axis=1)
        all0 = jnp.all((sh_r <= 0.0) | ~care_r, axis=1)
        all1 = jnp.all((sh_r >= 1.0) | ~care_r, axis=1)
        uniform = all0 | all1 | ~any_care

        # Exact per-window bounds: how much of the gap is pyramid coarseness?
        # Each pixel's own 4x4 window min/max (from the runs-path layout) is
        # the tightest usable bound; rows where EVERY care pixel individually
        # classifies (same margin rule) are the classifier's ceiling.
        sp = s + 4
        padded = jnp.pad(shadow_map, 2, mode="wrap")
        qpad = jnp.floor(jnp.clip(padded * 65535.0 + 0.5, 0, 65535))
        # min/max over every 4x4 window origin via two 4-tap separable passes
        wmin_r = jnp.minimum(
            jnp.minimum(qpad[0:sp-3], qpad[1:sp-2]),
            jnp.minimum(qpad[2:sp-1], qpad[3:sp]),
        )  # (sp-3, sp)
        wmax_r = jnp.maximum(
            jnp.maximum(qpad[0:sp-3], qpad[1:sp-2]),
            jnp.maximum(qpad[2:sp-1], qpad[3:sp]),
        )
        wmin = jnp.minimum(
            jnp.minimum(wmin_r[:, 0:sp-3], wmin_r[:, 1:sp-2]),
            jnp.minimum(wmin_r[:, 2:sp-1], wmin_r[:, 3:sp]),
        )  # (sp-3, sp-3): min over window at (y, x)
        wmax = jnp.maximum(
            jnp.maximum(wmax_r[:, 0:sp-3], wmax_r[:, 1:sp-2]),
            jnp.maximum(wmax_r[:, 2:sp-1], wmax_r[:, 3:sp]),
        )
        widx = start_y * (sp - 3) + start_x
        pmin = wmin.reshape(-1)[widx]
        pmax = wmax.reshape(-1)[widx]
        dq = jnp.float32(1.0 / 65535.0)
        px_lit = z < (pmin - 0.5) * dq
        px_shd = z > (pmax + 0.5) * dq
        row_lit_x = jnp.all(f2(px_lit | ~care), axis=1)
        row_shd_x = jnp.all(f2(px_shd | ~care), axis=1)
        pen_exact = ~(row_lit_x | row_shd_x)
        # Per-quarter exact ceiling: every 32-lane group individually all-lit
        # or all-shd (exact per-window bounds) — the sub=4 variant's ceiling.
        fq = lambda a: a.reshape(R * 4, 32)
        q_lit = jnp.all(fq(px_lit | ~care), axis=1)
        q_shd = jnp.all(fq(px_shd | ~care), axis=1)
        pen_exact_q = ~jnp.all((q_lit | q_shd).reshape(R, 4), axis=1)

        # Row bbox spans (penumbra-by-pyramid rows only), for anisotropy.
        big = jnp.int32(1 << 30)
        y0 = jnp.min(jnp.where(f2(care), f2(start_y), big), axis=1)
        y1 = jnp.max(jnp.where(f2(care), f2(start_y), -1), axis=1) + 3
        x0 = jnp.min(jnp.where(f2(care), f2(start_x), big), axis=1)
        x1 = jnp.max(jnp.where(f2(care), f2(start_x), -1), axis=1) + 3
        dy = jnp.where(jnp.any(f2(care), axis=1), y1 - y0, -1)
        dx = jnp.where(jnp.any(f2(care), axis=1), x1 - x0, -1)

        return dict(
            rows=jnp.int32(R),
            pen_rows=jnp.sum((~(lit | shd)).astype(jnp.int32)),
            pen_exact=jnp.sum(pen_exact.astype(jnp.int32)),
            pen_exact_q=jnp.sum(pen_exact_q.astype(jnp.int32)),
            **variants,
            uniform_rows=jnp.sum(uniform.astype(jnp.int32)),
            care_px=jnp.sum(care.astype(jnp.int32)),
            covered_px=jnp.sum(covered.astype(jnp.int32)),
            frac_px=jnp.sum(frac.astype(jnp.int32)),
            lit_rows=jnp.sum(lit.astype(jnp.int32)),
            shd_rows=jnp.sum(shd.astype(jnp.int32)),
            dy=dy, dx=dx,
        )

    for i in [0, 5, 10, 15, 19]:
        out = probe(bufs, frame_params(i))
        dy = np.asarray(out.pop("dy"))
        dx = np.asarray(out.pop("dx"))
        st = {k: int(v) for k, v in out.items()}
        R = st["rows"]
        m = dy >= 0
        q = lambda a: np.percentile(a[m], [50, 90, 99]).astype(int)
        vs = " ".join(
            f"{k}={st[k]/R:.1%}" for k in st if k[0] == "s" and k[1].isdigit()
        )
        print(
            f"frame {i:2d}: rows={R} | pen {vs} | ceilings "
            f"row={st['pen_exact']/R:.1%} quarter={st['pen_exact_q']/R:.1%} "
            f"uniform={(R-st['uniform_rows'])/R:.1%} | px penumbra "
            f"{st['frac_px']/max(st['care_px'],1):.1%} of care | "
            f"bbox dy p50/90/99 {q(dy)} dx {q(dx)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
