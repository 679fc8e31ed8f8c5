"""Attribute compiled-HLO op names (as seen in profiler traces) to jax
source lines: compiles the EXACT bench program and prints, for each
requested op name (argv, e.g. fusion.11 copy.1062), its instruction line
metadata plus the metadata of the ops inside its fused computation.

Run on TPU: python tools/dump_hlo.py fusion.11 fusion.4 fusion.5 ...
"""

import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import PointLights, default_scene_params, default_settings
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline

    wanted = [a for a in sys.argv[1:] if not a.startswith("-")]

    W, H = 1920, 1080
    config = RenderConfig(width=W, height=H, shadow_size=4000)
    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    base = default_scene_params(aspect=W / H)

    def frame_params(i):  # IDENTICAL to profile_hlo.py so op names line up
        return dataclasses.replace(
            base,
            camera=dataclasses.replace(
                base.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
            ),
            point_lights=PointLights.from_list(
                [((-6.0, 3.0, -4.0), (30.0, 20.0, 8.0)),
                 ((0.0, 3.0, 4.0), (30.0, 20.0, 8.0)),
                 ((6.0, 3.0, -4.0), (8.0, 20.0, 30.0)),
                 ((12.0, 3.0, 4.0), (30.0, 8.0, 8.0))]
            ),
        )

    params = frame_params(10)
    settings = dataclasses.replace(default_settings(), tm_method=jnp.int32(2))
    config = pipeline.autotune_pair_caps(
        bufs, [frame_params(0), frame_params(10), frame_params(19)], config,
        margin=1.4,
    )
    config = dataclasses.replace(config, static_point_lights=4)

    render_fn = pipeline.make_renderer_stats(config)
    lowered = jax.jit(lambda b, p, s: render_fn(b, p, s)).lower(
        bufs, params, settings
    )
    txt = lowered.compile().as_text()
    print(f"HLO text: {len(txt) / 1e6:.1f} MB", flush=True)
    for i, a in enumerate(sys.argv):
        if a == "--save" and i + 1 < len(sys.argv):
            with open(sys.argv[i + 1], "w") as f:
                f.write(txt)
            print(f"saved HLO to {sys.argv[i + 1]}", flush=True)

    # Instruction lines look like:  %fusion.11 = f32[...]{...} fusion(...),
    # kind=kLoop, calls=%fused_computation.N, metadata={op_name="..." ...}
    lines = txt.splitlines()
    calls_of = {}
    meta_of = {}
    for ln in lines:
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = .*", ln)
        if not m:
            continue
        name = m.group(1)
        if name in (w.replace("%", "") for w in wanted):
            meta_of[name] = ln.strip()
            c = re.search(r"calls=%?([\w.\-]+)", ln)
            if c:
                calls_of[name] = c.group(1)

    for w in wanted:
        w = w.replace("%", "")
        print("=" * 100)
        print(f"### {w}")
        ln = meta_of.get(w)
        if ln is None:
            print("  (not found)")
            continue
        print("  " + ln[:1200])
        comp = calls_of.get(w)
        if comp:
            # print the fused computation body's metadata op_names
            inside = False
            printed = set()
            for l in lines:
                if re.match(rf"%?{re.escape(comp)}\b", l.strip()) and "{" in l:
                    inside = True
                    continue
                if inside:
                    if l.startswith("}"):
                        break
                    om = re.search(r'op_name="([^"]+)"', l)
                    sf = re.search(r'source_file="([^"]+)"', l)
                    sl = re.search(r'source_line=(\d+)', l)
                    shape = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\S+)", l)
                    key = (om and om.group(1), sf and sf.group(1), sl and sl.group(1))
                    if om and key not in printed:
                        printed.add(key)
                        print(
                            f"    {shape.group(1) if shape else '?':40s} "
                            f"{key[0][:90]}  {key[1]}:{key[2]}"
                        )


if __name__ == "__main__":
    main()
