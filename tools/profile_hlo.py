"""Whole-frame per-HLO accounting of the bench pipeline on TPU.

VERDICT r2 weak #2: the published profile itemized only ~60 ms of the
118 ms frame. This tool produces the ground-truth table: it runs the FULL
jitted render_frame_stats (the exact bench program) under jax.profiler,
parses the trace.json.gz for every device-track HLO op, and aggregates
durations per op and per bucket so the rows sum to the measured frame time.

Run on the TPU box:  python tools/profile_hlo.py [WxH] [shadow] [--csv out]
"""

import dataclasses
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    # Slice FIRST: .ravel() of the full image compiles a 6 MB copy per
    # sync (showed up as a 0.36 ms/frame reshape in the ops table).
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 1),)])


# Bucket rules: first regex that matches the op's metadata source / name wins.
# The scope path (jax.named_scope) + the jax source line let us attribute
# fusions to pipeline stages.
BUCKETS = [
    ("lut_build", r"shadow|pcf"),  # refined below by scope
]


def classify(name: str, args: dict) -> str:
    """Map a device HLO event to a stage bucket using its metadata."""
    scope = args.get("name", "") if args else ""
    # XLA op metadata: "long_name" or "tf_op" carry the named_scope path.
    meta = " ".join(
        str(args.get(k, ""))
        for k in ("long_name", "tf_op", "source", "hlo_op", "group_by")
    ) if args else ""
    s = name + " " + meta + " " + scope
    sl = s.lower()
    if "named_scope" in sl:
        pass
    for pat, bucket in [
        (r"shadow_pass", "shadow_pass"),
        (r"forward_visibility", "forward_visibility"),
        (r"forward_shade_skybox", "forward_shade"),
        (r"post_process", "post_process"),
    ]:
        if re.search(pat, sl):
            return bucket
    return "other"


def main():
    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import PointLights, default_scene_params, default_settings
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    res = args[0] if args else "1920x1080"
    W, H = map(int, res.split("x"))
    shadow_size = int(args[1]) if len(args) > 1 else 4000
    config = RenderConfig(width=W, height=H, shadow_size=shadow_size)
    textured = "--textures" in sys.argv
    print(
        f"backend={jax.default_backend()} {W}x{H} shadow={shadow_size}"
        f" textured={textured}",
        flush=True,
    )

    scene_kw = dict(texture_size=1024, n_materials=24) if textured else {}
    meshes, objects, materials, env = sponza_like_scene(**scene_kw)
    bufs = build_buffers(meshes, objects, materials, env)
    base = default_scene_params(aspect=W / H)

    def frame_params(i):
        return dataclasses.replace(
            base,
            camera=dataclasses.replace(
                base.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
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
    settings = dataclasses.replace(default_settings(), tm_method=jnp.int32(2))

    config = pipeline.autotune_pair_caps(
        bufs, [frame_params(0), frame_params(10), frame_params(19)], config,
        margin=1.4,
    )
    config = dataclasses.replace(config, static_point_lights=4)
    print(f"pair caps: cam={config.pair_cap_cam} shadow={config.pair_cap_shadow}", flush=True)
    if (
        textured and "--grouped" in sys.argv
        and bufs.atlas.tile_groups and len(bufs.atlas.tile_groups) > 1
    ):
        # Match the bench's grouped-tile route: planned groups + tuned caps.
        fps_plan = [frame_params(0), frame_params(10), frame_params(19)]
        plan = pipeline.plan_tex_groups(bufs, fps_plan, config)
        if plan:
            print(f"tex groups (annealed): {plan}", flush=True)
            bufs = build_buffers(meshes, objects, materials, env, tex_groups=plan)
        config = pipeline.autotune_tex_group_caps(bufs, fps_plan, config)
        print(f"tex group caps: {config.tex_group_caps}", flush=True)

    render = pipeline.make_renderer_stats(config)
    out = render(bufs, frame_params(0), settings)
    _sync(out)
    print("compiled", flush=True)

    # Wall-clock reference timing (chained distinct inputs, hard sync).
    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        out = render(bufs, frame_params(i + 1), settings)
    _sync(out)
    wall = (time.perf_counter() - t0) / n
    print(f"frame wall: {wall*1e3:.2f} ms ({1/wall:.2f} fps)", flush=True)

    logdir = "/tmp/arctic_hlo_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for i in range(3):
        out = render(bufs, frame_params(10 + i), settings)
    _sync(out)
    jax.profiler.stop_trace()

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace files under {logdir}"
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # Device-track pids: metadata events name processes; TPU device ops live
    # on tracks whose process name contains "TPU" and thread name "XLA Ops"
    # (naming varies by version — match loosely and report what we used).
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    dev_pids = {p for p, nm in pid_name.items() if "TPU" in nm or "tpu" in nm}
    print("processes:", sorted(set(pid_name.values())), flush=True)

    per_op = defaultdict(float)
    per_op_n = defaultdict(int)
    op_args = {}
    tracks = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in dev_pids:
            continue
        tname = tid_name.get((e["pid"], e["tid"]), "")
        tracks[(pid_name[e["pid"]], tname)] += e.get("dur", 0)
        if "XLA Ops" not in tname and "xla op" not in tname.lower():
            continue
        name = e["name"]
        per_op[name] += e.get("dur", 0)
        per_op_n[name] += 1
        if name not in op_args:
            op_args[name] = e.get("args", {})

    print("\ntracks (total us over 3 frames):", flush=True)
    for (p, t), d in sorted(tracks.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {p} / {t}: {d/3/1000:.2f} ms/frame")

    frames = 3.0
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    total = sum(per_op.values()) / frames / 1000.0
    print(f"\nper-op total: {total:.2f} ms/frame (wall {wall*1e3:.2f})", flush=True)

    buckets = defaultdict(float)
    print(f"\n{'ms/frame':>9} {'count':>6}  op (top 45)")
    for name, dur in rows[:45]:
        ms = dur / frames / 1000.0
        a = op_args.get(name, {})
        b = classify(name, a)
        extra = ""
        if a:
            keys = [k for k in a if k not in ("name",)]
            extra = " | " + " ".join(f"{k}={str(a[k])[:60]}" for k in list(keys)[:3])
        print(f"{ms:9.3f} {per_op_n[name]//3:6d}  {name[:80]}{extra}")
    for name, dur in rows:
        buckets[classify(name, op_args.get(name, {}))] += dur / frames / 1000.0

    print("\nbuckets (ms/frame):")
    for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:0<2}: {ms:.2f}")

    if "--csv" in sys.argv:
        out_path = sys.argv[sys.argv.index("--csv") + 1]
        with open(out_path, "w") as f:
            f.write("op,ms_per_frame,count,args\n")
            for name, dur in rows:
                a = json.dumps(op_args.get(name, {})).replace('"', "'")
                f.write(f'"{name}",{dur/frames/1000.0:.4f},{per_op_n[name]//3},"{a}"\n')
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
