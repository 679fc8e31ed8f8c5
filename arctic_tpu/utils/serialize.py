"""Scene/settings persistence (SURVEY.md §5.4).

The reference keeps all state in RAM and even disables the ImGui ini
(renderer.cpp:216); for reproducible renders we serialize the dynamic scene
parameters + post settings to JSON (geometry/textures reload from the scene
file, which is the actual source of truth)."""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from arctic_tpu.core.scene import (
    Camera,
    DirectionalLight,
    PointLights,
    SceneParams,
    Settings,
)


def params_to_dict(params: SceneParams, settings: Settings) -> dict:
    c = params.camera
    n = int(params.point_lights.count)
    return {
        "camera": {
            "eye": np.asarray(c.eye).tolist(),
            "rotation": np.asarray(c.rotation).tolist(),
            "aspect": float(c.aspect),
            "fov_y": float(c.fov_y),
            "z_near": float(c.z_near),
            "z_far": float(c.z_far),
        },
        "ambient": float(params.ambient),
        "sun": {
            "position": np.asarray(params.sun.position).tolist(),
            "rotation": np.asarray(params.sun.rotation).tolist(),
            "color": np.asarray(params.sun.color).tolist(),
        },
        "point_lights": [
            {
                "position": np.asarray(params.point_lights.position[i]).tolist(),
                "color": np.asarray(params.point_lights.color[i]).tolist(),
                # Raw cone packing (outer_cos, inv_range) + axis; absent for
                # plain point banks (spot_dir is None then).
                **(
                    {
                        "spot_dir": np.asarray(
                            params.point_lights.spot_dir[i]
                        ).tolist(),
                        "spot_cos": np.asarray(
                            params.point_lights.spot_cos[i]
                        ).tolist(),
                    }
                    if params.point_lights.spot_dir is not None
                    else {}
                ),
            }
            for i in range(n)
        ],
        "settings": {
            "tm_method": int(settings.tm_method),
            "gamma": float(settings.gamma),
            "exposure": float(settings.exposure),
        },
    }


def params_from_dict(d: dict) -> tuple[SceneParams, Settings]:
    c = d["camera"]
    camera = Camera(
        eye=jnp.asarray(c["eye"], jnp.float32),
        rotation=jnp.asarray(c["rotation"], jnp.float32),
        aspect=jnp.float32(c["aspect"]),
        fov_y=jnp.float32(c["fov_y"]),
        z_near=jnp.float32(c["z_near"]),
        z_far=jnp.float32(c["z_far"]),
    )
    s = d["sun"]
    sun = DirectionalLight(
        position=jnp.asarray(s["position"], jnp.float32),
        rotation=jnp.asarray(s["rotation"], jnp.float32),
        color=jnp.asarray(s["color"], jnp.float32),
    )
    pls = d.get("point_lights", [])
    lights = PointLights.from_list([(pl["position"], pl["color"]) for pl in pls])
    if any("spot_dir" in pl for pl in pls):
        # Rebuild the raw cone packing verbatim (round-trip exact).
        from arctic_tpu.core.scene import MAX_POINT_LIGHTS

        sdir = np.zeros((MAX_POINT_LIGHTS, 3), np.float32)
        sdir[:, 1] = -1.0
        scos = np.tile(np.asarray([-2.0, 1.0], np.float32), (MAX_POINT_LIGHTS, 1))
        for i, pl in enumerate(pls[:MAX_POINT_LIGHTS]):
            if "spot_dir" in pl:
                sdir[i] = pl["spot_dir"]
                scos[i] = pl["spot_cos"]
        lights = dataclasses.replace(
            lights, spot_dir=jnp.asarray(sdir), spot_cos=jnp.asarray(scos)
        )
    params = SceneParams(
        camera=camera,
        ambient=jnp.float32(d.get("ambient", 0.1)),
        sun=sun,
        point_lights=lights,
    )
    st = d.get("settings", {})
    settings = Settings(
        tm_method=jnp.int32(st.get("tm_method", 0)),
        gamma=jnp.float32(st.get("gamma", 2.2)),
        exposure=jnp.float32(st.get("exposure", 1.0)),
    )
    return params, settings


def save_state(path: str, params: SceneParams, settings: Settings) -> None:
    with open(path, "w") as f:
        json.dump(params_to_dict(params, settings), f, indent=2)


def load_state(path: str) -> tuple[SceneParams, Settings]:
    with open(path) as f:
        return params_from_dict(json.load(f))
