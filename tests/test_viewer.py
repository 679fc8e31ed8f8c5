"""Viewer: serve a frame over HTTP and drive the camera via query params."""

import http.client
import threading
import time

import numpy as np
import jax.numpy as jnp

from arctic_tpu.app import viewer
from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import default_scene_params, default_settings
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import cornell_like_scene
from arctic_tpu.models import pipeline


def test_viewer_serves_frames_and_moves_camera():
    W, H = 64, 48
    config = RenderConfig(width=W, height=H, shadow_size=64, force_bruteforce=True)
    meshes, objects, materials, env = cornell_like_scene()
    buffers = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    state = viewer.ViewerState(
        buffers,
        default_scene_params(aspect=W / H),
        default_settings(),
        config,
        pipeline.make_renderer_stats(config),
    )
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), viewer.make_handler(state))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/")
        page = conn.getresponse()
        assert page.status == 200 and b"arctic_tpu viewer" in page.read()

        eye0 = np.asarray(state.params.camera.eye).copy()
        conn.request("GET", "/frame?f=1&dx=20&dy=0&ambient=0.2&gamma=2.2&exposure=1&tm=2")
        frame = conn.getresponse()
        assert frame.status == 200
        png = frame.read()
        assert png[:4] == b"\x89PNG"
        # Camera moved forward and yawed; settings applied.
        assert not np.allclose(np.asarray(state.params.camera.eye), eye0)
        assert float(state.params.camera.rotation[1]) != 0.0
        assert int(state.settings.tm_method) == 2

        conn.request("GET", "/state")
        st = conn.getresponse()
        assert st.status == 200 and b"camera" in st.read()
    finally:
        server.shutdown()


def test_viewer_lights_sun_and_stats():
    """Lights window parity: add/edit point lights + sun + camera-speed via
    query params (app.cpp:454-523); X-Stats carries frame time + camera."""
    import json
    from urllib.parse import quote

    W, H = 64, 48
    config = RenderConfig(width=W, height=H, shadow_size=64, force_bruteforce=True)
    meshes, objects, materials, env = cornell_like_scene()
    buffers = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    state = viewer.ViewerState(
        buffers,
        default_scene_params(aspect=W / H),
        default_settings(),
        config,
        pipeline.make_renderer_stats(config),
    )
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), viewer.make_handler(state))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=240)
        lights = [
            {"pos": [0, 1, 0], "color": [10, 0, 0]},
            {"pos": [2, 3, -1], "color": [0, 5, 20]},
        ]
        q = (
            "lights=" + quote(json.dumps(lights))
            + "&sun_pos=1,20,3&sun_rot=-50,30&sun_color=4,5,6"
            + "&cam_pos=0,4,3&cam_rot=-25,-90&speed=2.5&sens=0.25&znear=0.2&zfar=500"
        )
        conn.request("GET", "/frame?" + q)
        r = conn.getresponse()
        assert r.status == 200
        stats = json.loads(r.getheader("X-Stats"))
        r.read()
        assert stats["ms"] > 0 and len(stats["cam"]["pos"]) == 3

        # Light add applied (count 2, values uploaded).
        assert int(state.params.point_lights.count) == 2
        np.testing.assert_allclose(
            np.asarray(state.params.point_lights.position[1]), [2, 3, -1]
        )
        np.testing.assert_allclose(
            np.asarray(state.params.point_lights.color[1]), [0, 5, 20]
        )
        # Sun + camera settings applied.
        np.testing.assert_allclose(np.asarray(state.params.sun.position), [1, 20, 3])
        np.testing.assert_allclose(np.asarray(state.params.sun.rotation), [-50, 30])
        np.testing.assert_allclose(np.asarray(state.params.sun.color), [4, 5, 6])
        assert state.fly.speed == 2.5 and state.fly.sensitivity == 0.25
        assert float(state.params.camera.z_near) == np.float32(0.2)
        assert float(state.params.camera.z_far) == 500.0

        # Stats endpoint (ring-buffer summary).
        conn.request("GET", "/stats")
        s = conn.getresponse()
        assert s.status == 200 and b"fps" in s.read()

        # Page carries the Lights/Settings/Stats UI.
        conn.request("GET", "/")
        page = conn.getresponse().read()
        for needle in (b"addlight", b"sun pos", b"cam speed", b"plot"):
            assert needle in page, needle
    finally:
        server.shutdown()


def test_viewer_resolution_change():
    """/frame?res=WxH rebuilds the renderer (the PSO-rebuild analogue) and
    subsequent frames come back at the new size with the aspect updated."""
    from PIL import Image
    import io as _io

    W, H = 64, 48
    config = RenderConfig(width=W, height=H, shadow_size=64, force_bruteforce=True)
    meshes, objects, materials, env = cornell_like_scene()
    buffers = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    state = viewer.ViewerState(
        buffers,
        default_scene_params(aspect=W / H),
        default_settings(),
        config,
        pipeline.make_renderer_stats(config),
    )
    png, _ = state.step({})
    assert Image.open(_io.BytesIO(png)).size == (64, 48)
    png, _ = state.step({"res": ["96x64"]})
    assert Image.open(_io.BytesIO(png)).size == (96, 64)
    assert state.config.width == 96 and state.config.height == 64
    assert abs(float(state.params.camera.aspect) - 96 / 64) < 1e-6
    # bad input is ignored
    png, _ = state.step({"res": ["0x0"]})
    assert Image.open(_io.BytesIO(png)).size == (96, 64)


def test_viewer_sun_cache_reuse_and_invalidation():
    """The fused viewer renders through the sun cache: camera-only frames
    reuse it, a sun edit rebuilds it (the app.cpp m_update_lights analogue
    for the shadow chain)."""
    W, H = 64, 48
    config = RenderConfig(width=W, height=H, shadow_size=64)
    meshes, objects, materials, env = cornell_like_scene()
    buffers = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    state = viewer.ViewerState(
        buffers,
        default_scene_params(aspect=W / H),
        default_settings(),
        config,
        pipeline.make_renderer_stats(config),
    )
    png, stats = state.step({})
    assert png[:4] == b"\x89PNG"
    assert state.sun_cache is not None
    cache0 = state.sun_cache

    png, _ = state.step({"f": ["1"]})  # camera-only: cache object reused
    assert state.sun_cache is cache0

    png, _ = state.step({"sun_rot": ["-35,80"]})  # sun edit: rebuilt
    assert state.sun_cache is not cache0


def test_viewer_object_editor_exact():
    """Objects window (scene editor): an object-TRS edit changes the frame
    and matches a from-scratch build with the composed matrix EXACTLY (the
    edit path's two-array update must equal io/build's gather)."""
    import io as _io
    import json

    from PIL import Image

    W, H = 64, 48
    config = RenderConfig(width=W, height=H, shadow_size=64, force_bruteforce=True)
    meshes, objects, materials, env = cornell_like_scene()
    buffers = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    render = pipeline.make_renderer_stats(config)
    state = viewer.ViewerState(
        buffers, default_scene_params(aspect=W / H), default_settings(),
        config, render,
    )
    # Frame the boxes (the default eye looks away from the cornell interior).
    cam = {"cam_pos": ["0,4,3"], "cam_rot": ["-25,-90"]}
    png0, _ = state.step(cam)
    edit = {"id": 1, "dt": [0.4, 0.0, -0.2], "rot": [25.0, -10.0], "scale": 1.2}
    png1, _ = state.step({"obj_edit": [json.dumps(edit)]})
    assert png1 != png0  # the box moved
    img1 = np.asarray(Image.open(_io.BytesIO(png1)).convert("RGB"))

    trs1 = viewer._object_edit_matrix(
        np.asarray(objects[1][0], np.float32), edit["dt"], edit["rot"],
        edit["scale"],
    )
    objects2 = list(objects)
    objects2[1] = (trs1, objects[1][1])
    bufs2 = build_buffers(meshes, objects2, materials, env, tri_bucket=256)
    img2, _ = render(bufs2, state.params, state.settings)
    np.testing.assert_array_equal(img1, np.asarray(img2))

    # Identity edit restores the original frame bit-for-bit (edits compose
    # onto the stored load-time TRS, not onto each other).
    ident = {"id": 1, "dt": [0, 0, 0], "rot": [0, 0], "scale": 1.0}
    png3, _ = state.step({"obj_edit": [json.dumps(ident)]})
    assert png3 == png0

    # Malformed edits are ignored.
    png4, _ = state.step({"obj_edit": ["{bad json"]})
    assert png4 == png0
    png5, _ = state.step({"obj_edit": [json.dumps({"id": 99, "dt": [1, 0, 0]})]})
    assert png5 == png0


def test_viewer_object_edit_invalidates_sun_cache():
    """A geometry edit must rebuild the sun cache (moved geometry casts a
    different shadow), exactly like a sun edit does."""
    import json

    W, H = 64, 48
    config = RenderConfig(width=W, height=H, shadow_size=64)
    meshes, objects, materials, env = cornell_like_scene()
    buffers = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    state = viewer.ViewerState(
        buffers, default_scene_params(aspect=W / H), default_settings(),
        config, pipeline.make_renderer_stats(config),
    )
    state.step({})
    cache0 = state.sun_cache
    assert cache0 is not None

    edit = {"id": 1, "dt": [0.0, 0.6, 0.0], "rot": [0, 0], "scale": 1.0}
    state.step({"obj_edit": [json.dumps(edit)]})
    assert state.sun_cache is not cache0  # rebuilt from the edited geometry

    cache1 = state.sun_cache
    state.step({"f": ["1"]})  # camera-only: reused again
    assert state.sun_cache is cache1
