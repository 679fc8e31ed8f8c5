"""Interactive browser viewer — the SDL window + ImGui analogue for a
headless TPU host (SURVEY.md §7 phase-2 "optional interactive viewer").

Zero dependencies: a localhost http.server streams PNG frames; an HTML page
captures WASD/space/ctrl + mouse-drag (right button) and posts them back,
mirroring App::handle_event (app.cpp:109-148). A settings panel edits
ambient/sun/gamma/tonemap/exposure live, like the ImGui Settings window
(app.cpp:454-493).

    python -m arctic_tpu.app.viewer --procedural cornell --width 640 --height 360
    # then open http://localhost:8000
"""

from __future__ import annotations

import argparse
import dataclasses
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><html><head><title>arctic_tpu</title><style>
body{background:#111;color:#ccc;font-family:monospace;margin:12px}
canvas{border:1px solid #444}input{width:64px}</style></head><body>
<div>arctic_tpu viewer — WASD/space/ctrl move, right-drag look</div>
<canvas id=c width=%W% height=%H% tabindex=0></canvas>
<div>
ambient <input id=ambient value=0.1> gamma <input id=gamma value=2.2>
exposure <input id=exposure value=1.0>
tonemap <select id=tm><option value=0>reinhard</option><option value=1>exposure</option><option value=2>aces</option></select>
<span id=fps></span></div>
<script>
const c=document.getElementById('c'),ctx=c.getContext('2d');
let keys={},dx=0,dy=0,drag=false,t0=performance.now();
c.onmousedown=e=>{if(e.button==2)drag=true};
c.onmouseup=e=>{if(e.button==2)drag=false};
c.oncontextmenu=e=>e.preventDefault();
c.onmousemove=e=>{if(drag){dx+=e.movementX;dy+=e.movementY}};
window.onkeydown=e=>keys[e.code]=1; window.onkeyup=e=>keys[e.code]=0;
async function loop(){
  const q=new URLSearchParams({
    f:(keys.KeyW?1:0)-(keys.KeyS?1:0), r:(keys.KeyD?1:0)-(keys.KeyA?1:0),
    u:(keys.Space?1:0)-(keys.ControlLeft?1:0), dx:dx, dy:dy,
    ambient:document.getElementById('ambient').value,
    gamma:document.getElementById('gamma').value,
    exposure:document.getElementById('exposure').value,
    tm:document.getElementById('tm').value});
  dx=0;dy=0;
  const r=await fetch('/frame?'+q); const b=await r.blob();
  const img=await createImageBitmap(b); ctx.drawImage(img,0,0);
  const t1=performance.now();
  document.getElementById('fps').textContent=' '+(1000/(t1-t0)).toFixed(1)+' fps';
  t0=t1; requestAnimationFrame(loop);
}
loop();
</script></body></html>"""


class ViewerState:
    def __init__(self, buffers, params, settings, config, render):
        self.buffers = buffers
        self.params = params
        self.settings = settings
        self.config = config
        self.render = render
        self.lock = threading.Lock()
        self.last_time = time.perf_counter()

        from arctic_tpu.app.camera import FlyCamera

        self.fly = FlyCamera()

    def step(self, q: dict) -> bytes:
        import jax.numpy as jnp
        from PIL import Image

        def f(name, default=0.0):
            try:
                return float(q.get(name, [default])[0])
            except ValueError:
                return default

        with self.lock:
            now = time.perf_counter()
            dt = min(now - self.last_time, 0.1)
            self.last_time = now
            cam = self.params.camera
            cam = self.fly.move(cam, dt, f("f"), f("r"), f("u"))
            cam = self.fly.look(cam, f("dx"), f("dy"))
            self.params = dataclasses.replace(
                self.params, camera=cam, ambient=jnp.float32(f("ambient", 0.1))
            )
            self.settings = dataclasses.replace(
                self.settings,
                gamma=jnp.float32(f("gamma", 2.2)),
                exposure=jnp.float32(f("exposure", 1.0)),
                tm_method=jnp.int32(int(f("tm", 0))),
            )
            img = np.asarray(self.render(self.buffers, self.params, self.settings))
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "PNG")
        return buf.getvalue()


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = (
                    _PAGE.replace("%W%", str(state.config.width))
                    .replace("%H%", str(state.config.height))
                    .encode()
                )
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/frame":
                png = state.step(parse_qs(url.query))
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.end_headers()
                self.wfile.write(png)
            elif url.path == "/state":
                from arctic_tpu.utils.serialize import params_to_dict

                body = json.dumps(
                    params_to_dict(state.params, state.settings)
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def serve(state: ViewerState, port: int = 8000):
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(state))
    print(f"viewer: http://localhost:{port}")
    server.serve_forever()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("scene", nargs="?")
    p.add_argument("--procedural", choices=["cornell", "sponza"], default="cornell")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--shadow-size", type=int, default=1024)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--bruteforce", action="store_true")
    args = p.parse_args(argv)

    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import default_scene_params, default_settings
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.models import pipeline

    if args.scene:
        from arctic_tpu.io.load import load_scene_file

        meshes, objects, materials, env = load_scene_file(args.scene)
    else:
        from arctic_tpu.io import procedural

        fn = (
            procedural.cornell_like_scene
            if args.procedural == "cornell"
            else procedural.sponza_like_scene
        )
        meshes, objects, materials, env = fn()
    config = RenderConfig(
        width=args.width,
        height=args.height,
        shadow_size=args.shadow_size,
        force_bruteforce=args.bruteforce,
    )
    buffers = build_buffers(meshes, objects, materials, env)
    state = ViewerState(
        buffers,
        default_scene_params(aspect=args.width / args.height),
        default_settings(),
        config,
        pipeline.make_renderer(config),
    )
    serve(state, args.port)


if __name__ == "__main__":
    main()
