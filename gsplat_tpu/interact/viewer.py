"""Live scene viewer: TPU renders, the browser displays.

Re-architecture of the reference's WebGL viewer (L4): instead of shipping
the scene to the client and rasterizing in GLSL, the renderer runs here
(Pallas on TPU / interpret on CPU) and the browser is a thin client that
displays JPEG frames and posts input. Feature parity with the reference's
interaction model:

- mouse drag orbit + wheel zoom (js:1188-1255)
- ESC toggles selection mode, click selects a label (js:1342-1388)
- Delete hides the selected label (js:1352-1359)
- H/K/U/J displace the selected label, arrows too (js:1464-1482)
- R resets displacements, V resets visibility, C resets colors (js:1360-69)
- label map overlay toggle (L) — a capability the reference lacks
- session persistence to a JSON file (the localStorage analogue)

Run: ``python -m gsplat_tpu.cli.view --ply_file scene.ply``.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from gsplat_tpu.config import DEFAULT, NO_SELECTION, Config
from gsplat_tpu.interact.edit import EditState, apply_edits, hit_test
from gsplat_tpu.io.cameras import look_at_camera
from gsplat_tpu.render.api import render
from gsplat_tpu.scene import GaussianScene

_PAGE = """<!doctype html>
<html><head><title>gsplat-tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font:13px monospace;overflow:hidden}
#hud{position:fixed;top:8px;left:8px;background:#000a;padding:6px 10px;
     border-radius:6px;white-space:pre}
img{display:block;width:100vw;height:100vh;object-fit:contain;
    image-rendering:auto;cursor:crosshair}
</style></head><body>
<img id="v" draggable="false">
<div id="hud"></div>
<script>
let th=0.8, ph=0.3, r=3.0, sel=false, lab=null, labels=false, busy=false, dirty=true;
const img=document.getElementById('v'), hud=document.getElementById('hud');
function qs(){return `theta=${th}&phi=${ph}&r=${r}&labels=${labels?1:0}`}
async function refresh(){
  if(busy){dirty=true;return} busy=true;dirty=false;
  img.src='/render?'+qs()+'&t='+Date.now();
  await img.decode().catch(()=>{});
  busy=false; if(dirty) refresh();
}
function hudtext(){hud.textContent=
 `orbit: drag | zoom: wheel | ESC select-mode(${sel?'ON':'off'})`+
 ` | selected: ${lab===null?'-':lab}\\nDel hide | H/K/U/J move | L labels(${labels?'ON':'off'})`+
 ` | R/V/C reset disp/vis/color`}
let drag=false,lx=0,ly=0;
img.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;
  th+=(e.clientX-lx)*0.01; ph=Math.max(-1.4,Math.min(1.4,ph+(e.clientY-ly)*0.01));
  lx=e.clientX;ly=e.clientY;refresh()};
window.onwheel=e=>{r=Math.max(0.3,r*(1+e.deltaY*0.001));refresh()};
img.onclick=async e=>{
  if(!sel)return;
  const rect=img.getBoundingClientRect();
  const x=(e.clientX-rect.left)/rect.width, y=(e.clientY-rect.top)/rect.height;
  const res=await fetch(`/select?x=${x}&y=${y}&`+qs());
  lab=(await res.json()).label; hudtext(); refresh()};
window.onkeydown=async e=>{
  const post=async a=>{await fetch('/edit?action='+a+(lab!==null?'&label='+lab:''));refresh()};
  if(e.key==='Escape'){sel=!sel;hudtext()}
  else if(e.key==='Delete'&&lab!==null)post('hide');
  else if(e.key==='l'||e.key==='L'){labels=!labels;hudtext();refresh()}
  else if(e.key==='r'||e.key==='R')post('reset_disp');
  else if(e.key==='v'||e.key==='V')post('reset_vis');
  else if(e.key==='c'||e.key==='C')post('reset_color');
  else if(lab!==null){
    const step={h:[-1,0,0],k:[1,0,0],u:[0,-1,0],j:[0,1,0],
      ArrowLeft:[-1,0,0],ArrowRight:[1,0,0],ArrowUp:[0,-1,0],ArrowDown:[0,1,0]}[e.key];
    if(step)post('displace&dx='+step[0]+'&dy='+step[1]+'&dz='+step[2]);
  }};
hudtext();refresh();
</script></body></html>"""


class ViewerServer:
    """Threaded HTTP viewer around one scene + EditState."""

    def __init__(
        self,
        scene: GaussianScene,
        *,
        cfg: Config = DEFAULT,
        width: int = 640,
        height: int = 480,
        session_path: Optional[str] = None,
        center: Optional[np.ndarray] = None,
    ):
        self.scene = scene
        self.cfg = cfg
        self.width, self.height = width, height
        self.session_path = session_path
        self.edits = (EditState.load(session_path)
                      if session_path and _exists(session_path)
                      else EditState())
        m = scene.to_numpy().means
        self.center = (np.asarray(center) if center is not None
                       else m.mean(axis=0))
        self.lock = threading.Lock()

    # --- rendering ------------------------------------------------------
    def _camera(self, theta: float, phi: float, radius: float):
        eye = self.center + radius * np.array([
            np.cos(phi) * np.cos(theta), np.sin(phi),
            np.cos(phi) * np.sin(theta)])
        return look_at_camera(eye, self.center, width=self.width,
                              height=self.height)

    def render_frame(self, theta, phi, radius, labels=False) -> bytes:
        from PIL import Image

        with self.lock:
            scene = apply_edits(self.scene, self.edits)
            cam = self._camera(theta, phi, radius)
            out = render(scene, cam, self.cfg, with_labels=labels)
            img = np.clip(np.asarray(out["image"]), 0, 1)
            if labels:
                lm = np.asarray(out["label_map"])
                rng = np.random.default_rng(0)
                palette = rng.uniform(0.25, 1.0, size=(256, 3))
                overlay = palette[np.abs(lm) % 256] * (lm != -1)[..., None]
                img = 0.4 * img + 0.6 * overlay
        buf = io.BytesIO()
        Image.fromarray((img * 255).astype(np.uint8)).save(
            buf, "JPEG", quality=90)
        return buf.getvalue()

    def select(self, xf: float, yf: float, theta, phi, radius) -> int:
        with self.lock:
            cam = self._camera(theta, phi, radius)
            scene = apply_edits(self.scene, self.edits)
            lab = hit_test(scene, cam, xf * self.width, yf * self.height,
                           radius_px=self.cfg.interact.hit_radius_px)
            self.edits.selected_label = lab
        return lab

    def edit(self, action: str, label: Optional[int], dxyz) -> None:
        with self.lock:
            if action == "hide" and label is not None:
                self.edits.toggle_visibility(label)
            elif action == "displace" and label is not None:
                self.edits.displace(
                    label, dxyz, step=self.cfg.interact.displacement_step)
            elif action == "reset_disp":
                self.edits.reset_displacements()
            elif action == "reset_vis":
                self.edits.reset_visibility()
            elif action == "reset_color":
                self.edits.reset_colors()
            if self.session_path:
                self.edits.save(self.session_path)

    # --- http -----------------------------------------------------------
    def serve(self, host: str = "127.0.0.1", port: int = 8000):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, body, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                try:
                    if u.path == "/":
                        self._send(200, _PAGE.encode(), "text/html")
                    elif u.path == "/render":
                        jpg = viewer.render_frame(
                            float(q.get("theta", 0)), float(q.get("phi", 0)),
                            float(q.get("r", 3)), q.get("labels") == "1")
                        self._send(200, jpg, "image/jpeg")
                    elif u.path == "/select":
                        lab = viewer.select(
                            float(q["x"]), float(q["y"]),
                            float(q.get("theta", 0)), float(q.get("phi", 0)),
                            float(q.get("r", 3)))
                        lab = None if lab == NO_SELECTION else int(lab)
                        self._send(200, json.dumps({"label": lab}).encode())
                    elif u.path == "/edit":
                        viewer.edit(
                            q.get("action", ""),
                            int(q["label"]) if "label" in q else None,
                            (float(q.get("dx", 0)), float(q.get("dy", 0)),
                             float(q.get("dz", 0))))
                        self._send(200, b"{}")
                    else:
                        self._send(404, b"not found", "text/plain")
                except Exception as e:  # surface errors to the client
                    self._send(500, str(e).encode(), "text/plain")

        httpd = ThreadingHTTPServer((host, port), Handler)
        print(f"viewer at http://{host}:{httpd.server_address[1]}/")
        httpd.serve_forever()


def _exists(p):
    import os

    return os.path.exists(p)
