"""Interactive galaxy viewer — the tools/galaxy_viewer.py analog.

The reference's realtime viewer is a desktop window over its GPU kernel with
WASD/mouse orbit and gallery cycling (tools/galaxy_viewer.py:102-211). This
environment has no display, so the equivalent surface is a tiny stdlib HTTP
server: the browser shows the current frame and every interaction re-renders
through the engine (Pallas on TPU, XLA elsewhere).

    python -m gamer_tpu.viewer [--port 8000] [--size 256] [--dir <gax dir>]

Endpoints:
    /                  viewer page (orbit buttons / keyboard)
    /render?...        PNG frame: galaxy=<name>&h=<deg>&v=<deg>&zoom=<f>
    /galaxies          JSON list of available galaxies (files + presets)
    /params?galaxy=    JSON dict of the galaxy's current (edited) parameters
    /set?galaxy=&comp=&field=&value=   live parameter edit; the next /render
                       shows it — the edit->preview loop of the reference's
                       GUI tabs (mainwindow.cpp:267-302,483-495) in the
                       scene-dict world. comp=-1 edits galaxy-level params.
    /reset?galaxy=     drop all edits for the galaxy
"""

from __future__ import annotations

import io
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

_PAGE = """<!doctype html>
<title>gamer-tpu viewer</title>
<style>body{background:#000;color:#ccc;font-family:monospace;text-align:center}
img{image-rendering:pixelated;width:70vmin;height:70vmin;margin:8px}
button{background:#222;color:#ccc;border:1px solid #555;margin:2px;padding:4px 10px}</style>
<h3 id=t>gamer-tpu</h3>
<div>
<button onclick="rot(-15,0)">&larr;</button>
<button onclick="rot(15,0)">&rarr;</button>
<button onclick="rot(0,-15)">&uarr;</button>
<button onclick="rot(0,15)">&darr;</button>
<button onclick="zoomBy(0.1)">zoom+</button>
<button onclick="zoomBy(-0.1)">zoom-</button>
<button onclick="cycle(1)">next galaxy</button>
<button id=q onclick="cycleLod()">quality: fast</button>
<button onclick="editParam()">edit</button>
<button onclick="resetEdits()">reset</button>
</div>
<img id=v>
<script>
let h=0,v=20,zoom=0,gi=0,names=[],quals=[[4,1],[6,1],[0,1],[0,2]],
  qualNames=['fast','med','exact','exact+AA'],li=0;
async function load(){names=await (await fetch('/galaxies')).json();refresh();}
function refresh(){
  const g=names[gi]||'';
  document.getElementById('t').textContent='gamer-tpu :: '+g+'  h='+h+' v='+v;
  document.getElementById('v').src='/render?galaxy='+encodeURIComponent(g)+
    '&h='+h+'&v='+v+'&zoom='+zoom+'&lod='+quals[li][0]+'&ss='+quals[li][1]+
    '&_='+Date.now();}
function cycleLod(){li=(li+1)%quals.length;
  document.getElementById('q').textContent='quality: '+qualNames[li];refresh();}
function rot(dh,dv){h+=dh;v+=dv;refresh();}
function zoomBy(d){zoom+=d;refresh();}
function cycle(d){gi=(gi+d+names.length)%names.length;refresh();}
async function editParam(){
  const s=prompt('edit: comp,field,value   (comp -1 = galaxy level; e.g. "1,strength,1200" or "-1,winding_n,6")');
  if(!s)return; const parts=s.split(','); if(parts.length<3)return;
  const r=await fetch('/set?galaxy='+encodeURIComponent(names[gi])+
    '&comp='+parts[0].trim()+'&field='+parts[1].trim()+
    '&value='+encodeURIComponent(parts.slice(2).join(',').trim()));
  if(!r.ok)alert(await r.text()); refresh();}
async function resetEdits(){
  await fetch('/reset?galaxy='+encodeURIComponent(names[gi]));refresh();}
document.addEventListener('keydown',e=>{
  if(e.key=='a')rot(-15,0); if(e.key=='d')rot(15,0);
  if(e.key=='w')rot(0,-15); if(e.key=='s')rot(0,15);
  if(e.key=='q')zoomBy(0.1); if(e.key=='e')zoomBy(-0.1);
  if(e.key=='n')cycle(1); if(e.key=='f')cycleLod();});
// mouse orbit (drag) + wheel zoom, like the reference viewer's GL widget
let drag=null;
const img=document.getElementById('v');
img.addEventListener('pointerdown',e=>{drag=[e.clientX,e.clientY];e.preventDefault();});
window.addEventListener('pointerup',e=>{
  if(!drag)return;
  const dx=e.clientX-drag[0],dy=e.clientY-drag[1];drag=null;
  if(Math.abs(dx)+Math.abs(dy)>3)rot(Math.round(dx/3),Math.round(dy/3));});
img.addEventListener('wheel',e=>{e.preventDefault();zoomBy(e.deltaY<0?0.1:-0.1);},
  {passive:false});
load();
</script>"""


# numeric knobs editable through /set — the ComponentParams / GalaxyParams
# fields of the reference's Components/Galaxy tabs (componentparams.h:7-44,
# galaxyparams.h:10-43). 'active' toggles a component (recompiles the scene
# structure, like the GUI's checkbox); 'spectrum' is the one string field.
_COMP_EDIT_FIELDS = {
    "strength", "arm", "z0", "r0", "inner", "delta", "winding", "scale",
    "noise_offset", "noise_tilt", "ks", "active",
}
_GALAXY_EDIT_FIELDS = {
    "winding_b", "winding_n", "no_arms", "arm1", "arm2", "arm3", "arm4",
    "bulge_dust", "inner_twirl", "warp_amplitude", "warp_scale",
}


class _ViewerState:
    def __init__(self, size: int, gax_dir: Path | None):
        self.size = size
        self.lock = threading.Lock()
        self.galaxies = {}
        # per-galaxy live edits: name -> list of (comp_idx|None, field, value)
        self.edits: dict = {}
        if gax_dir and gax_dir.is_dir():
            from .scene import gax

            for p in sorted(gax_dir.glob("*.gax")):
                self.galaxies[p.stem] = lambda p=p: gax.load(p)
        from .models import GALLERY

        for name, builder in GALLERY.items():
            self.galaxies.setdefault(name, builder)

    def _galaxy(self, name: str):
        """The named galaxy with this session's live edits applied. An
        EMPTY name means "the default" (first gallery entry); an unknown
        non-empty name is an error — silently serving some other galaxy's
        data under a typo'd name would corrupt the client's edit state."""
        if name and name not in self.galaxies:
            raise ValueError(f"unknown galaxy {name!r}")
        builder = self.galaxies.get(name) or next(iter(self.galaxies.values()))
        g = builder()
        for comp, field, value in self.edits.get(name, []):
            if comp is None:
                setattr(g.params, field, value)
            else:
                setattr(g.components[comp], field, value)
        return g

    def set_param(self, name: str, comp: int, field: str, raw: str):
        """Validate + record one edit; returns the applied value."""
        if name not in self.galaxies:
            raise ValueError(f"unknown galaxy {name!r}")
        g = self._galaxy(name)
        if comp < 0:  # galaxy-level
            if field == "axis":
                value = tuple(float(v) for v in raw.split(","))
                if len(value) != 3:
                    raise ValueError("axis needs 3 comma-separated values")
            elif field in _GALAXY_EDIT_FIELDS:
                value = float(raw)
            else:
                raise ValueError(
                    f"unknown galaxy field {field!r}; editable: "
                    f"{sorted(_GALAXY_EDIT_FIELDS)} + axis")
            self.edits.setdefault(name, []).append((None, field, value))
        else:
            if not 0 <= comp < len(g.components):
                raise ValueError(
                    f"component {comp} out of range (galaxy has "
                    f"{len(g.components)})")
            if field == "spectrum":
                value = raw
            elif field in _COMP_EDIT_FIELDS:
                value = int(float(raw)) if field == "active" else float(raw)
            else:
                raise ValueError(
                    f"unknown component field {field!r}; editable: "
                    f"{sorted(_COMP_EDIT_FIELDS)} + spectrum")
            self.edits.setdefault(name, []).append((comp, field, value))
        return value

    def render_png(self, name: str, h_deg: float, v_deg: float,
                   zoom: float, lod: int = 4, ss: int = 1) -> bytes:
        import numpy as np
        from PIL import Image

        import gamer_tpu
        from .scene.cameracontrols import rotate_horizontal, rotate_vertical
        from .scene.cameracontrols import zoom as czoom

        galaxy = self._galaxy(name)
        cam = gamer_tpu.CameraParams(camera=(1.2, 0.0, 0.0), target=(0, 0, 0),
                                     up=(0, 0, 1), fov=75.0)
        cam = rotate_horizontal(cam, h_deg)
        cam = rotate_vertical(cam, v_deg)
        if zoom:
            cam = czoom(cam, zoom)
        scene = gamer_tpu.Scene(
            camera=cam,
            instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
            # interactive default: noise LOD 4 (~1.5x faster frames,
            # preview-grade grain); lod=0 renders the exact octave counts
            config=gamer_tpu.RenderConfig(size=self.size, ray_step=0.025,
                                          is_preview=True,
                                          noise_octaves=lod or None,
                                          supersample=max(1, ss)),
        )
        with self.lock:  # one device render at a time
            from .engine.pallas_render import render_scene_pallas

            img = render_scene_pallas(scene)
        buf = io.BytesIO()
        Image.fromarray(np.asarray(img)).save(buf, format="PNG")
        return buf.getvalue()


def make_handler(state: _ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            if url.path == "/":
                self._send(200, "text/html", _PAGE.encode())
            elif url.path == "/galaxies":
                self._send(200, "application/json",
                           json.dumps(sorted(state.galaxies)).encode())
            elif url.path == "/render":
                q = urllib.parse.parse_qs(url.query)
                get = lambda k, d: float(q.get(k, [d])[0])
                name = q.get("galaxy", [""])[0]
                try:
                    png = state.render_png(name, get("h", 0), get("v", 0),
                                           get("zoom", 0),
                                           int(get("lod", 4)),
                                           int(get("ss", 1)))
                    self._send(200, "image/png", png)
                except Exception as e:  # noqa: BLE001
                    self._send(500, "text/plain", str(e).encode())
            elif url.path == "/params":
                from .scene.schema import galaxy_to_dict

                q = urllib.parse.parse_qs(url.query)
                name = q.get("galaxy", [""])[0]
                try:
                    d = galaxy_to_dict(state._galaxy(name))
                    self._send(200, "application/json",
                               json.dumps(d, indent=1).encode())
                except Exception as e:  # noqa: BLE001
                    self._send(400, "text/plain", str(e).encode())
            elif url.path == "/set":
                q = urllib.parse.parse_qs(url.query)
                try:
                    name = q.get("galaxy", [""])[0]
                    comp = int(q.get("comp", ["-1"])[0])
                    field = q.get("field", [""])[0]
                    raw = q.get("value", [""])[0]
                    value = state.set_param(name, comp, field, raw)
                    self._send(200, "application/json", json.dumps(
                        {"galaxy": name, "comp": comp, "field": field,
                         "value": value}).encode())
                except Exception as e:  # noqa: BLE001
                    self._send(400, "text/plain", str(e).encode())
            elif url.path == "/reset":
                q = urllib.parse.parse_qs(url.query)
                name = q.get("galaxy", [""])[0]
                state.edits.pop(name, None)
                self._send(200, "application/json", b'{"reset": true}')
            else:
                self._send(404, "text/plain", b"not found")

    return Handler


def serve(port: int = 8000, size: int = 256, gax_dir: str | None = None,
          poll: bool = True):
    state = _ViewerState(size, Path(gax_dir) if gax_dir else
                         Path("/root/reference/publish/data/galaxies"))
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(state))
    print(f"gamer-tpu viewer on http://127.0.0.1:{port}/ "
          f"({len(state.galaxies)} galaxies, {size}px)")
    if poll:
        httpd.serve_forever()
    return httpd


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--dir", default=None)
    args = ap.parse_args()
    serve(args.port, args.size, args.dir)
