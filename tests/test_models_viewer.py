"""Model families (parametric galaxies) + the HTTP viewer."""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import gamer_tpu
from gamer_tpu.models import GALLERY, fixture, fixture_names


def test_gallery_builders_render():
    from gamer_tpu.engine.render import render_scene

    for name, builder in GALLERY.items():
        g = builder()
        assert g.components, name
        scene = gamer_tpu.Scene(
            camera=gamer_tpu.CameraParams(camera=(0.25, 0.9, 0.1),
                                          target=(0, 0, 0), up=(0, 0, 1),
                                          fov=75.0),
            instances=[gamer_tpu.GalaxyInstance(galaxy=g)],
            config=gamer_tpu.RenderConfig(size=12, ray_step=0.025),
        )
        img = render_scene(scene)
        assert int(img.sum()) > 0, f"{name} rendered black"


def test_fixture_loader(fixtures_dir):
    names = fixture_names()
    assert "Spiral" in names
    g = fixture("Spiral")
    assert g.components
    with pytest.raises(FileNotFoundError):
        fixture("NoSuchGalaxy")


def test_viewer_endpoints():
    from gamer_tpu.viewer import serve

    httpd = serve(port=8763, size=12, poll=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        time.sleep(0.2)
        base = "http://127.0.0.1:8763"
        page = urllib.request.urlopen(base + "/").read()
        assert b"gamer-tpu" in page
        names = json.loads(urllib.request.urlopen(base + "/galaxies").read())
        assert len(names) >= len(GALLERY)
        png = urllib.request.urlopen(
            base + f"/render?galaxy={names[-1]}&h=30&v=10").read()
        assert png[:4] == b"\x89PNG"
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(base + "/render?h=notanumber").read()
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(base + "/nope").read()
    finally:
        httpd.shutdown()


def test_viewer_live_edit_endpoints():
    """/set -> /render edit->preview loop (the GUI tabs' capability,
    mainwindow.cpp:267-302) + /params + /reset."""
    import numpy as np
    from PIL import Image
    import io

    from gamer_tpu.viewer import serve

    httpd = serve(port=8764, size=12, poll=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        time.sleep(0.2)
        base = "http://127.0.0.1:8764"
        names = json.loads(urllib.request.urlopen(base + "/galaxies").read())
        g = names[0]
        params0 = json.loads(urllib.request.urlopen(
            base + f"/params?galaxy={g}").read())
        before = np.asarray(Image.open(io.BytesIO(urllib.request.urlopen(
            base + f"/render?galaxy={g}").read())))
        # crank a component's strength way up -> frame must change
        r = json.loads(urllib.request.urlopen(
            base + f"/set?galaxy={g}&comp=0&field=strength&value=99999").read())
        assert r["value"] == 99999.0
        params1 = json.loads(urllib.request.urlopen(
            base + f"/params?galaxy={g}").read())
        assert params1 != params0
        after = np.asarray(Image.open(io.BytesIO(urllib.request.urlopen(
            base + f"/render?galaxy={g}").read())))
        assert after.astype(int).sum() != before.astype(int).sum()
        # galaxy-level edit
        r2 = json.loads(urllib.request.urlopen(
            base + f"/set?galaxy={g}&comp=-1&field=winding_n&value=6").read())
        assert r2["comp"] == -1 and r2["value"] == 6.0
        # bad field -> 400, not a crash
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                base + f"/set?galaxy={g}&comp=0&field=nope&value=1").read()
        # unknown galaxy name -> 400, never another galaxy's data
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(base + "/params?galaxy=NoSuchGalaxy").read()
        # empty name still serves the default
        assert json.loads(urllib.request.urlopen(base + "/params").read())
        # reset restores the original frame
        urllib.request.urlopen(base + f"/reset?galaxy={g}").read()
        reset_img = np.asarray(Image.open(io.BytesIO(urllib.request.urlopen(
            base + f"/render?galaxy={g}").read())))
        np.testing.assert_array_equal(reset_img, before)
    finally:
        httpd.shutdown()


def test_viewer_editor_endpoints():
    """The full editor surface: structural component edits, the spectra
    table, render settings, .gax save/upload, full render + skybox — the
    reference GUI's five tabs and Render/Skybox buttons
    (mainwindow.cpp:451-474,846-927,1080-1083) in the HTTP world."""
    import io

    from PIL import Image

    from gamer_tpu.viewer import serve

    httpd = serve(port=8765, size=12, poll=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        time.sleep(0.2)
        base = "http://127.0.0.1:8765"
        u = lambda p: urllib.request.urlopen(base + p).read()
        names = json.loads(u("/galaxies"))
        g = names[0]
        n0 = len(json.loads(u(f"/params?galaxy={g}"))["components"])

        # structural edits: add / clone / delete (GUI component buttons)
        assert json.loads(u(f"/addcomp?galaxy={g}&class=disk"))["added"] == n0
        assert json.loads(u(f"/clonecomp?galaxy={g}&comp=0"))["added"] == 1
        p = json.loads(u(f"/params?galaxy={g}"))
        assert len(p["components"]) == n0 + 2
        assert p["components"][1] == p["components"][0]  # clone sits after
        json.loads(u(f"/delcomp?galaxy={g}&comp={n0 + 1}"))
        assert len(json.loads(u(f"/params?galaxy={g}"))["components"]) == n0 + 1

        # spectra table (Spectra tab): built-ins + user add/edit/delete
        sp = json.loads(u("/spectra"))
        assert sp["White"] == [1.0, 1.0, 1.0] and "Red" in sp
        json.loads(u("/setspectrum?name=Teal&value=0.2,0.9,0.8"))
        assert json.loads(u("/spectra"))["Teal"] == [0.2, 0.9, 0.8]
        json.loads(u("/delspectrum?name=Teal"))
        assert "Teal" not in json.loads(u("/spectra"))

        # render settings (Rendering/PostProcessing tabs) feed the preview
        before = u(f"/render?galaxy={g}")
        json.loads(u("/setcfg?field=exposure&value=0.4"))
        assert json.loads(u("/cfg"))["exposure"] == 0.4
        assert u(f"/render?galaxy={g}") != before
        json.loads(u("/setcfg?field=exposure&value=1.0"))

        # .gax save (with edits baked in) -> upload under a new name
        data = u(f"/save?galaxy={g}")
        req = urllib.request.Request(base + "/upload?name=Uploaded",
                                     data=data, method="POST")
        assert json.loads(urllib.request.urlopen(req).read())["ok"]
        assert "Uploaded" in json.loads(u("/galaxies"))
        up = json.loads(u("/params?galaxy=Uploaded"))
        assert len(up["components"]) == n0 + 1  # the structural edit persisted

        # Render + Skybox buttons (tiny sizes; skybox = 3x2 face montage)
        png = u(f"/fullrender?galaxy={g}&size=12&h=0&v=20")
        assert png[:4] == b"\x89PNG"
        sky = Image.open(io.BytesIO(u(f"/skybox?galaxy={g}&size=8")))
        assert sky.size == (24, 16)

        # validation: every bad request is a 4xx, never a crash
        for path in (f"/addcomp?galaxy={g}&class=nope",
                     f"/delcomp?galaxy={g}&comp=99",
                     "/setcfg?field=bogus&value=1",
                     "/setspectrum?name=&value=1,1,1",
                     "/delspectrum?name=NoSuch",
                     f"/fullrender?galaxy={g}&size=99999"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(base + path).read()
            assert 400 <= ei.value.code < 500, path

        # reset drops the structural edits too
        json.loads(u(f"/reset?galaxy={g}"))
        assert len(json.loads(u(f"/params?galaxy={g}"))["components"]) == n0
    finally:
        httpd.shutdown()
