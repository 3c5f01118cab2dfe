"""Render service: job lifecycle, cross-request batching, abort, failure
isolation, and the HTTP surface (gamer_tpu/serve.py)."""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import gamer_tpu
from gamer_tpu.scene import gax
from gamer_tpu.scene.cameracontrols import orbit_path
from gamer_tpu.scene.schema import scene_to_dict
from gamer_tpu.serve import ABORTED, DONE, FAILED, RenderService, _bucket, serve


@pytest.fixture(scope="module")
def vortex_scene(fixtures_dir):
    g = gax.load(fixtures_dir / "VortexCloud.gax")
    return gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=g)],
        config=gamer_tpu.RenderConfig(size=16, ray_step=0.025),
    )


def test_bucket_padding():
    assert [_bucket(n) for n in (1, 2, 3, 5, 8, 9)] == [1, 2, 4, 8, 8, 16]
    assert _bucket(3, multiple_of=8) == 8
    assert _bucket(9, multiple_of=8) == 16
    # non-power-of-two meshes (e.g. 3x8 = 24 devices) must terminate and tile
    assert _bucket(5, multiple_of=3) == 6
    assert _bucket(24, multiple_of=24) == 24
    assert _bucket(25, multiple_of=24) == 48


def test_single_job_lifecycle(vortex_scene):
    from gamer_tpu.engine.pallas_render import render_progressive_pallas

    svc = RenderService(bands=8, single_fuse_below=0)  # exercise banding
    try:
        t_submit = time.time()
        jid = svc.submit(vortex_scene)
        job = svc.wait(jid)
        assert job.state == DONE
        assert job.progress == 1.0
        assert not job.batched
        assert job.image.shape == (16, 16, 3) and job.image.dtype == np.uint8
        assert int(job.image.sum()) > 0
        # identical to a direct progressive render with the same band count
        direct = render_progressive_pallas(vortex_scene, bands=8)
        np.testing.assert_array_equal(job.image, direct)
        info = job.info()
        assert info["state"] == "done" and info["error"] is None
        assert 0 <= info["queued_s"] <= time.time() - t_submit + 1
        assert svc.metrics["frames_rendered"] == 1
    finally:
        svc.stop()


def test_small_single_is_one_fused_launch(vortex_scene):
    """Default service: a small single frame renders as ONE fused launch
    (no progressive banding — each band is a device round trip), and the
    image equals the fused production render exactly."""
    from gamer_tpu.engine.pallas_render import render_scene_pallas

    svc = RenderService()  # default single_fuse_below=512
    try:
        jid = svc.submit(vortex_scene)
        job = svc.wait(jid)
        assert job.state == DONE
        assert svc.metrics["singles_fused"] == 1
        np.testing.assert_array_equal(
            job.image, np.asarray(render_scene_pallas(vortex_scene)))
    finally:
        svc.stop()


def test_preview_then_refine(vortex_scene):
    """Preview-then-refine: the fast LOD frame is published FIRST (observed
    deterministically at the phase boundary via the preemption hook), then
    the exact frame replaces it — bit-equal to a direct exact render
    (mainwindow.cpp:483-495's preview→full contract as a service)."""
    from gamer_tpu.engine.pallas_render import render_scene_pallas

    svc = RenderService(autostart=False)
    observed = {}
    orig = svc._preempt_quick_jobs

    def spy():
        job = svc.jobs[jid]
        observed["preview_ready"] = job.preview_ready
        observed["state"] = job.state
        observed["image"] = None if job.image is None else job.image.copy()
        return orig()

    svc._preempt_quick_jobs = spy
    jid = svc.submit(vortex_scene, preview=2)
    job = svc.jobs[jid]
    with svc._cond:
        svc._queue.clear()
    svc._execute_head(job)

    # at the phase boundary the preview was already published
    assert observed["preview_ready"] and observed["state"] == "running"
    assert observed["image"] is not None and int(observed["image"].sum()) > 0
    assert job.state == DONE and job.preview_ready
    assert svc.metrics["previews_rendered"] == 1
    # the refined artifact is bit-equal to a direct exact render
    np.testing.assert_array_equal(
        job.image, np.asarray(render_scene_pallas(vortex_scene)))
    # and the preview frame was a genuinely different (LOD) frame
    assert not np.array_equal(observed["image"], job.image)
    assert job.info()["preview_ready"] is True


def test_preview_wait_until(vortex_scene):
    """wait(until='preview') returns as soon as the LOD frame is up; the
    terminal wait still returns the exact frame."""
    svc = RenderService()
    try:
        jid = svc.submit(vortex_scene, preview=2)
        job = svc.wait(jid, timeout=120.0, until="preview")
        assert job.preview_ready
        assert job.image is not None
        job = svc.wait(jid, timeout=120.0)
        assert job.state == DONE
    finally:
        svc.stop()
    with pytest.raises(ValueError, match="until"):
        svc.wait(jid, until="nonsense")


def test_preview_validation(vortex_scene):
    svc = RenderService(autostart=False)
    with pytest.raises(ValueError, match="preview octaves"):
        svc.submit(vortex_scene, preview=-1)
    # 0/False mean "no preview", matching the HTTP payload's default
    assert svc.jobs[svc.submit(vortex_scene, preview=0)].preview_lod is None
    # preview jobs never merge into request batches
    j1 = svc.jobs[svc.submit(vortex_scene, preview=True)]
    j2 = svc.jobs[svc.submit(vortex_scene, preview=True)]
    assert j1.key != j2.key
    assert j1.preview_lod == 4


def test_cross_request_batching(vortex_scene):
    """Concurrent compatible requests collapse into ONE padded device
    launch — the TPU-native serving shape."""
    import dataclasses

    from gamer_tpu.engine.batch import render_batch

    cams = orbit_path(vortex_scene.camera, 3, horizontal_deg=60.0)
    scenes = [dataclasses.replace(vortex_scene, camera=c) for c in cams]

    svc = RenderService(autostart=False)
    try:
        jids = [svc.submit(s) for s in scenes]
        svc.start()
        jobs = [svc.wait(j) for j in jids]
        assert all(j.state == DONE for j in jobs)
        assert all(j.batched for j in jobs)
        assert svc.metrics["batches"] == 1
        assert svc.metrics["batched_frames"] == 3
        assert svc.metrics["padded_frames"] == 1  # bucket 4, 3 live frames
        # frames match the equivalent direct padded batch launch
        direct = render_batch(scenes + [scenes[-1]])
        for j, frame in zip(jobs, direct):
            np.testing.assert_array_equal(j.image, frame)
        # distinct cameras produced distinct frames
        assert not np.array_equal(jobs[0].image, jobs[1].image)
    finally:
        svc.stop()


def test_max_batch_caps_launch_size(vortex_scene):
    """max_batch splits a 5-deep compatible queue into capped launches —
    the latency dial (a request's latency is quantized to the launch it
    lands in, BASELINE.md serving rows). Leftovers stay FIFO and form the
    next launch; results still match the direct renders."""
    import dataclasses

    cams = orbit_path(vortex_scene.camera, 5, horizontal_deg=80.0)
    scenes = [dataclasses.replace(vortex_scene, camera=c) for c in cams]

    svc = RenderService(autostart=False, max_batch=2)
    try:
        jids = [svc.submit(s) for s in scenes]
        svc.start()
        jobs = [svc.wait(j) for j in jids]
        assert all(j.state == DONE for j in jobs)
        # 5 jobs at cap 2 -> launches of 2, 2, 1 (the final solo renders
        # through the single path, not a batch launch)
        assert svc.metrics["batches"] == 2
        assert svc.metrics["batched_frames"] == 4
        # frames are per-camera correct regardless of which launch served
        # them: distinct cameras -> distinct frames
        for a, b in zip(jobs, jobs[1:]):
            assert not np.array_equal(a.image, b.image)
    finally:
        svc.stop()


def test_max_batch_validation():
    with pytest.raises(ValueError):
        RenderService(autostart=False, max_batch=0)


def test_incompatible_sizes_do_not_batch(vortex_scene):
    import dataclasses

    other = dataclasses.replace(
        vortex_scene,
        config=dataclasses.replace(vortex_scene.config, size=24))
    svc = RenderService(autostart=False)
    try:
        j1 = svc.submit(vortex_scene)
        j2 = svc.submit(other)
        svc.start()
        a, b = svc.wait(j1), svc.wait(j2)
        assert a.state == DONE and b.state == DONE
        assert not a.batched and not b.batched
        assert svc.metrics["batches"] == 0
        assert a.image.shape == (16, 16, 3)
        assert b.image.shape == (24, 24, 3)
    finally:
        svc.stop()


def test_abort_queued_job(vortex_scene):
    svc = RenderService(autostart=False)
    try:
        j1 = svc.submit(vortex_scene)
        j2 = svc.submit(vortex_scene)
        assert svc.abort(j2)
        assert svc.jobs[j2].state == ABORTED
        assert svc.queue_depth() == 1
        svc.start()
        assert svc.wait(j1).state == DONE
        # an aborted-while-queued job is batched with nothing, renders nothing
        assert svc.jobs[j2].image is None
        assert svc.metrics["jobs_aborted"] == 1
    finally:
        svc.stop()


def test_abort_running_job_keeps_partial_frame(vortex_scene):
    """Cooperative abort between bands: the reference's aborted back-buffer
    semantics (rasterizer.h:91-98) — unrendered rows stay black."""
    import dataclasses

    big = dataclasses.replace(
        vortex_scene,
        config=dataclasses.replace(vortex_scene.config, size=96))
    svc = RenderService(autostart=False, bands=3,  # 3 x 32-row bands at 96px
                        single_fuse_below=0)  # keep the banded-abort path
    try:
        jid = svc.submit(big)
        job = svc.jobs[jid]

        # The abort flag is checked at each band's progress callback, so a
        # flag raised during band k stops the render after band k+1: abort
        # right after band 1 -> bands 1-2 rendered, band 3 never runs.
        def abort_after_first_band():
            while job.progress < 0.3 and job.state != DONE:
                time.sleep(0.001)
            svc.abort(jid)

        poller = threading.Thread(target=abort_after_first_band)
        poller.start()
        svc.start()
        job = svc.wait(jid)
        poller.join()
        assert job.state == ABORTED
        assert job.image is not None
        assert job.progress < 1.0
        # top band has content; the never-rendered bottom band stays black
        assert int(job.image[:32].sum()) > 0
        assert int(job.image[64:].sum()) == 0
    finally:
        svc.stop()


def test_render_failure_isolates_job(vortex_scene, monkeypatch):
    """A poisoned render fails THAT job; the worker keeps serving.

    Patches render_scene_pallas — the fused path a default service takes
    for small singles (single_fuse_below) — so the poison raises at
    dispatch, exercising _execute_head's isolation (the readback-side
    twin is test_readback_failure_isolates_job)."""
    from gamer_tpu.engine import pallas_render

    def boom(*a, **k):
        raise RuntimeError("device worker crashed")

    svc = RenderService(autostart=False)
    try:
        monkeypatch.setattr(pallas_render, "render_scene_pallas", boom)
        svc.start()
        j1 = svc.submit(vortex_scene)
        job = svc.wait(j1)
        assert job.state == FAILED
        assert "device worker crashed" in job.error
        assert svc.healthy()  # one failure is not yet a poisoned runtime
        for _ in range(2):
            svc.wait(svc.submit(vortex_scene))
        assert not svc.healthy()  # 3 consecutive failures -> restart me
        monkeypatch.undo()
        j2 = svc.submit(vortex_scene)
        assert svc.wait(j2).state == DONE
        assert svc.healthy()  # a success resets the failure streak
        assert svc.metrics["jobs_failed"] == 3
    finally:
        svc.stop()


def test_readback_failure_isolates_job(vortex_scene, monkeypatch):
    """A launch that dispatches fine but whose READBACK poisons (async
    dispatch surfaces device crashes at download — the failure mode the
    pipelined completer must isolate) fails that job, counts toward
    healthz, and the service keeps serving."""
    from gamer_tpu.engine import pallas_render

    class PoisonFrame:
        def __array__(self, *a, **k):
            raise RuntimeError("readback poisoned")

    def poisoned(scene, mesh=None, device_out=False):
        assert device_out, "fused single path must dispatch device-out"
        return PoisonFrame()

    svc = RenderService(autostart=False)
    try:
        monkeypatch.setattr(pallas_render, "render_scene_pallas", poisoned)
        svc.start()
        job = svc.wait(svc.submit(vortex_scene))
        assert job.state == FAILED
        assert "readback poisoned" in job.error
        assert svc.healthy()  # one failure is not yet a poisoned runtime
        assert svc.consecutive_failures == 1
        monkeypatch.undo()
        job2 = svc.wait(svc.submit(vortex_scene))
        assert job2.state == DONE
        assert svc.healthy()  # success resets the streak
    finally:
        svc.stop()


def test_pipeline_mixed_size_stress(vortex_scene):
    """Interleaved incompatible sizes under the pipelined worker: every
    job finishes with the right-shaped frame, none lost or cross-wired
    between the worker and the completer."""
    import dataclasses

    other = dataclasses.replace(
        vortex_scene,
        config=dataclasses.replace(vortex_scene.config, size=24))
    svc = RenderService(autostart=False)
    try:
        jids = []
        for k in range(10):
            jids.append(svc.submit(vortex_scene if k % 2 == 0 else other))
        svc.start()
        jobs = [svc.wait(j) for j in jids]
        assert all(j.state == DONE for j in jobs)
        for k, j in enumerate(jobs):
            want = 16 if k % 2 == 0 else 24
            assert j.image.shape == (want, want, 3), (k, j.image.shape)
            assert int(j.image.sum()) > 0
        assert svc.metrics["frames_rendered"] == 10
    finally:
        svc.stop()


def test_pipeline_off_is_synchronous(vortex_scene):
    """pipeline=False: no completer thread; the worker finishes jobs
    inline (the pre-pipeline behavior, kept reachable)."""
    svc = RenderService(autostart=False, pipeline=False)
    try:
        svc.start()
        assert svc._completer is None
        job = svc.wait(svc.submit(vortex_scene))
        assert job.state == DONE and int(job.image.sum()) > 0
    finally:
        svc.stop()


def test_service_over_device_mesh(vortex_scene):
    """RenderService(mesh=...) serves through the multi-chip paths: single
    jobs row-shard the frame, batches pad to a multiple of the mesh."""
    import dataclasses

    from gamer_tpu.parallel import make_pixel_mesh

    svc = RenderService(autostart=False, mesh=make_pixel_mesh())
    try:
        # batch: 3 compatible requests pad to the 8-device bucket
        cams = orbit_path(vortex_scene.camera, 3, horizontal_deg=60.0)
        jids = [svc.submit(dataclasses.replace(vortex_scene, camera=c))
                for c in cams]
        svc.start()
        jobs = [svc.wait(j) for j in jids]
        assert all(j.state == DONE for j in jobs), [j.error for j in jobs]
        assert all(j.batched for j in jobs)
        assert svc.metrics["padded_frames"] == 5  # bucket 8, 3 live
        assert jobs[0].image.shape == (16, 16, 3)
        # single job: the frame's rows sharded across the mesh
        js = svc.submit(vortex_scene)
        job = svc.wait(js)
        assert job.state == DONE, job.error
        assert int(job.image.sum()) > 0
    finally:
        svc.stop()


def test_flythrough_job(vortex_scene):
    """An orbit fly-through served as one batched launch; frames match the
    direct render_flythrough call and the GIF encoder round-trips."""
    from gamer_tpu.engine.batch import render_flythrough
    from gamer_tpu.scene.cameracontrols import orbit_path
    from gamer_tpu.serve import _gif

    svc = RenderService()
    try:
        jid = svc.submit_flythrough(vortex_scene, 4, orbit_deg=120.0)
        job = svc.wait(jid)
        assert job.state == DONE, job.error
        assert job.frames.shape == (4, 16, 16, 3)
        assert job.n_frames == 4
        direct = render_flythrough(
            vortex_scene, orbit_path(vortex_scene.camera, 4, 120.0))
        np.testing.assert_array_equal(job.frames, direct)
        assert svc.metrics["frames_rendered"] == 4
        gif = _gif(job.frames)
        assert gif[:6] in (b"GIF87a", b"GIF89a")
        with pytest.raises(ValueError, match="frames"):
            svc.submit_flythrough(vortex_scene, 0)
    finally:
        svc.stop()


def test_morph_job(vortex_scene):
    """A parameter-space morph served as one batched launch; incompatible
    structures are rejected at submission."""
    import copy

    from gamer_tpu.engine.batch import render_batch
    from gamer_tpu.scene.morph import morph_scenes

    target = copy.deepcopy(vortex_scene.instances[0].galaxy)
    for c in target.components:
        c.strength *= 1.6
    svc = RenderService()
    try:
        jid = svc.submit_morph(vortex_scene, target, 3)
        job = svc.wait(jid)
        assert job.state == DONE, job.error
        assert job.frames.shape == (3, 16, 16, 3)
        assert svc.metrics["padded_frames"] == 1  # bucket 4, 3 live frames
        scenes = morph_scenes(vortex_scene, target, 3)
        direct = render_batch(scenes + [scenes[-1]])[:3]
        np.testing.assert_array_equal(job.frames, direct)
        # endpoints differ, so the animation actually morphs
        assert not np.array_equal(job.frames[0], job.frames[-1])

        bad = copy.deepcopy(target)
        bad.components = bad.components[:1]
        with pytest.raises(ValueError, match="morph-compatible"):
            svc.submit_morph(vortex_scene, bad, 3)
    finally:
        svc.stop()


def test_fit_job(vortex_scene):
    """Inverse rendering as a service: the fitted scene descends the loss
    and round-trips through the result dict."""
    import copy

    from gamer_tpu.engine.render import render_scene
    from gamer_tpu.scene.schema import scene_from_dict

    target_img = render_scene(vortex_scene)
    start = copy.deepcopy(vortex_scene)
    start.instances[0].galaxy.components[0].strength *= 0.5

    svc = RenderService()
    try:
        jid = svc.submit_fit(start, target_img, ("strength",), steps=3,
                             lr=5e-2)
        job = svc.wait(jid, timeout=900)
        assert job.state == DONE, job.error
        res = job.fit_result
        assert res["fit_fields"] == ["strength"]
        assert len(res["losses"]) == 4  # 3 steps + final evaluation
        assert res["losses"][-1] < res["losses"][0]
        assert scene_from_dict(res["scene"]).config.size == 16
        assert job.image.shape == (16, 16, 3)  # render of the fitted scene
        with pytest.raises(ValueError, match="unknown fit fields"):
            svc.submit_fit(start, target_img, ("orientation",), steps=1)
        with pytest.raises(ValueError, match="target image"):
            svc.submit_fit(start, np.zeros((8, 8, 3), np.uint8), steps=1)
        # march plumbing: frozen runs end-to-end; bad requests 400 at
        # submission, before any worker time is spent
        jid = svc.submit_fit(start, target_img, ("strength",), steps=2,
                             lr=5e-2, march="frozen")
        job = svc.wait(jid, timeout=900)
        assert job.state == DONE, job.error
        assert job.fit_result["losses"][-1] < job.fit_result["losses"][0]
        with pytest.raises(ValueError, match="march"):
            svc.submit_fit(start, target_img, ("strength",), steps=1,
                           march="warp")
        with pytest.raises(ValueError, match="frozen"):
            svc.submit_fit(start, target_img, ("scale",), steps=1,
                           march="frozen")
        with pytest.raises(ValueError, match="frozen"):
            svc.submit_fit(start, target_img, ("camera",), steps=1,
                           pose=True, march="frozen")
    finally:
        svc.stop()


def test_fit_joint_job(vortex_scene):
    """pose="joint" fits camera AND parameters in one service job; bad
    joint requests 400 at submission."""
    import copy

    from gamer_tpu.engine.render import render_scene

    target_img = render_scene(vortex_scene)
    start = copy.deepcopy(vortex_scene)
    start.camera = gamer_tpu.CameraParams(camera=(0.52, 0.01, 0.0),
                                          target=(0, 0, 0), up=(0, 1, 0),
                                          fov=90.0)
    start.instances[0].galaxy.components[0].strength *= 0.6

    svc = RenderService()
    try:
        jid = svc.submit_fit(start, target_img, ("strength",), steps=2,
                             lr=5e-2, pose="joint", march="frozen",
                             rounds=1, pose_steps=1)
        job = svc.wait(jid, timeout=900)
        assert job.state == DONE, job.error
        res = job.fit_result
        assert res["fit_fields"] == ["camera", "strength"]
        assert "pose" in res and "camera" in res["pose"]
        assert len(res["losses"]) > 0
        assert job.image.shape == (16, 16, 3)
        # submission-time validation (400 before worker time)
        with pytest.raises(ValueError, match="multiscale"):
            svc.submit_fit(start, target_img, ("strength",), steps=1,
                           pose="joint", multiscale=True)
        with pytest.raises(ValueError, match="rounds"):
            svc.submit_fit(start, target_img, ("strength",), steps=1,
                           pose="joint", rounds=0)
        with pytest.raises(ValueError, match="pose"):
            svc.submit_fit(start, target_img, ("strength",), steps=1,
                           pose="maybe")
        with pytest.raises(ValueError, match="unknown fit fields"):
            svc.submit_fit(start, target_img, ("camera",), steps=1,
                           pose="joint")
        with pytest.raises(ValueError, match="frozen"):
            svc.submit_fit(start, target_img, ("scale",), steps=1,
                           pose="joint", march="frozen")
    finally:
        svc.stop()


def test_queue_backpressure(vortex_scene):
    from gamer_tpu.serve import QueueFull

    svc = RenderService(autostart=False, max_queue=2)
    try:
        svc.submit(vortex_scene)
        svc.submit(vortex_scene)
        with pytest.raises(QueueFull, match="queue is full"):
            svc.submit(vortex_scene)
        assert svc.metrics["jobs_rejected"] == 1
        assert svc.metrics["jobs_submitted"] == 2
    finally:
        svc.stop()


def test_submit_rejects_invalid_payload():
    svc = RenderService(autostart=False)
    try:
        with pytest.raises(Exception):
            svc.submit({"instances": ["not a galaxy"]})
        with pytest.raises(ValueError):
            svc.submit(42)
        assert svc.metrics["jobs_submitted"] == 0
    finally:
        svc.stop()


def test_finished_job_eviction(vortex_scene):
    """Bounded retention: a long-running service evicts the oldest finished
    job (and its frame buffers) beyond max_finished."""
    svc = RenderService(max_finished=2)
    try:
        jids = []
        for _ in range(3):  # sequential: wait each out so none batch
            jid = svc.submit(vortex_scene)
            assert svc.wait(jid).state == DONE
            jids.append(jid)
        assert jids[0] not in svc.jobs
        assert jids[1] in svc.jobs and jids[2] in svc.jobs
        assert svc.metrics["jobs_evicted"] == 1
    finally:
        svc.stop()


def test_metrics_text_format(vortex_scene):
    svc = RenderService()
    try:
        svc.wait(svc.submit(vortex_scene))
        text = svc.metrics_text()
        assert "gamer_frames_rendered 1" in text
        assert "# TYPE gamer_queue_depth gauge" in text
        assert "gamer_uptime_seconds" in text
        # request-latency histogram: one DONE render recorded, cumulative
        # buckets monotone, +Inf equals the count
        assert "# TYPE gamer_request_seconds histogram" in text
        assert "gamer_request_seconds_count 1" in text
        import re

        cums = [int(v) for v in re.findall(
            r'gamer_request_seconds_bucket\{le="[^"]+"\} (\d+)', text)]
        assert cums == sorted(cums) and cums[-1] == 1
        s = float(re.search(r"gamer_request_seconds_sum ([\d.e+-]+)",
                            text).group(1))
        assert s > 0
    finally:
        svc.stop()


def test_cli_serve_args(monkeypatch):
    """`gamer-tpu serve [port] [window] [bands] [mesh] [maxbatch=N]` arg
    plumbing."""
    import gamer_tpu.cli as cli
    import gamer_tpu.parallel
    import gamer_tpu.serve

    calls = {}
    monkeypatch.setattr(
        gamer_tpu.serve, "serve",
        lambda port, w, b, mesh=None, on_start=None, max_batch=None:
        calls.update(port=port, w=w, b=b, mesh=mesh, on_start=on_start,
                     max_batch=max_batch))
    assert cli.cmd_serve(["serve", "9000", "0.1", "4"]) == 0
    assert calls == dict(port=9000, w=0.1, b=4, mesh=None, on_start=None,
                         max_batch=None)
    class FakeMesh:
        devices = np.zeros(8)

    fake = FakeMesh()
    monkeypatch.setattr(gamer_tpu.parallel, "make_pixel_mesh", lambda: fake)
    calls.clear()
    assert cli.cmd_serve(["serve", "9000", "0.1", "4", "mesh"]) == 0
    assert calls["mesh"] is fake
    calls.clear()
    assert cli.cmd_serve(["serve", "9000", "maxbatch=4"]) == 0
    assert calls["max_batch"] == 4
    calls.clear()
    assert cli.cmd_serve(["serve"]) == 0
    assert calls == dict(port=8100, w=0.05, b=8, mesh=None, on_start=None,
                         max_batch=None)


def test_cli_serve_warm(monkeypatch, fixtures_dir):
    """warm=FILE.gax:SIZES submits a startup warm job for that galaxy at the
    listed sizes (order-insensitive with the 'mesh' token)."""
    import gamer_tpu.cli as cli
    import gamer_tpu.serve

    calls = {}
    monkeypatch.setattr(
        gamer_tpu.serve, "serve",
        lambda port, w, b, mesh=None, on_start=None, max_batch=None:
        calls.update(port=port, on_start=on_start))
    gaxfile = str(fixtures_dir / "VortexCloud.gax")
    assert cli.cmd_serve(["serve", "9000", f"warm={gaxfile}:16,32"]) == 0
    assert calls["port"] == 9000 and calls["on_start"] is not None

    submitted = {}

    class FakeService:
        def submit_warm(self, scene, sizes=None, **kw):
            submitted.update(size=scene.config.size, sizes=sizes)
            return 1

    calls["on_start"](FakeService())
    assert submitted == dict(size=16, sizes=[16, 32])


def test_warm_job(vortex_scene):
    """submit_warm compiles-and-executes every launch shape the service
    would use (single path + each pad bucket, per size) and reports the
    per-shape seconds; real requests afterwards hit warm executables."""
    svc = RenderService()
    try:
        jid = svc.submit_warm(vortex_scene, buckets=(1, 2), sizes=[16])
        job = svc.wait(jid)
        assert job.state == DONE, job.error
        timings = job.fit_result["warmed"]
        assert sorted(timings) == ["16px/batch1", "16px/batch2",
                                   "16px/single"]
        assert all(t >= 0 for t in timings.values())
        assert svc.metrics["warmed_executables"] == 3
        # a real request after warming renders normally
        rid = svc.submit(vortex_scene)
        rjob = svc.wait(rid)
        assert rjob.state == DONE and int(rjob.image.sum()) > 0
        # invalid warm specs fail at submission, not on the worker
        with pytest.raises(ValueError):
            svc.submit_warm(vortex_scene, buckets=())
        with pytest.raises(ValueError):
            svc.submit_warm(vortex_scene, buckets=(0,))
    finally:
        svc.stop()


def test_warm_http_endpoint(vortex_scene):
    """POST /warm pre-warms over HTTP; the result lists seconds per shape."""
    httpd = serve(port=0, poll=False)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        payload = json.dumps({"scene": scene_to_dict(vortex_scene),
                              "buckets": [1, 2]}).encode()
        req = urllib.request.Request(base + "/warm", data=payload,
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.status == 202
            jid = json.loads(r.read())["job"]
        deadline = time.time() + 120
        while time.time() < deadline:
            with urllib.request.urlopen(f"{base}/job/{jid}") as r:
                state = json.loads(r.read())["state"]
            if state not in ("queued", "running"):
                break
            time.sleep(0.02)
        assert state == "done"
        with urllib.request.urlopen(f"{base}/job/{jid}/result.json") as r:
            warmed = json.loads(r.read())["warmed"]
        assert "16px/single" in warmed and "16px/batch2" in warmed
    finally:
        httpd.shutdown()
        httpd.service.stop()


def test_http_surface(vortex_scene):
    httpd = serve(port=0, poll=False)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"

    def get(path, expect=200):
        try:
            with urllib.request.urlopen(base + path) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            assert e.code == expect, (e.code, e.read())
            return e.code, e.read()

    try:
        status, body = get("/healthz")
        assert status == 200 and json.loads(body)["ok"]

        payload = json.dumps(scene_to_dict(vortex_scene)).encode()
        req = urllib.request.Request(base + "/render", data=payload,
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.status == 202
            jid = json.loads(r.read())["job"]

        # long-poll: one blocked GET replaces the client polling loop
        # (?wait= caps at 60 s server-side, so loop for slow first compiles)
        deadline = time.time() + 300
        state = None
        while time.time() < deadline:
            _, body = get(f"/job/{jid}?wait=30")
            state = json.loads(body)["state"]
            if state not in ("queued", "running"):
                break
        assert state == "done"
        assert httpd.service.metrics["long_polls"] >= 1

        status, png = get(f"/job/{jid}/image.png")
        assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"

        _, body = get("/jobs")
        assert json.loads(body)["jobs"][0]["job"] == jid

        _, body = get("/metrics")
        assert b"gamer_frames_rendered 1" in body

        # bad submissions / lookups
        req = urllib.request.Request(base + "/render", data=b"not json",
                                     method="POST")
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        get("/job/999", expect=404)
        get("/nope", expect=404)

        req = urllib.request.Request(base + "/job/999", method="DELETE")
        try:
            urllib.request.urlopen(req)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
        httpd.service.stop()


@pytest.mark.slow
def test_fit_does_not_block_quick_jobs(vortex_scene):
    """Worker fairness (VERDICT r2 #3): a long fit queued FIRST must not
    head-of-line block a quick render queued second — the interactive lane
    drains it between optimizer steps and /metrics counts the preemption."""
    import copy

    from gamer_tpu.engine.pallas_render import render_scene_pallas
    from gamer_tpu.engine.render import render_scene

    target_img = render_scene(vortex_scene)
    start = copy.deepcopy(vortex_scene)
    start.instances[0].galaxy.components[0].strength *= 0.5

    svc = RenderService()
    try:
        fit_id = svc.submit_fit(start, target_img, ("strength",), steps=60,
                                lr=1e-3)
        fit_job = svc.jobs[fit_id]
        deadline = time.time() + 600
        while fit_job.state == "queued" and time.time() < deadline:
            time.sleep(0.01)
        assert fit_job.state == "running"
        render_id = svc.submit(vortex_scene)
        render_job = svc.wait(render_id, timeout=600)
        assert render_job.state == DONE, render_job.error
        # the fit is still going: the render did NOT wait for all 60 steps
        assert fit_job.state == "running"
        assert svc.metrics["worker_preemptions"] >= 1
        direct = render_scene_pallas(vortex_scene)
        d = np.abs(render_job.image.astype(np.int16) - direct.astype(np.int16))
        assert d.max() <= 1
        svc.abort(fit_id)
        fit_job = svc.wait(fit_id, timeout=600)
        assert fit_job.state in (DONE, ABORTED)
    finally:
        svc.stop()


def test_fit_job_abort_returns_best_so_far(vortex_scene):
    """DELETE /job on a RUNNING fit stops it after the current optimizer
    step — the worker is not monopolized for the full step budget, and the
    best-so-far fit is kept (partial-frame-on-abort semantics)."""
    import copy

    from gamer_tpu.engine.render import render_scene

    target_img = render_scene(vortex_scene)
    start = copy.deepcopy(vortex_scene)
    start.instances[0].galaxy.components[0].strength *= 0.5

    svc = RenderService()
    try:
        jid = svc.submit_fit(start, target_img, ("strength",),
                             steps=10_000, lr=5e-2)
        job = svc.jobs[jid]
        deadline = time.time() + 900
        while job.progress == 0.0 and time.time() < deadline:
            time.sleep(0.005)
        assert job.progress > 0.0  # the fit is genuinely running
        assert svc.abort(jid)
        job = svc.wait(jid, timeout=900)
        assert job.state == ABORTED
        assert job.fit_result is not None       # best-so-far fit kept
        assert job.image is not None            # render of that fit
        assert len(job.fit_result["losses"]) < 10_000  # it really stopped
    finally:
        svc.stop()


def test_fit_mesh_falls_back_when_rows_dont_tile(vortex_scene):
    """_run_fit row-shards over the service mesh only when every rung's
    pixel rows tile it; otherwise it falls back to single-device instead
    of failing the job."""
    from gamer_tpu.parallel import make_pixel_mesh

    svc = RenderService(autostart=False, mesh=make_pixel_mesh())  # 8 dev
    try:
        # 16 rows % 8 == 0: the direct fit can use the mesh
        assert svc._fit_mesh(vortex_scene, multiscale=False) is svc.mesh
        # multiscale's coarsest rung renders 16//4 = 4 rows < 8 devices
        assert svc._fit_mesh(vortex_scene, multiscale=True) is None
    finally:
        svc.stop()


def test_fit_job_accepts_supersampled_scene(vortex_scene):
    """A supersampled scene is fittable as a service: the diff forward
    pools ss² rays/pixel in linear space, so the fit of an AA scene
    against its own AA render starts at the quantization floor."""
    import copy
    import dataclasses

    from gamer_tpu.engine.render import render_scene

    scene = copy.deepcopy(vortex_scene)
    scene = dataclasses.replace(
        scene, config=dataclasses.replace(scene.config, supersample=2))
    target_img = render_scene(scene)

    svc = RenderService()
    try:
        jid = svc.submit_fit(scene, target_img, ("strength",), steps=1)
        job = svc.wait(jid, timeout=900)
        assert job.state == DONE
        assert job.fit_result["scene"]["config"]["supersample"] == 2
        assert job.fit_result["losses"][0] < 1e-5
    finally:
        svc.stop()


def test_fit_job_pose(vortex_scene):
    """'pose': true fits the camera instead of galaxy parameters; the
    result carries the fitted pose explicitly and in scene.camera."""
    import copy
    import dataclasses

    from gamer_tpu.engine.render import render_scene

    # pose fits need a noise LOD (see fit_pose docstring); target at truth
    scene = dataclasses.replace(
        vortex_scene,
        config=dataclasses.replace(vortex_scene.config, noise_octaves=3))
    target_img = render_scene(scene)
    start = copy.deepcopy(scene)
    start.camera.camera = (0.52, 0.01, 0.0)

    svc = RenderService()
    try:
        jid = svc.submit_fit(start, target_img, steps=2, pose=True)
        job = svc.wait(jid, timeout=900)
        assert job.state == DONE
        assert job.fit_result["fit_fields"] == ["camera"]  # pose default
        pose = job.fit_result["pose"]
        assert len(pose["camera"]) == 3 and isinstance(pose["fov"], float)
        np.testing.assert_allclose(
            pose["camera"], job.fit_result["scene"]["camera"]["camera"],
            rtol=1e-6)
        assert job.image is not None
    finally:
        svc.stop()


def test_fit_job_pose_fd(vortex_scene):
    """'pose': 'fd' fits the camera by finite differences through the
    production batch kernel — full quality, no LOD cap on the scene."""
    import copy

    from gamer_tpu.engine.render import render_scene

    target_img = render_scene(vortex_scene)  # exact octaves
    start = copy.deepcopy(vortex_scene)
    start.camera.camera = (0.52, 0.01, 0.0)

    svc = RenderService()
    try:
        jid = svc.submit_fit(start, target_img, steps=2, pose="fd")
        job = svc.wait(jid, timeout=900)
        assert job.state == DONE, job.error
        assert job.fit_result["fit_fields"] == ["camera"]
        pose = job.fit_result["pose"]
        assert len(pose["camera"]) == 3 and isinstance(pose["fov"], float)
        assert len(job.fit_result["losses"]) == 3  # 2 steps + final eval
        # submission-time validation (400 before worker time)
        with pytest.raises(ValueError, match="multiscale"):
            svc.submit_fit(start, target_img, steps=1, pose="fd",
                           multiscale=True)
        with pytest.raises(ValueError, match="pose_method"):
            svc.submit_fit(start, target_img, ("strength",), steps=1,
                           pose="joint", pose_method="ladder")
    finally:
        svc.stop()


def test_fit_job_pose_rejects_galaxy_fields(vortex_scene):
    svc = RenderService(autostart=False)
    try:
        tgt = np.zeros((16, 16, 3), np.uint8)
        with pytest.raises(ValueError, match="pose fit fields"):
            svc.submit_fit(vortex_scene, tgt, ("strength",), pose=True)
        with pytest.raises(ValueError, match="fit fields"):
            svc.submit_fit(vortex_scene, tgt, ("camera",), pose=False)
    finally:
        svc.stop()


def test_fit_mesh_pose_divisors(vortex_scene):
    """Pose-fit mesh eligibility checks the POSE schedule's loss pools
    (full-size renders, pooled rows must tile the mesh)."""
    from gamer_tpu.parallel import make_pixel_mesh

    svc = RenderService(autostart=False, mesh=make_pixel_mesh())  # 8 dev
    try:
        # direct pose fit: 16 rows % 8 == 0 -> mesh usable
        assert svc._fit_mesh(vortex_scene, False, pose=True) is svc.mesh
        # multiscale pose: coarsest rung pools 4 -> 4 rows < 8 devices
        assert svc._fit_mesh(vortex_scene, True, pose=True) is None
    finally:
        svc.stop()


def test_fit_job_multiview(vortex_scene):
    """'views' fits one galaxy against K posed views in one job."""
    import copy
    import dataclasses

    from gamer_tpu.engine.render import render_scene
    from gamer_tpu.scene.cameracontrols import orbit_path

    cams = orbit_path(vortex_scene.camera, 2, 45.0)
    views = []
    for c in cams:
        img = render_scene(dataclasses.replace(vortex_scene, camera=c))
        views.append({"camera": list(c.camera), "target": list(c.target),
                      "up": list(c.up), "fov": c.fov, "target_png": img})
    start = copy.deepcopy(vortex_scene)
    start.instances[0].galaxy.components[0].strength *= 0.5

    svc = RenderService()
    try:
        jid = svc.submit_fit_multiview(start, views, ("strength",), steps=3)
        job = svc.wait(jid, timeout=900)
        assert job.state == DONE
        losses = job.fit_result["losses"]
        assert losses[-1] < losses[0]
        assert job.image is not None
        # validation: wrong-size view target fails at submission
        bad = dict(views[0], target_png=np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(ValueError, match="view 0"):
            svc.submit_fit_multiview(start, [bad], steps=1)
        with pytest.raises(ValueError, match="non-empty"):
            svc.submit_fit_multiview(start, [], steps=1)
    finally:
        svc.stop()


@pytest.mark.slow
def test_fit_job_multiview_joint(vortex_scene):
    """'views' + pose='joint': the per-view cameras are initial guesses,
    refined per view (fit_joint_multiview); the result carries the K
    fitted poses."""
    import copy
    import dataclasses

    from gamer_tpu.engine.render import render_scene
    from gamer_tpu.scene.cameracontrols import orbit_path

    cams = orbit_path(vortex_scene.camera, 2, 45.0)
    views = []
    for c in cams:
        img = render_scene(dataclasses.replace(vortex_scene, camera=c))
        views.append({"camera": [c.camera[0] + 0.01, c.camera[1],
                                 c.camera[2]],
                      "target": list(c.target), "up": list(c.up),
                      "fov": c.fov, "target_png": img})
    start = copy.deepcopy(vortex_scene)
    start.instances[0].galaxy.components[0].strength *= 0.7

    svc = RenderService()
    try:
        jid = svc.submit_fit_multiview(start, views, ("strength",),
                                       steps=2, march="frozen",
                                       pose="joint", rounds=1, pose_steps=2)
        job = svc.wait(jid, timeout=900)
        assert job.state == DONE, job.error
        poses = job.fit_result["poses"]
        assert len(poses) == 2
        # the pose blocks moved the guesses off their starting points
        assert tuple(poses[0]["camera"]) != tuple(views[0]["camera"])
        with pytest.raises(ValueError, match="pose"):
            svc.submit_fit_multiview(start, views, steps=1, pose="fd")
    finally:
        svc.stop()
