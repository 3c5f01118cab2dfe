"""Production render service: an HTTP JSON API over the render engines.

The reference's serving surfaces are in-process only: the GUI render queue
(a FIFO polled on a Qt timer, renderqueue.cpp:63-127) and the console
progress ticker (consolerenderer.cpp:80-93). This module lifts that
contract to a network service shaped for how a TPU actually serves:

  * one worker thread owns ALL device dispatch (a TPU executes one program
    at a time — concurrency belongs in the batch axis, not in threads);
  * concurrent client requests that share a compiled structure are drained
    into ONE batched launch (engine/batch.render_batch) — B requests cost
    one dispatch, the TPU-native replacement for the reference's
    thread-per-image fan-out (rasterthread.cpp);
  * batch shapes are padded to power-of-two buckets so a busy service
    compiles a handful of executables, not one per observed batch size
    (tunneled TPU compiles run 20 s-7 min; the padded tail rows render
    duplicate frames that are simply dropped);
  * single jobs render progressively in row bands with percent-done and
    cooperative abort between bands (rasterizer.cpp:283-313 semantics);
    an aborted job keeps its partially filled frame, like the reference's
    aborted back buffer;
  * a render failure (poisoned tunnel worker, bad parameters) fails THAT
    job and the worker lives on — jobs are isolated the way bench.py
    isolates risky device work.

The JSON scene payload is the scene-dict API (scene.schema.scene_from_dict),
so everything the CLI and library can render is servable. Endpoints:

  POST   /render            scene dict (or {"scene": {...}}) -> {"job": id}
                            with "preview": true|octaves, the job first
                            publishes a fast LOD frame (poll
                            /job/<id>?wait=s&until=preview), then replaces
                            it with the exact frame (preview-then-refine —
                            the reference's preview→full contract,
                            mainwindow.cpp:483-495, as a service)
  POST   /flythrough        {"scene": {...}, "frames": N, "orbit_deg": D}
                            -> orbit animation, ONE batched launch
  POST   /morph             {"scene": {...}, "target_galaxy": {...},
                            "frames": N, "ease": "smoothstep"|"linear"}
                            -> parameter-space morph animation
  POST   /fit               {"scene": {...}, "target_png": base64,
                            "fields": [...], "steps": N, "lr": x,
                            "multiscale": bool,
                            "pose": bool|"fd"|"joint", "rounds": N,
                            "pose_method": "multiscale"|"fd",
                            "march": "tensor"|"scan"|"frozen"} -> inverse
                            rendering: gradient-fit the galaxy (or, with
                            "pose": true, the camera; "pose": "fd", the
                            camera by finite differences through the
                            production kernel; with "pose": "joint",
                            BOTH — "rounds" alternations of a pose block
                            ("pose_method") and a parameter block) to the
                            target image.
                            "frozen" precomputes the noise fields once per
                            fit (fastest steps; fixed-camera fits whose
                            fields don't feed the noise — 400 otherwise).
                            With "views": [{"camera": [...], "target_png":
                            base64, ...}, ...] instead of "target_png",
                            fit ONE galaxy against K posed views at once
                            (fit_scene_multiview); "views" + "pose":
                            "joint" treats the view poses as initial
                            guesses and refines them per view
                            (fit_joint_multiview — the result carries
                            "poses", the K fitted cameras)
  GET    /job/<id>/result.json     fitted scene dict + loss trace
  GET    /job/<id>          state/progress/timing
  GET    /job/<id>/image.png       finished (or abort-partial) frame
  GET    /job/<id>/animation.gif   fly-through result
  DELETE /job/<id>          abort (between bands; queued jobs cancel)
  GET    /jobs              all jobs, newest first
  GET    /metrics           Prometheus text format
  GET    /healthz           liveness + backend platform
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
import urllib.parse
from collections import deque
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

QUEUED, RUNNING, DONE, FAILED, ABORTED = (
    "queued", "running", "done", "failed", "aborted")


class QueueFull(RuntimeError):
    """Submission rejected by backpressure (RenderService max_queue)."""


@dataclass
class Job:
    id: int
    scene: object  # Scene
    key: tuple     # batching compatibility key (structure, size, ss)
    state: str = QUEUED
    progress: float = 0.0
    batched: bool = False
    error: Optional[str] = None
    image: Optional[np.ndarray] = None  # uint8 (size, size, 3); partial if aborted
    frames: Optional[np.ndarray] = None  # uint8 (B, size, size, 3) animation
    anim_scenes: Optional[list] = None  # per-frame Scenes (fly-through/morph)
    n_frames: int = 0    # >0 marks an animation job
    fit_spec: Optional[dict] = None     # inverse-rendering job parameters
    fit_result: Optional[dict] = None   # fitted scene dict + loss trace
    warm_spec: Optional[dict] = None    # executable pre-warm parameters
    preview_lod: Optional[int] = None   # preview-then-refine: LOD octaves
    preview_ready: bool = False         # the fast LOD frame is in .image
    submitted: float = field(default_factory=time.time)
    started: Optional[float] = None
    finished: Optional[float] = None
    abort: threading.Event = field(default_factory=threading.Event)

    def info(self) -> dict:
        end = self.finished or time.time()
        return {
            "job": self.id, "state": self.state,
            "progress": round(self.progress, 4), "batched": self.batched,
            "error": self.error, "size": self.scene.config.size,
            "frames": self.n_frames or None,
            "preview_ready": self.preview_ready or None,
            "elapsed_s": round(end - (self.started or end), 4),
            "queued_s": round((self.started or end) - self.submitted, 4),
        }


def _bucket(n: int, multiple_of: int = 1) -> int:
    """Smallest (power-of-two x multiple_of) >= n: few distinct shapes (so
    compiled executables are reused) that always tile a ``multiple_of``-way
    mesh — including non-power-of-two meshes (e.g. 24 devices)."""
    units = -(-n // multiple_of)
    b = 1
    while b < units:
        b *= 2
    return b * multiple_of


class RenderService:
    """Job queue + device worker. Usable directly (no HTTP) and as the
    state behind ``serve()``.

    batch_window_s: after picking up a job, wait this long for compatible
    requests to arrive before launching (0 = batch only what is already
    queued). bands: progress granularity for single jobs. max_queue:
    backpressure — submissions beyond this many queued jobs raise
    QueueFull (HTTP 429) instead of growing the queue without bound.
    max_finished: finished jobs retained for retrieval; beyond that the
    oldest finished job (and its frame buffers) is evicted — a long-running
    service must not grow ~MB per served frame forever.
    single_fuse_below: single-frame jobs smaller than this render as ONE
    fused launch instead of `bands` progressive dispatches — below ~512^2
    the frame takes a fraction of a second and each extra dispatch costs a
    full host<->device round trip, so banding multiplied small-frame
    latency for progress nobody can see (measured: the serving p50 at
    256^2 was dominated by it, BASELINE.md). Larger frames keep the banded
    path (partial frames + mid-frame abort). 0 disables fusing.
    max_batch: latency/throughput dial — cap on how many compatible
    requests merge into one device launch (None = unlimited). Per-request
    latency is quantized to the launch the request lands in, so at N
    concurrent clients the uncapped service batches all N and every
    request pays the full bucket-N device time (BASELINE.md: p50 567 ms at
    8 clients / 256^2, bucket-8 launch ~0.45 s). Capping at N/2 splits the
    wave into two cheaper launches — the first wave's requests return in
    roughly half the time — at the cost of some frames/launch batching
    efficiency. Excess compatible jobs stay queued in FIFO order and form
    the next launch immediately.
    pipeline: overlap the host readback+PNG-side finish of launch N with
    packing/dispatching launch N+1 (default on). JAX dispatch is async, so
    the worker hands the still-on-device frames to a completer thread and
    immediately drains the next batch; the device serializes the launches
    while the host download of the previous one rides alongside (the same
    one-launch-deep pipeline as the 16K band renderer, BASELINE.md). Only
    the two production hot paths hand off (batched launches + fused small
    singles); animations/fits/warm/progressive singles keep their internal
    progress semantics. ``render_seconds`` then counts worker-thread
    dispatch occupancy, not readback. Failure-isolation note: with the
    pipeline on, healthz/consecutive_failures lag ONE launch behind
    dispatch — the worker can dispatch launch N+1 into an already-poisoned
    runtime before the completer records launch N's readback failure, so
    the 3-failure 503 threshold can take one extra poisoned launch to trip
    (bounded by the maxsize=2 completion queue).
    """

    def __init__(self, batch_window_s: float = 0.0, bands: int = 8,
                 mesh=None, autostart: bool = True,
                 max_queue: Optional[int] = 256,
                 max_finished: Optional[int] = 512,
                 single_fuse_below: int = 512,
                 max_batch: Optional[int] = None,
                 pipeline: bool = True):
        self.batch_window_s = batch_window_s
        self.bands = bands
        self.single_fuse_below = single_fuse_below
        if max_batch is not None and max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self.max_batch = max_batch
        self.pipeline = pipeline
        # one-launch-deep readback pipeline: worker puts (jobs, finalize)
        # after dispatch; the completer thread downloads + finishes while
        # the worker packs the next launch. maxsize bounds how many
        # launches' device frames can be held pending download.
        self._completions: "queue.Queue" = queue.Queue(maxsize=2)
        self._completer: Optional[threading.Thread] = None
        self.mesh = mesh
        self.max_queue = max_queue
        self.max_finished = max_finished
        self._finished_order: deque[int] = deque()
        self.jobs: Dict[int, Job] = {}
        self._queue: deque[Job] = deque()
        self._cond = threading.Condition()
        self._next_id = 1
        self._stop = False
        self._worker: Optional[threading.Thread] = None
        self.metrics = {
            "jobs_submitted": 0, "frames_rendered": 0, "jobs_failed": 0,
            "jobs_aborted": 0, "batches": 0, "batched_frames": 0,
            "padded_frames": 0, "jobs_rejected": 0, "jobs_evicted": 0,
            "worker_preemptions": 0, "warmed_executables": 0,
            "singles_fused": 0, "long_polls": 0, "previews_rendered": 0,
            "render_seconds": 0.0, "started_at": time.time(),
        }
        self._preempting = False
        # request-latency histogram (submit -> done), Prometheus buckets;
        # only DONE render/animation jobs are recorded (fits/warms are
        # minutes-long worker jobs, not request latency)
        self._lat_le = (0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, 30.0)
        self._lat_buckets = [0] * (len(self._lat_le) + 1)  # +Inf last
        self._lat_sum = 0.0
        self._lat_count = 0
        # A TPU-runtime crash poisons the whole client process (tunneled
        # workers especially — see bench.py's subprocess isolation): after
        # enough consecutive render failures the service declares itself
        # unhealthy so an orchestrator restarts the process. Any success
        # resets the count.
        self.max_consecutive_failures = 3
        self.consecutive_failures = 0
        if autostart:
            self.start()

    # -- client surface ----------------------------------------------------

    def submit(self, scene, preview=None) -> int:
        """Queue a Scene (or scene dict) for rendering; returns the job id.

        Raises ValueError for payloads that cannot flatten to a compilable
        scene — invalid requests fail at submission, not on the worker.

        ``preview`` enables preview-then-refine (the reference's
        preview→full contract, mainwindow.cpp:483-495, as a service): the
        worker first renders a fast LOD frame (noise octaves capped at
        ``preview`` — ``True`` means 4 — with the preview min-step) and
        publishes it in ``job.image`` with ``preview_ready`` set, then
        renders the EXACT frame in the long-running lane (queued quick
        jobs are served first) and replaces the image. Poll
        ``GET /job/<id>?wait=s&until=preview`` (or ``wait(until=
        "preview")``) for the fast frame; the terminal image is bit-equal
        to a direct exact render.
        """
        from .engine.scene_prep import flatten_scene

        scene = self._coerce_scene(scene)
        static, _ = flatten_scene(scene)  # validates; also the batching key
        key = (static, scene.config.size, scene.config.supersample)
        lod = None
        if preview is not None and preview is not False and preview != 0:
            lod = 4 if preview is True else int(preview)
            if lod < 1:
                raise ValueError(f"preview octaves must be >= 1, got {lod}")
            # two-phase jobs never merge into request batches: a unique
            # key keeps _drain_compatible away (object() equality is
            # identity — the same construction as fit/warm/anim keys)
            key = ("preview", object())
        return self._enqueue(Job(id=0, scene=scene, key=key,
                                 preview_lod=lod))

    def _enqueue(self, job: Job) -> int:
        """Backpressure check + id allocation + FIFO append, under the lock."""
        with self._cond:
            if self.max_queue is not None and len(self._queue) >= self.max_queue:
                self.metrics["jobs_rejected"] += 1
                raise QueueFull(
                    f"queue is full ({self.max_queue} jobs); retry later")
            job.id = self._next_id
            self._next_id += 1
            self.jobs[job.id] = job
            self._queue.append(job)
            self.metrics["jobs_submitted"] += 1
            self._cond.notify()
        return job.id

    def _coerce_scene(self, scene):
        from .scene.schema import Scene, scene_from_dict

        if isinstance(scene, dict):
            scene = scene_from_dict(scene)
        if not isinstance(scene, Scene):
            raise ValueError(f"expected Scene or scene dict, got {type(scene)}")
        # all three noise_kind backends are accepted: the production Pallas
        # kernel renders simplex/perlin/iq natively (engine/pallas_render),
        # and fit jobs run through the XLA/diff engines, which thread the
        # backend via render._component_sample
        return scene

    def submit_warm(self, scene, buckets=(1, 2, 4, 8),
                    sizes: Optional[list] = None) -> int:
        """Queue an executable pre-warm: render ``scene`` once through the
        single-frame path and once per pad bucket through the batched path
        (at every requested size), so the first real client at this
        (structure, size, supersample) never pays a cold compile — the one
        p99 outlier in the measured serving numbers (BASELINE.md). Runs in
        the long-running lane: queued interactive jobs are served between
        executables, and with the persistent compile cache (``serve()``
        enables it) warmed executables survive process restarts.
        Returns the job id; /job/<id>/result.json lists seconds per shape.
        The reference has no analog (its slang kernel JITs per window,
        renderer.cpp warms implicitly on first paint)."""
        import dataclasses

        from .engine.scene_prep import flatten_scene

        scene = self._coerce_scene(scene)
        buckets = [int(b) for b in buckets]
        if not buckets or any(b < 1 or b > 1024 for b in buckets):
            raise ValueError(f"buckets must be in [1, 1024], got {buckets}")
        sizes = [int(s) for s in (sizes or [scene.config.size])]
        scenes = []
        for s in sizes:
            sc = dataclasses.replace(
                scene, config=dataclasses.replace(scene.config, size=s))
            flatten_scene(sc)  # validate every size at submission
            scenes.append(sc)
        return self._enqueue(Job(id=0, scene=scenes[0], key=("warm", object()),
                                 warm_spec={"buckets": buckets,
                                            "scenes": scenes}))

    def _enqueue_animation(self, scene, anim_scenes: list) -> int:
        from .engine.scene_prep import flatten_scene

        flatten_scene(anim_scenes[0])  # validate at submission
        # a unique key: an animation is already one batched launch and
        # never merges with other requests
        return self._enqueue(Job(id=0, scene=scene, key=("anim", object()),
                                 anim_scenes=anim_scenes,
                                 n_frames=len(anim_scenes)))

    def submit_flythrough(self, scene, n_frames: int,
                          orbit_deg: float = 360.0) -> int:
        """Queue an orbit fly-through: ``n_frames`` cameras around the
        scene, rendered as ONE batched kernel launch (engine/batch) —
        animation as a service. Returns the job id; the result is the
        (B, size, size, 3) frame stack (GIF over HTTP)."""
        import dataclasses

        from .scene.cameracontrols import orbit_path

        scene = self._coerce_scene(scene)
        n_frames = int(n_frames)
        if not 1 <= n_frames <= 1024:
            raise ValueError(f"frames must be in [1, 1024], got {n_frames}")
        cams = orbit_path(scene.camera, n_frames, float(orbit_deg))
        return self._enqueue_animation(
            scene, [dataclasses.replace(scene, camera=c) for c in cams])

    def submit_morph(self, scene, target_galaxy, n_frames: int,
                     ease: str = "smoothstep") -> int:
        """Queue a parameter-space morph of the scene's galaxy toward
        ``target_galaxy`` (a GalaxyData or galaxy dict): ``n_frames``
        interpolated scenes rendered as ONE batched launch. Structure
        incompatibility is rejected at submission (scene/morph.py)."""
        from .scene.morph import morph_scenes
        from .scene.schema import GalaxyData, galaxy_from_dict

        scene = self._coerce_scene(scene)
        if isinstance(target_galaxy, dict):
            target_galaxy = galaxy_from_dict(target_galaxy)
        if not isinstance(target_galaxy, GalaxyData):
            raise ValueError(
                f"expected GalaxyData or galaxy dict, got {type(target_galaxy)}")
        n_frames = int(n_frames)
        if not 2 <= n_frames <= 1024:
            raise ValueError(f"frames must be in [2, 1024], got {n_frames}")
        return self._enqueue_animation(
            scene, morph_scenes(scene, target_galaxy, n_frames, ease))

    def submit_fit(self, scene, target_image, fit_fields=None,
                   steps: int = 100, lr: float = 2e-2,
                   multiscale: bool = False, pose=False,
                   march: str = "tensor", rounds: int = 2,
                   pose_steps: int = 30,
                   pose_method: str = "multiscale") -> int:
        """Queue an inverse-rendering fit: optimize ``fit_fields`` of the
        scene's galaxy until its render matches ``target_image`` (a
        (size, size, 3) uint8 array, or base64-encoded PNG over HTTP) —
        training as a service, with per-step progress on the job. The
        result is the fitted scene dict + loss trace (GET
        /job/<id>/result.json) and a render of the fitted scene
        (/image.png).

        ``pose=True`` fits the camera (engine/fit.fit_pose) instead of
        galaxy parameters: fields are from POSE_FITTABLE (default
        ("camera",)), and ``multiscale`` runs the LOD->exact pose ladder
        (the recommended mode — single-LOD pose fits need a hand-picked
        noise LOD, see fit_pose's docstring).

        ``pose="joint"`` fits BOTH: camera AND the named galaxy fields
        (engine/fit.fit_joint — ``rounds`` alternations of a pose ladder
        and a parameter block; ``steps`` is the parameter steps per
        round). The joint mode runs its own LOD ladder, so it takes no
        ``multiscale``. ``pose="fd"`` fits the camera by finite
        differences through the production kernel (engine/fit.fit_pose_fd
        — full quality, no LOD ladder); for joint fits,
        ``pose_method="fd"`` uses the same for each pose block."""
        import base64
        import io as _io

        scene = self._coerce_scene(scene)
        if isinstance(target_image, str):
            from PIL import Image

            target_image = np.asarray(Image.open(
                _io.BytesIO(base64.b64decode(target_image))).convert("RGB"))
        target_image = np.asarray(target_image)
        size = scene.config.size
        if target_image.shape != (size, size, 3):
            raise ValueError(
                f"target image must be ({size}, {size}, 3) to match the "
                f"scene size, got {target_image.shape}")
        steps = int(steps)
        if not 1 <= steps <= 100_000:
            raise ValueError(f"steps must be in [1, 100000], got {steps}")
        from .engine.fit import FITTABLE_FIELDS, POSE_FITTABLE

        joint = pose == "joint"
        fd = pose == "fd"
        if pose_method not in ("multiscale", "fd"):
            raise ValueError(
                f"pose_method must be 'multiscale' or 'fd', "
                f"got {pose_method!r}")
        if joint:
            if multiscale:
                raise ValueError(
                    "joint fits run their own pose ladder; drop 'multiscale'")
            rounds = int(rounds)
            if not 1 <= rounds <= 20:
                raise ValueError(f"rounds must be in [1, 20], got {rounds}")
            pose_steps = int(pose_steps)
            if not 1 <= pose_steps <= 10_000:
                raise ValueError(
                    f"pose_steps must be in [1, 10000], got {pose_steps}")
        elif fd:
            if multiscale:
                raise ValueError(
                    "pose='fd' needs no LOD ladder; drop 'multiscale'")
        elif not isinstance(pose, bool):
            raise ValueError(
                f"pose must be true, false, 'fd' or 'joint', got {pose!r}")
        if fit_fields is None:
            fit_fields = (("camera",) if pose and not joint
                          else ("strength", "r0", "z0"))
        fit_fields = tuple(fit_fields)
        # joint fits the camera implicitly; its named fields are scene fields
        allowed = POSE_FITTABLE if (pose and not joint) else FITTABLE_FIELDS
        unknown = set(fit_fields) - set(allowed)
        if unknown:
            raise ValueError(
                f"unknown {'pose ' if pose and not joint else ''}fit fields "
                f"{sorted(unknown)}; valid: {sorted(allowed)}")
        from .engine.scene_prep import flatten_scene

        static, _ = flatten_scene(scene)  # validate at submission
        # (supersampled scenes are fittable: the diff forward pools ss²
        # rays/pixel in linear space, engine/fit._ss_setup)
        march = self._check_march(march, pose and not joint, static,
                                  fit_fields)
        spec = dict(target=target_image, fit_fields=fit_fields, steps=steps,
                    lr=float(lr), multiscale=bool(multiscale),
                    pose=("joint" if joint else "fd" if fd else bool(pose)),
                    march=march)
        if joint:
            spec["rounds"] = rounds
            spec["pose_steps"] = pose_steps
            spec["pose_method"] = pose_method
        return self._enqueue(Job(id=0, scene=scene, key=("fit", object()),
                                 fit_spec=spec))

    def _check_march(self, march, pose, static, fit_fields) -> str:
        """Validate a fit job's march backend at SUBMISSION time, so a bad
        request 400s instead of failing minutes later on the worker.
        engine/fit re-checks the same conditions at run time."""
        march = str(march)
        if march not in ("tensor", "scan", "frozen"):
            raise ValueError(
                f"unknown march backend {march!r}; use 'tensor', 'scan' "
                f"or 'frozen'")
        if march == "frozen":
            if pose:
                raise ValueError(
                    "march='frozen' cannot fit poses: moving the camera "
                    "moves every noise input; use march='tensor'")
            from .engine.tensor_march import check_frozen_fields

            check_frozen_fields(static, fit_fields)
        return march

    def submit_fit_multiview(self, scene, views, fit_fields=None,
                             steps: int = 100, lr: float = 2e-2,
                             march: str = "tensor", pose=False,
                             rounds: int = 2, pose_steps: int = 30) -> int:
        """Queue a multi-view fit (engine/fit.fit_scene_multiview): one
        galaxy optimized against K views at once. ``views`` is a list of
        {"camera": [x,y,z], "target": [x,y,z], "up": [x,y,z], "fov": f,
        "target_png": base64-PNG-or-array} dicts — per-view poses are
        known and held fixed; gradients triangulate the 3-D structure.

        ``pose="joint"`` treats the per-view poses as INITIAL GUESSES
        instead (engine/fit.fit_joint_multiview): ``rounds`` alternations
        of per-view fit_pose_fd blocks (``pose_steps`` each) and a shared
        parameter block; the result carries the K fitted cameras."""
        import base64
        import io as _io

        from .scene.schema import CameraParams

        scene = self._coerce_scene(scene)
        size = scene.config.size
        if not views:
            raise ValueError("views must be a non-empty list")
        cams, targets = [], []
        for k, v in enumerate(views):
            try:
                cams.append(CameraParams(
                    camera=tuple(v["camera"]),
                    target=tuple(v.get("target", (0.0, 0.0, 0.0))),
                    up=tuple(v.get("up", (0.0, 1.0, 0.0))),
                    fov=float(v.get("fov", scene.camera.fov))))
            except (KeyError, TypeError) as e:
                raise ValueError(f"view {k}: bad camera pose ({e})")
            t = v.get("target_png")
            if isinstance(t, str):
                from PIL import Image

                t = np.asarray(Image.open(
                    _io.BytesIO(base64.b64decode(t))).convert("RGB"))
            t = np.asarray(t)
            if t.shape != (size, size, 3):
                raise ValueError(
                    f"view {k}: target must be ({size}, {size}, 3), "
                    f"got {t.shape}")
            targets.append(t)
        steps = int(steps)
        if not 1 <= steps <= 100_000:
            raise ValueError(f"steps must be in [1, 100000], got {steps}")
        from .engine.fit import FITTABLE_FIELDS

        if fit_fields is None:
            fit_fields = ("strength", "r0", "z0")
        fit_fields = tuple(fit_fields)
        unknown = set(fit_fields) - set(FITTABLE_FIELDS)
        if unknown:
            raise ValueError(f"unknown fit fields {sorted(unknown)}")
        from .engine.scene_prep import flatten_scene

        static, _ = flatten_scene(scene)  # validate at submission
        march = self._check_march(march, False, static, fit_fields)
        if pose not in (False, "joint"):
            raise ValueError(
                "multi-view fits take pose=False (known poses, held "
                "fixed) or pose='joint' (poses refined per view)")
        if pose == "joint" and not 1 <= int(rounds) <= 100:
            raise ValueError(f"rounds must be in [1, 100], got {rounds}")
        spec = dict(target=np.stack(targets), cameras=cams,
                    fit_fields=fit_fields, steps=steps, lr=float(lr),
                    multiscale=False, pose=pose, march=march,
                    rounds=int(rounds), pose_steps=int(pose_steps))
        return self._enqueue(Job(id=0, scene=scene, key=("fit", object()),
                                 fit_spec=spec))

    def abort(self, job_id: int) -> bool:
        """Request cancellation. Queued jobs cancel immediately; a running
        single job stops at the next band boundary (keeping the partial
        frame); a running fit stops after the current optimizer step
        (keeping the best-so-far fit); a job already inside a batched
        launch finishes with it."""
        job = self.jobs.get(job_id)
        if job is None:
            return False
        job.abort.set()
        with self._cond:
            if job in self._queue and job.state == QUEUED:
                self._queue.remove(job)
                self._finish(job, ABORTED)
        return True

    def wait(self, job_id: int, timeout: float = 300.0,
             until: str = "done") -> Job:
        """Block until the job reaches a terminal state (or timeout) —
        event-driven on the service condition (_finish notifies), so a
        waiter costs nothing while the job runs. The HTTP long-poll
        (GET /job/<id>?wait=s) rides this too: one blocked request replaces
        a 20 ms polling loop per client, which at 8+ concurrent clients
        was hundreds of handler threads/s of pure GIL pressure on the
        render worker (BASELINE.md serving row).

        ``until="preview"`` returns as soon as a preview-then-refine job's
        fast LOD frame is published (or the job terminates)."""
        if until not in ("done", "preview"):
            raise ValueError(f"until must be 'done' or 'preview', not {until!r}")
        job = self.jobs[job_id]
        deadline = time.time() + timeout
        with self._cond:
            while job.state in (QUEUED, RUNNING):
                if until == "preview" and job.preview_ready:
                    break
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                self._cond.wait(remaining)
        return job

    def queue_depth(self) -> int:
        with self._cond:
            return len(self._queue)

    def metrics_text(self) -> str:
        """Prometheus text exposition of the service counters."""
        m = dict(self.metrics)
        m["queue_depth"] = self.queue_depth()
        m["consecutive_failures"] = self.consecutive_failures
        m["healthy"] = int(self.healthy())
        m["uptime_seconds"] = time.time() - m.pop("started_at")
        gauges = ("queue_depth", "uptime_seconds", "consecutive_failures",
                  "healthy")
        lines = []
        for k, v in sorted(m.items()):
            lines.append(f"# TYPE gamer_{k} "
                         f"{'gauge' if k in gauges else 'counter'}")
            lines.append(f"gamer_{k} {v}")
        with self._cond:
            buckets = list(self._lat_buckets)
            lat_sum, lat_count = self._lat_sum, self._lat_count
        lines.append("# TYPE gamer_request_seconds histogram")
        cum = 0
        for le, n in zip(self._lat_le, buckets):
            cum += n
            lines.append(f'gamer_request_seconds_bucket{{le="{le}"}} {cum}')
        lines.append(
            f'gamer_request_seconds_bucket{{le="+Inf"}} {cum + buckets[-1]}')
        lines.append(f"gamer_request_seconds_sum {round(lat_sum, 6)}")
        lines.append(f"gamer_request_seconds_count {lat_count}")
        return "\n".join(lines) + "\n"

    # -- worker ------------------------------------------------------------

    def start(self) -> None:
        if self._worker is None or not self._worker.is_alive():
            self._stop = False
            self._worker = threading.Thread(target=self._run, daemon=True,
                                            name="gamer-render-worker")
            self._worker.start()
        if self.pipeline and (self._completer is None
                              or not self._completer.is_alive()):
            # a prior stop() can leave a stale sentinel (worker joined but
            # completer join timed out) or stranded handoff items (worker
            # join timed out) in _completions; drain them so the fresh
            # completer doesn't exit immediately — running any stranded
            # finalizers inline so their jobs still finish.
            while True:
                try:
                    item = self._completions.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    self._complete(*item)
            self._completer = threading.Thread(
                target=self._completer_run, daemon=True,
                name="gamer-render-completer")
            self._completer.start()

    def stop(self, timeout: float = 30.0) -> None:
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        worker_down = True
        if self._worker is not None:
            self._worker.join(timeout)
            worker_down = not self._worker.is_alive()
        if self._completer is not None and worker_down:
            # the worker is down, so every handoff is already enqueued; the
            # sentinel lands behind them and the completer drains in order.
            # If the worker join TIMED OUT (a tunnel compile can run 600 s
            # vs the 30 s default) a sentinel now could land AHEAD of a
            # handoff the still-alive worker enqueues next, stranding those
            # jobs RUNNING forever — so leave the completer up in that case;
            # a later stop()/start() cleans up. put() is bounded so stop()
            # honors its own timeout even with maxsize=2 full of pending
            # downloads.
            try:
                self._completions.put(None, timeout=timeout)
                self._completer.join(timeout)
            except queue.Full:
                pass

    def _finish(self, job: Job, state: str, error: str | None = None) -> None:
        # under the lock: called from the worker AND from abort() on HTTP
        # handler threads (Condition wraps an RLock, so the abort() caller
        # that already holds it re-enters safely); counter += is a
        # read-modify-write that would lose updates unsynchronized
        with self._cond:
            job.state = state
            job.error = error
            job.finished = time.time()
            if state == DONE:
                job.progress = 1.0
                self.metrics["frames_rendered"] += 1
                self.consecutive_failures = 0
                if job.fit_spec is None and job.warm_spec is None:
                    dt = job.finished - job.submitted
                    for i, le in enumerate(self._lat_le):
                        if dt <= le:
                            self._lat_buckets[i] += 1
                            break
                    else:
                        self._lat_buckets[-1] += 1
                    self._lat_sum += dt
                    self._lat_count += 1
            elif state == FAILED:
                self.metrics["jobs_failed"] += 1
            elif state == ABORTED:
                self.metrics["jobs_aborted"] += 1
            # bounded retention: evict the oldest finished job beyond the
            # cap, frame buffers included
            self._finished_order.append(job.id)
            while (self.max_finished is not None
                   and len(self._finished_order) > self.max_finished):
                self.jobs.pop(self._finished_order.popleft(), None)
                self.metrics["jobs_evicted"] += 1
            self._cond.notify_all()  # wake wait()/long-poll clients

    def healthy(self) -> bool:
        return self.consecutive_failures < self.max_consecutive_failures

    def _drain_compatible(self, head: Job) -> List[Job]:
        """Pull every queued job sharing head's compiled structure/size,
        up to ``max_batch`` total (FIFO order preserved for the rest)."""
        batch = [head]
        with self._cond:
            keep = deque()
            while self._queue:
                j = self._queue.popleft()
                if (j.key == head.key and not j.abort.is_set()
                        and (self.max_batch is None
                             or len(batch) < self.max_batch)):
                    batch.append(j)
                else:
                    keep.append(j)
            self._queue = keep
        return batch

    def _run(self) -> None:
        while True:
            with self._cond:
                while not self._queue and not self._stop:
                    self._cond.wait()
                if self._stop:
                    return
                head = self._queue.popleft()
            if head.abort.is_set():
                self._finish(head, ABORTED)
                continue
            if self.batch_window_s > 0 and head.anim_scenes is None \
                    and head.fit_spec is None and head.warm_spec is None \
                    and head.preview_lod is None:
                # animations, fit, warm and preview jobs never merge with
                # other requests (their keys are unique by construction) — don't
                # pay the batching window for them. Under sustained load,
                # compatible requests pile up DURING the previous launch,
                # so if any are already queued the window is pure added
                # latency — sleep only when the head is (so far) alone.
                with self._cond:
                    alone = not any(j.key == head.key for j in self._queue)
                if alone:
                    time.sleep(self.batch_window_s)
            self._execute_head(head)

    def _execute_head(self, head: Job) -> None:
        """Run one job (plus any batch-compatible queued jobs) on the
        calling thread — the worker loop and the fit-step preemption lane
        share this body."""
        batch = self._drain_compatible(head)
        t0 = time.time()
        for j in batch:
            j.state = RUNNING
            j.started = t0
        try:
            if head.fit_spec is not None:
                self._run_fit(head)
            elif head.warm_spec is not None:
                self._run_warm(head)
            elif head.anim_scenes is not None:
                self._render_animation(head)
            elif head.preview_lod is not None:
                self._render_preview_refine(head)
            elif len(batch) > 1:
                self._render_batch(batch)
            else:
                self._render_single(head)
        except Exception as e:  # noqa: BLE001 — job isolation
            with self._cond:
                self.consecutive_failures += 1
            for j in batch:
                if j.state == RUNNING:
                    self._finish(j, FAILED, f"{type(e).__name__}: {e}")
        with self._cond:
            self.metrics["render_seconds"] += time.time() - t0

    # -- readback pipeline ---------------------------------------------------

    def _handoff(self, batch: List[Job], finalize) -> None:
        """Queue ``finalize`` (the host readback + job finish for an
        already-DISPATCHED launch) on the completer thread so the worker
        can immediately drain/pack/dispatch the next launch. Runs inline
        when pipelining is off or the completer isn't up (direct
        _execute_head callers in tests)."""
        if (self.pipeline and self._completer is not None
                and self._completer.is_alive()):
            self._completions.put((batch, finalize))
        else:
            self._complete(batch, finalize)

    def _complete(self, batch: List[Job], finalize) -> None:
        """Run a launch's readback+finish with the same failure isolation
        as _execute_head: a poisoned readback fails THOSE jobs and bumps
        the healthz counter; the service lives on."""
        try:
            finalize()
        except Exception as e:  # noqa: BLE001 — job isolation
            with self._cond:
                self.consecutive_failures += 1
            for j in batch:
                if j.state == RUNNING:
                    self._finish(j, FAILED, f"{type(e).__name__}: {e}")

    def _completer_run(self) -> None:
        while True:
            item = self._completions.get()
            if item is None:
                return
            self._complete(*item)

    def _preempt_quick_jobs(self) -> None:
        """Interactive lane: between optimizer steps of a long fit, serve
        every queued NON-fit job so a multi-minute fit cannot head-of-line
        block 0.2 s renders (the reference's queue stays responsive via its
        50 ms poll tick, renderqueue.cpp:63-87; the single-dispatch-thread
        equivalent is draining quick work at step boundaries). Fit jobs
        stay FIFO among themselves — a queued fit never preempts a running
        one."""
        if self._preempting:
            return  # a preempted job's own callbacks must not recurse
        self._preempting = True
        try:
            while True:
                with self._cond:
                    head = next(
                        (j for j in self._queue
                         if j.fit_spec is None and j.warm_spec is None), None)
                    if head is None:
                        return
                    self._queue.remove(head)
                if head.abort.is_set():
                    self._finish(head, ABORTED)
                    continue
                with self._cond:
                    self.metrics["worker_preemptions"] += 1
                self._execute_head(head)
        finally:
            self._preempting = False

    def _batch_mesh(self):
        """The service mesh re-axed for batched work: frames are
        independent, so batches shard the BATCH axis over the same devices
        the single-frame path row-shards over."""
        if self.mesh is None:
            return None
        from .engine.batch import make_batch_mesh

        return make_batch_mesh(np.asarray(self.mesh.devices).reshape(-1))

    def _render_batch(self, batch: List[Job]) -> None:
        """One device launch for every compatible queued request, padded to
        a power-of-two bucket so batch sizes reuse compiled executables."""
        from .engine.batch import render_batch

        n_dev = 1 if self.mesh is None else int(self.mesh.devices.size)
        scenes = [j.scene for j in batch]
        bucket = _bucket(len(scenes), multiple_of=n_dev)
        scenes = scenes + [scenes[-1]] * (bucket - len(scenes))
        # dispatch only — frames stay on device; the completer downloads
        # them while the worker packs the next launch (pipeline=True)
        frames = render_batch(scenes, mesh=self._batch_mesh(),
                              device_out=True)
        with self._cond:
            self.metrics["padded_frames"] += bucket - len(batch)
            self.metrics["batches"] += 1
            self.metrics["batched_frames"] += len(batch)

        def finalize():
            host = np.asarray(frames)
            for j, frame in zip(batch, host):
                j.batched = True
                j.image = frame
                self._finish(j, DONE)

        self._handoff(batch, finalize)

    def _render_animation(self, job: Job) -> None:
        """One batched launch for a whole fly-through/morph (BASELINE
        config 4), padded to the power-of-two bucket like request batches
        (the bucket is a multiple of the mesh, so sharding always tiles)."""
        from .engine.batch import render_batch

        n_dev = 1 if self.mesh is None else int(self.mesh.devices.size)
        scenes = list(job.anim_scenes)
        bucket = _bucket(len(scenes), multiple_of=n_dev)
        scenes = scenes + [scenes[-1]] * (bucket - len(scenes))
        frames = np.asarray(render_batch(scenes, mesh=self._batch_mesh()))
        job.frames = frames[: job.n_frames]
        job.image = job.frames[0]
        with self._cond:
            self.metrics["padded_frames"] += bucket - job.n_frames
            self.metrics["frames_rendered"] += job.n_frames - 1  # +1 in _finish
        self._finish(job, DONE)

    def _run_warm(self, job: Job) -> None:
        """Compile-and-execute every launch shape the service would use for
        the warm scene(s): the single-frame path plus each pad bucket of the
        batched path. Queued interactive jobs are drained between shapes
        (the fit preemption lane), so warming a cold cache never blocks
        real traffic for more than one compile."""
        from .engine.batch import render_batch
        from .engine.pallas_render import (render_progressive_pallas,
                                           render_scene_pallas)

        n_dev = 1 if self.mesh is None else int(self.mesh.devices.size)
        buckets = job.warm_spec["buckets"]
        scenes = job.warm_spec["scenes"]
        plan = [(sc, b) for sc in scenes for b in [None] + buckets]
        timings: Dict[str, float] = {}
        for i, (sc, b) in enumerate(plan):
            if job.abort.is_set():
                self._finish(job, ABORTED)
                return
            t0 = time.time()
            if b is None:  # the path a lone interactive request takes
                if self.mesh is not None:
                    np.asarray(render_scene_pallas(sc, mesh=self.mesh))
                elif 0 < sc.config.size < self.single_fuse_below:
                    # small singles fuse (see _render_single) — warm THAT
                    np.asarray(render_scene_pallas(sc))
                else:
                    render_progressive_pallas(sc, bands=self.bands)
                label = f"{sc.config.size}px/single"
            else:
                np.asarray(render_batch([sc] * (b * n_dev),
                                        mesh=self._batch_mesh()))
                label = f"{sc.config.size}px/batch{b * n_dev}"
            timings[label] = round(time.time() - t0, 3)
            with self._cond:
                self.metrics["warmed_executables"] += 1
            job.progress = (i + 1) / len(plan)
            self._preempt_quick_jobs()
        job.fit_result = {"warmed": timings}
        self._finish(job, DONE)

    def _run_fit(self, job: Job) -> None:
        """Inverse rendering on the worker: gradient steps with per-step
        progress; the fitted scene dict + loss trace is the result, plus a
        render of the fitted scene for /image.png."""
        from .engine.fit import (DEFAULT_POSE_SCHEDULE,
                                 DEFAULT_SCENE_SCHEDULE, fit_joint, fit_pose,
                                 fit_pose_fd, fit_pose_multiscale, fit_scene,
                                 fit_scene_multiscale, fit_scene_multiview)
        from .engine.pallas_render import render_scene_pallas
        from .scene.schema import scene_to_dict

        spec = job.fit_spec
        pose = spec.get("pose", False)
        joint = pose == "joint"
        multiview = spec.get("cameras") is not None
        if joint and multiview:
            # rounds x (K per-view fd pose blocks + shared scene block)
            pose_steps = spec.get("pose_steps", 30)
            total = spec["rounds"] * (
                len(spec["cameras"]) * pose_steps + spec["steps"])
        elif joint:
            # rounds x (pose block + parameter block) global step count
            pose_steps = spec.get("pose_steps", 30)
            pose_block = (pose_steps
                          if spec.get("pose_method") == "fd"
                          else pose_steps * len(DEFAULT_POSE_SCHEDULE))
            total = spec["rounds"] * (pose_block + spec["steps"])
        elif pose == "fd":
            total = spec["steps"]
        else:
            schedule = DEFAULT_POSE_SCHEDULE if pose else DEFAULT_SCENE_SCHEDULE
            rungs = len(schedule) if spec["multiscale"] else 1
            total = spec["steps"] * rungs

        def on_step(i, loss):
            job.progress = min(1.0, (i + 1) / total)
            # interactive lane: serve queued quick jobs between steps so
            # this fit doesn't head-of-line block the service
            self._preempt_quick_jobs()
            # cooperative abort: DELETE /job/<id> stops the fit after the
            # current step; the best-so-far fit is still returned below
            return not job.abort.is_set()

        if multiview:
            # multi-view: the view axis shards over the service mesh when
            # it tiles (K % n_dev == 0), else single-device
            mesh = self.mesh
            if mesh is not None and \
                    len(spec["cameras"]) % int(mesh.devices.size):
                mesh = None
            if joint:
                from .engine.fit import fit_joint_multiview

                result = fit_joint_multiview(
                    job.scene, spec["target"], spec["cameras"],
                    spec["fit_fields"], rounds=spec["rounds"],
                    pose_steps=pose_steps, scene_steps=spec["steps"],
                    scene_lr=spec["lr"], on_step=on_step, mesh=mesh,
                    march=spec.get("march", "frozen"))
            else:
                result = fit_scene_multiview(
                    job.scene, spec["target"], spec["cameras"],
                    spec["fit_fields"], steps=spec["steps"], lr=spec["lr"],
                    on_step=on_step, mesh=mesh,
                    march=spec.get("march", "tensor"))
        elif joint:
            # both blocks of fit_joint must tile the mesh: the pose ladders
            # run multiscale-pose shapes, the parameter blocks full-size
            mesh = self._fit_mesh(job.scene, True, pose=True)
            if mesh is not None and \
                    self._fit_mesh(job.scene, False, pose=False) is None:
                mesh = None
            result = fit_joint(job.scene, spec["target"], spec["fit_fields"],
                               rounds=spec["rounds"], pose_steps=pose_steps,
                               scene_steps=spec["steps"],
                               scene_lr=spec["lr"], on_step=on_step,
                               pose_method=spec.get("pose_method",
                                                    "multiscale"),
                               march=spec.get("march", "tensor"), mesh=mesh)
        elif pose == "fd":
            # fd shards the 2K+1 probe-frame BATCH axis (render_batch's
            # mesh shape), not pixel rows — padding makes any mesh valid
            result = fit_pose_fd(
                job.scene, spec["target"], spec["fit_fields"],
                steps=spec["steps"], lr=spec["lr"], on_step=on_step,
                mesh=self._batch_mesh())
        else:
            fitter = ((fit_pose_multiscale if spec["multiscale"]
                       else fit_pose)
                      if pose else
                      (fit_scene_multiscale if spec["multiscale"]
                       else fit_scene))
            result = fitter(job.scene, spec["target"], spec["fit_fields"],
                            steps=spec["steps"], lr=spec["lr"],
                            on_step=on_step,
                            march=spec.get("march", "tensor"),
                            mesh=self._fit_mesh(job.scene,
                                                spec["multiscale"], pose))
        job.fit_result = {
            "scene": scene_to_dict(result.scene),
            "losses": [float(v) for v in result.losses],
            "fit_fields": list(result.fit_fields),
        }
        if joint and multiview:
            # the K fitted per-view poses (the camera dicts)
            job.fit_result["poses"] = (result.params or {}).get("poses")
        elif joint:
            pose_params = (result.params or {}).get("pose") or {}
            job.fit_result["pose"] = {
                k: (v.tolist() if np.ndim(v) else float(v))
                for k, v in pose_params.items()}
        elif pose:
            # the fitted pose, explicitly (it also lives in scene.camera)
            job.fit_result["pose"] = {
                k: (v.tolist() if np.ndim(v) else float(v))
                for k, v in result.params.items()}
        job.image = np.asarray(render_scene_pallas(result.scene))
        self._finish(job, ABORTED if job.abort.is_set() else DONE)

    def _fit_mesh(self, scene, multiscale: bool, pose: bool = False):
        """The service mesh if every fit rung's pixel rows tile it, else
        None. Scene-fit rungs render at size//s (DEFAULT_SCENE_SCHEDULE);
        pose rungs render at full size but pool the loss by the schedule's
        pool factor, and fit_pose requires (size // pool) % n_dev == 0.
        Falling back to single-device keeps odd sizes serviceable instead
        of failing the job."""
        if self.mesh is None:
            return None
        from .engine.fit import DEFAULT_POSE_SCHEDULE, DEFAULT_SCENE_SCHEDULE

        n_dev = int(self.mesh.devices.size)
        size = int(scene.config.size)
        if pose:
            divisors = ([p for _, p in DEFAULT_POSE_SCHEDULE]
                        if multiscale else [1])
        else:
            divisors = list(DEFAULT_SCENE_SCHEDULE) if multiscale else [1]
        if all(size % s == 0 and (size // s) % n_dev == 0
               for s in divisors):
            return self.mesh
        return None

    def _render_preview_refine(self, job: Job) -> None:
        """Preview-then-refine: publish a fast LOD frame, then replace it
        with the exact frame — the reference's preview→full contract
        (mainwindow.cpp:483-495: every edit re-renders at previewSize with
        rayStep forced coarse, the Render button then produces the exact
        frame) carried to the service. Phase 1 caps the fractal octaves at
        ``preview_lod`` and uses the preview min-step (RenderConfig
        is_preview — the rasterizer.cpp:439-442 coarse sampling), one
        fused launch; the frame lands in ``job.image`` with
        ``preview_ready`` set and waiters are woken. Phase 2 runs in the
        long-running lane (queued quick jobs are served first, like fit
        steps) and renders the EXACT frame — bit-equal to a direct
        render_scene_pallas of the submitted scene; the preview stays
        visible until the exact frame atomically replaces it (no partial
        band frames)."""
        import dataclasses

        from .engine.pallas_render import (render_progressive_pallas,
                                           render_scene_pallas)

        pv_scene = dataclasses.replace(
            job.scene, config=dataclasses.replace(
                job.scene.config, noise_octaves=int(job.preview_lod),
                is_preview=True))
        pv = np.asarray(render_scene_pallas(pv_scene, mesh=self.mesh))
        with self._cond:
            job.image = pv
            job.preview_ready = True
            job.progress = 0.5
            self.metrics["previews_rendered"] += 1
            self._cond.notify_all()  # wake wait(until="preview") clients
        if job.abort.is_set():
            self._finish(job, ABORTED)  # preview kept as the partial frame
            return
        # exact phase in the long-running lane: interactive work first
        self._preempt_quick_jobs()
        if job.abort.is_set():
            self._finish(job, ABORTED)
            return
        if self.mesh is not None or 0 < job.scene.config.size < self.single_fuse_below:
            exact = np.asarray(
                render_scene_pallas(job.scene, mesh=self.mesh))
        else:
            def on_progress(frac: float, partial: np.ndarray):
                # progress ticks, but the preview frame STAYS in job.image
                job.progress = 0.5 + 0.5 * frac
                return not job.abort.is_set()

            exact = np.asarray(render_progressive_pallas(
                job.scene, bands=self.bands, on_progress=on_progress))
            if job.abort.is_set():
                self._finish(job, ABORTED)
                return
        job.image = exact
        self._finish(job, ABORTED if job.abort.is_set() else DONE)

    def _render_single(self, job: Job) -> None:
        from .engine.pallas_render import (render_progressive_pallas,
                                           render_scene_pallas)

        if self.mesh is not None:
            # row-sharded across the mesh: one fused launch (band-level
            # progress would serialize the mesh on each band boundary)
            job.image = np.asarray(render_scene_pallas(job.scene, mesh=self.mesh))
            self._finish(job, DONE)
            return

        if 0 < job.scene.config.size < self.single_fuse_below:
            # small frame: one fused launch; banding would pay `bands`
            # dispatch round trips for sub-second work (see __init__ doc).
            # Dispatch-then-handoff like batches: the download of this
            # frame overlaps the worker's next launch.
            frame = render_scene_pallas(job.scene, device_out=True)
            with self._cond:
                self.metrics["singles_fused"] += 1

            def finalize():
                job.image = np.asarray(frame)
                self._finish(job, ABORTED if job.abort.is_set() else DONE)

            self._handoff([job], finalize)
            return

        def on_progress(frac: float, partial: np.ndarray):
            job.progress = frac
            job.image = partial
            return not job.abort.is_set()

        img = render_progressive_pallas(job.scene, bands=self.bands,
                                        on_progress=on_progress)
        job.image = np.asarray(img)
        self._finish(job, ABORTED if job.abort.is_set() else DONE)


# -- HTTP layer -------------------------------------------------------------


def _png(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def _gif(frames: np.ndarray, duration_ms: int = 80) -> bytes:
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    buf = io.BytesIO()
    imgs[0].save(buf, format="GIF", save_all=True, duration=duration_ms,
                 loop=0, append_images=imgs[1:])
    return buf.getvalue()


def make_handler(service: RenderService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code, obj):
            self._send(code, "application/json", json.dumps(obj).encode())

        def _job(self, path: str) -> Optional[Job]:
            try:
                return service.jobs.get(int(path.split("/")[2]))
            except (IndexError, ValueError):
                return None

        def do_POST(self):
            path = urllib.parse.urlparse(self.path).path
            if path not in ("/render", "/flythrough", "/morph", "/fit",
                            "/warm"):
                return self._json(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                scene = payload.get("scene", payload)
                if path == "/flythrough":
                    job_id = service.submit_flythrough(
                        scene, payload.get("frames", 16),
                        payload.get("orbit_deg", 360.0))
                elif path == "/morph":
                    job_id = service.submit_morph(
                        scene, payload.get("target_galaxy"),
                        payload.get("frames", 16),
                        payload.get("ease", "smoothstep"))
                elif path == "/warm":
                    job_id = service.submit_warm(
                        scene, payload.get("buckets", (1, 2, 4, 8)),
                        payload.get("sizes"))
                elif path == "/fit":
                    fields = payload.get("fields")
                    fields = tuple(fields) if fields is not None else None
                    if payload.get("views") is not None:
                        if payload.get("multiscale") or payload.get(
                                "pose") not in (None, False, "joint"):
                            raise ValueError(
                                "multi-view fits take 'pose': 'joint' "
                                "(poses refined per view) or no 'pose' "
                                "(poses held fixed); no 'multiscale'")
                        pose_mv = payload.get("pose") or False
                        job_id = service.submit_fit_multiview(
                            scene, payload["views"], fields,
                            payload.get("steps", 100),
                            payload.get("lr", 2e-2),
                            payload.get("march",
                                        "frozen" if pose_mv else "tensor"),
                            pose=pose_mv,
                            rounds=payload.get("rounds", 2),
                            pose_steps=payload.get("pose_steps", 30))
                    else:
                        job_id = service.submit_fit(
                            scene, payload.get("target_png"), fields,
                            payload.get("steps", 100),
                            payload.get("lr", 2e-2),
                            payload.get("multiscale", False),
                            payload.get("pose", False),
                            payload.get("march", "tensor"),
                            payload.get("rounds", 2),
                            payload.get("pose_steps", 30),
                            payload.get("pose_method", "multiscale"))
                else:
                    job_id = service.submit(scene,
                                            preview=payload.get("preview"))
                self._json(202, {"job": job_id})
            except QueueFull as e:
                self._json(429, {"error": str(e)})
            except Exception as e:  # noqa: BLE001
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def do_DELETE(self):
            path = urllib.parse.urlparse(self.path).path
            job = self._job(path)
            if path.startswith("/job/") and job is not None:
                service.abort(job.id)
                self._json(200, job.info())
            else:
                self._json(404, {"error": "no such job"})

        def do_GET(self):
            path = urllib.parse.urlparse(self.path).path
            if path == "/healthz":
                try:
                    import jax

                    platform = jax.devices()[0].platform
                except Exception as e:  # noqa: BLE001
                    return self._json(503, {"ok": False, "error": str(e)})
                if not service.healthy():
                    # repeated render failures usually mean a poisoned
                    # device runtime — tell the orchestrator to restart us
                    return self._json(503, {
                        "ok": False, "platform": platform,
                        "error": f"{service.consecutive_failures} consecutive"
                                 " render failures"})
                self._json(200, {"ok": True, "platform": platform})
            elif path == "/metrics":
                self._send(200, "text/plain; version=0.0.4",
                           service.metrics_text().encode())
            elif path == "/jobs":
                jobs = [j.info() for j in
                        sorted(service.jobs.values(), key=lambda j: -j.id)]
                self._json(200, {"jobs": jobs})
            elif path.startswith("/job/") and path.endswith("/result.json"):
                job = self._job(path)
                if job is None:
                    self._json(404, {"error": "no such job"})
                elif job.fit_result is None:
                    self._json(409, {"error": f"job is {job.state} or not "
                                     "a fit", **(job.info() if job else {})})
                else:
                    self._json(200, job.fit_result)
            elif path.startswith("/job/") and path.endswith("/animation.gif"):
                job = self._job(path)
                if job is None:
                    self._json(404, {"error": "no such job"})
                elif job.frames is None:
                    self._json(409, {"error": f"job is {job.state} or not a "
                                     "fly-through", **(job.info() if job else {})})
                else:
                    self._send(200, "image/gif", _gif(job.frames))
            elif path.startswith("/job/") and path.endswith("/image.png"):
                job = self._job(path)
                if job is None:
                    self._json(404, {"error": "no such job"})
                elif job.image is None:
                    self._json(409, {"error": f"job is {job.state}",
                                     **job.info()})
                else:
                    self._send(200, "image/png", _png(job.image))
            elif path.startswith("/job/"):
                job = self._job(path)
                if job is None:
                    self._json(404, {"error": "no such job"})
                else:
                    # long-poll: ?wait=SECONDS blocks (cap 60 s) until the
                    # job is terminal — one request replaces a client-side
                    # polling loop. Each waiter occupies only a handler
                    # thread parked on the service condition.
                    q = urllib.parse.parse_qs(
                        urllib.parse.urlparse(self.path).query)
                    if "wait" in q:
                        try:
                            timeout = min(float(q["wait"][0]), 60.0)
                        except ValueError:
                            return self._json(400, {"error": "bad wait="})
                        until = q.get("until", ["done"])[0]
                        if until not in ("done", "preview"):
                            return self._json(400, {"error": "bad until="})
                        with service._cond:
                            service.metrics["long_polls"] += 1
                        service.wait(job.id, timeout=timeout, until=until)
                    self._json(200, job.info())
            else:
                self._json(404, {"error": "not found"})

    return Handler


def serve(port: int = 8100, batch_window_s: float = 0.05, bands: int = 8,
          mesh=None, poll: bool = True, on_start=None,
          max_batch: Optional[int] = None):
    """Start the render API. Returns the HTTPServer (caller-managed when
    poll=False — used by tests and embedders). on_start(service) runs once
    the service exists — e.g. to submit a startup warm job (CLI warm=)."""
    from .utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # first-of-a-shape requests compile once ever
    service = RenderService(batch_window_s=batch_window_s, bands=bands,
                            mesh=mesh, max_batch=max_batch)
    if on_start is not None:
        on_start(service)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))
    httpd.service = service  # type: ignore[attr-defined]
    print(f"gamer-tpu render service on http://127.0.0.1:{httpd.server_address[1]}/ "
          f"(POST /render, GET /job/<id>, /metrics)")
    if poll:
        try:
            httpd.serve_forever()
        finally:
            service.stop()
    return httpd


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8100)
    ap.add_argument("--batch-window", type=float, default=0.05)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=None)
    args = ap.parse_args()
    serve(args.port, args.batch_window, args.bands, max_batch=args.max_batch)
