"""Serving throughput: cross-request batching vs sequential rendering.

Two modes:

inproc (default) — submits B concurrent scene-dict requests (same
structure, distinct orbit cameras — the realistic multi-client shape) to
an in-process RenderService twice: once with the worker paused until all
B are queued (they drain into ONE padded batched launch) and once
strictly sequentially (one request at a time, the no-batching baseline).
Prints frames/s for both and the speedup.

http — the OPERATED shape: a real ThreadingHTTPServer + RenderService,
K concurrent client threads each POSTing /render and polling /job/<id>
to completion. Reports sustained request throughput, per-request latency
percentiles (p50/p90/p99), and the batching collapse ratio
(frames per device launch) scraped from /metrics — then fires a
backpressure storm at a small max_queue and verifies 429s are clean
(server stays healthy, accepted jobs all finish).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_bench.py \
      [size=256] [requests=16]              # inproc A/B
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_bench.py \
      http [size=256] [clients=8] [requests_per_client=8] [maxbatch=N]

maxbatch=N caps frames per launch (the RenderService latency dial) so
the p50-vs-throughput tradeoff can be measured at the same load.
octaves=N serves every request at that noise LOD (quality-tier serving —
the remaining single-chip lever where the device is the bottleneck).
"""

from __future__ import annotations

import dataclasses
import sys
import time


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import gamer_tpu
    from gamer_tpu.scene import gax
    from gamer_tpu.scene.cameracontrols import orbit_path
    from gamer_tpu.serve import RenderService
    from gamer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")
    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=size, ray_step=0.025),
    )
    cams = orbit_path(scene.camera, n_req, horizontal_deg=180.0)
    scenes = [dataclasses.replace(scene, camera=c) for c in cams]

    # warm both compiled paths (batched bucket + single progressive bands)
    warm = RenderService(autostart=False)
    for s in scenes:
        warm.submit(s)
    warm.start()
    for jid in list(warm.jobs):
        assert warm.wait(jid, 1800).state == "done", warm.jobs[jid].error
    warm.stop()
    single_warm = RenderService()
    assert single_warm.wait(single_warm.submit(scenes[0]), 1800).state == "done"
    single_warm.stop()

    # interleaved A/B (the CLAUDE.md measurement rule: tunnel drift is
    # +-2x between runs, so alternate the variants and compare MINs)
    reps = 4
    t_batched, t_seq = [], []
    for _ in range(reps):
        svc = RenderService(autostart=False)  # all B queued -> ONE launch
        jids = [svc.submit(s) for s in scenes]
        t0 = time.perf_counter()
        svc.start()
        for jid in jids:
            assert svc.wait(jid, 1800).state == "done"
        t_batched.append(time.perf_counter() - t0)
        assert svc.metrics["batches"] == 1, svc.metrics
        svc.stop()

        svc = RenderService()  # strictly sequential requests
        t0 = time.perf_counter()
        for s in scenes:
            assert svc.wait(svc.submit(s), 1800).state == "done"
        t_seq.append(time.perf_counter() - t0)
        svc.stop()

    tb, ts = min(t_batched), min(t_seq)
    print(f"\n{n_req} requests at {size}^2 (min over {reps} interleaved reps):")
    print(f"  batched    {tb:.3f}s  ({n_req / tb:.1f} frames/s, one padded launch)")
    print(f"  sequential {ts:.3f}s  ({n_req / ts:.1f} frames/s)")
    print(f"  speedup    {ts / tb:.2f}x")


def _scenes(size: int, n: int, octaves=None):
    import gamer_tpu
    from gamer_tpu.scene import gax
    from gamer_tpu.scene.cameracontrols import orbit_path

    galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")
    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=size, ray_step=0.025,
                                      noise_octaves=octaves),
    )
    cams = orbit_path(scene.camera, max(n, 2), horizontal_deg=180.0)
    return [dataclasses.replace(scene, camera=c) for c in cams[:n]]


def main_http() -> None:
    """Operated-shape serving bench over real HTTP (VERDICT r2 #7)."""
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import numpy as np

    from gamer_tpu.scene.schema import scene_to_dict
    from gamer_tpu.serve import RenderService, make_handler
    from gamer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    args = [a for a in sys.argv[2:] if "=" not in a]
    kw = dict(a.split("=", 1) for a in sys.argv[2:] if "=" in a)
    size = int(args[0]) if len(args) > 0 else 256
    n_clients = int(args[1]) if len(args) > 1 else 8
    per_client = int(args[2]) if len(args) > 2 else 8
    max_batch = int(kw["maxbatch"]) if "maxbatch" in kw else None
    # octaves=N serves the quality tier (RenderConfig.noise_octaves):
    # the one single-chip lever at the device-bound 512^2 point
    octaves = int(kw["octaves"]) if "octaves" in kw else None

    service = RenderService(batch_window_s=0.05, max_batch=max_batch)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=1800) as r:
            return json.loads(r.read())

    def post(path, payload):
        req = urllib.request.Request(
            base + path, json.dumps(payload).encode(),
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=1800) as r:
            return r.status, json.loads(r.read())

    payloads = [scene_to_dict(s)
                for s in _scenes(size, n_clients, octaves=octaves)]

    def wait_done(jid: int) -> dict:
        # long-poll (?wait=) — one blocked GET per job instead of a 20 ms
        # client polling loop (which at 8 clients was ~400 handler
        # threads/s of GIL pressure against the render worker)
        while True:
            info = get(f"/job/{jid}?wait=30")
            if info["state"] not in ("queued", "running"):
                return info

    # warm THROUGH the service's own pre-warm job: the single fused path +
    # every pad bucket the measured burst can hit. Rendering 8 warm
    # requests instead leaves whichever buckets they didn't happen to
    # coalesce into cold — the r4 first measurement paid exactly one such
    # cold compile as a 26 s p99 outlier that ate 80% of the wall.
    t0 = time.perf_counter()
    _, body = post("/warm", {"scene": payloads[0],
                             "buckets": [1, 2, 4, 8]})
    wait_done(body["job"])
    warm_ids = [post("/render", p)[1]["job"] for p in payloads]
    for jid in warm_ids:
        wait_done(jid)
    print(f"warm pass ({n_clients} requests): "
          f"{time.perf_counter() - t0:.1f}s (includes compile)")

    m0 = dict(service.metrics)
    lat, errors = [], []
    lock = threading.Lock()

    def client(k: int) -> None:
        payload = payloads[k]
        for _ in range(per_client):
            t0 = time.perf_counter()
            try:
                status, body = post("/render", payload)
                info = wait_done(body["job"])
                dt = time.perf_counter() - t0
                with lock:
                    (lat if info["state"] == "done" else errors).append(dt)
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(str(e))

    threads = [threading.Thread(target=client, args=(k,))
               for k in range(n_clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    total = n_clients * per_client
    assert not errors, f"{len(errors)} failed requests: {errors[:3]}"
    frames = service.metrics["frames_rendered"] - m0.get("frames_rendered", 0)
    batches = service.metrics["batches"] - m0.get("batches", 0)
    batched = (service.metrics["batched_frames"]
               - m0.get("batched_frames", 0))
    singles = frames - batched  # each runs alone (bands progressive launches)
    lat_ms = np.sort(np.array(lat)) * 1e3
    p = lambda q: float(np.percentile(lat_ms, q))
    print(f"\n{n_clients} clients x {per_client} requests at {size}^2 "
          f"(window 0.05s, max_batch={max_batch}):")
    print(f"  throughput  {total / wall:.2f} req/s ({wall:.1f}s wall)")
    print(f"  latency     p50 {p(50):.0f} ms   p90 {p(90):.0f} ms   "
          f"p99 {p(99):.0f} ms")
    print(f"  batching    {batched}/{frames} frames collapsed into "
          f"{batches} batched launches "
          f"(collapse {batched / max(batches, 1):.2f} frames/launch; "
          f"{singles} rendered solo)")

    # backpressure storm: tiny queue, a burst far over it -> clean 429s
    httpd.shutdown()
    service.stop()
    storm = RenderService(batch_window_s=0.05, max_queue=8)
    httpd2 = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(storm))
    port2 = httpd2.server_address[1]
    threading.Thread(target=httpd2.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port2}"
    codes = []

    def storm_client(k: int) -> None:
        for i in range(8):
            try:
                status, body = post("/render", payloads[k % len(payloads)])
                codes.append(status)
            except urllib.error.HTTPError as e:
                codes.append(e.code)
            except OSError:
                # ThreadingHTTPServer under a 16-thread burst can reset a
                # connection instead of answering; count it as rejected
                codes.append(429)

    threads = [threading.Thread(target=storm_client, args=(k,))
               for k in range(n_clients * 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    n429 = sum(1 for c in codes if c == 429)
    n202 = sum(1 for c in codes if c == 202)
    assert n429 > 0, "storm never hit backpressure (raise the burst)"
    assert n202 + n429 == len(codes), f"unexpected codes: {set(codes)}"
    health = get("/healthz")
    assert health.get("ok", False), f"unhealthy after storm: {health}"
    deadline = time.time() + 1800
    while any(j.state in ("queued", "rendering")
              for j in list(storm.jobs.values())):
        assert time.time() < deadline, "storm jobs never drained"
        time.sleep(0.2)
    n_done = sum(1 for j in storm.jobs.values() if j.state == "done")
    print(f"  storm       {len(codes)} burst submissions -> {n202} accepted "
          f"+ {n429} clean 429s; {n_done} accepted jobs all finished; "
          f"healthz ok")
    httpd2.shutdown()
    storm.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "http":
        main_http()
    else:
        main()
