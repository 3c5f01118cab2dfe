"""Headless CLI — ConsoleRenderer parity (source/consolerenderer.cpp).

Commands and argument schemas match the reference exactly so existing
scripts (e.g. singleGalaxy.sh:1) work by swapping the binary name:

  galaxy <method> cx cy cz tx ty tz ux uy uz fov exposure gamma saturation
         raystep <gaxfile> <size> <outfile>                (19 tokens)
  skybox <method> <RenderParams.dat> <gaxfile> <size>
  renderhpx <hpx fits> <size> <outfile> <exposure> <gamma> <saturation>

<method> selects the execution backend: the reference's 'omp'/'thread'
both map to the Pallas TPU kernel (every pixel is already parallel), as
does 'pallas'; 'xla' selects the lockstep XLA path (with progress/ETA),
'oracle' the spec-exact CPU path, 'sharded' the device-mesh path.

Extensions beyond the reference (same spirit, scene-dict world):
  render <scene.json> <outfile>       render a JSON scene dict (outfile
                                      ending .fits -> per-channel FITS of
                                      the linear radiance buffer)
  allsky <gaxfile> <nside> <size> <outfile>   HEALPix all-sky + Mollweide
  info <gaxfile>                      print a galaxy as a scene dict
  flythrough <gaxfile> <frames> <size> <outprefix>   orbit path rendered as
                                      ONE batched launch; PNG frames + GIF
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from .scene import gax
from .scene.schema import (
    CameraParams,
    GalaxyInstance,
    RenderConfig,
    Scene,
    galaxy_to_dict,
    scene_from_dict,
)
from .utils.timers import ScopedTimer, format_ms

USAGE = """Usage: gamer-tpu [ command ] [ parameters ]
Commands:
   galaxy <method> <camera x y z> <target x y z> <up x y z> <fov> <exposure>
          <gamma> <saturation> <ray step> <gax file> <size> <outfile>
   skybox <method> <RenderParams.dat> <gax file> <size>
   renderhpx <hpx fits file> <size> <out file> <exposure> <gamma> <saturation>
   allsky <gax file> <nside> <size> <outfile>
   render <scene.json> <outfile>
   info <gax file>
   flythrough <gax file> <frames> <size> <outprefix>
   morph <gax A> <gax B> <frames> <size> <outprefix>
   scene <gax[,gax...]> <n> <box> <seed> <size> <outfile>
   dataset <gax[,gax...]> <n per gax> <seed> <size> <chunk> <out dir>
   fit <camera x y z> <target x y z> <up x y z> <fov> <exposure> <gamma>
       <saturation> <ray step> <gax file> <target image> <out gax>
       [steps=100] [lr=0.02] [fields=strength,r0,z0] [multiscale] [ckpt=FILE]
       [march=tensor|scan|frozen|fd]  (frozen: noise precomputed once — the
       fastest and most accurate gradients when fields don't feed the noise;
       fd: central-difference probes through the production kernel — the
       trustworthy fast path for winding/winding_b/winding_n/scale/ks)
       [sweep=N]  (fd only: staged global search — N-point zooming
       coordinate sweeps + a joint winding_b x scale grid when both are
       fitted; escapes the measured spurious basins of the chaotic fields)
   fitpose <camera x y z> <target x y z> <up x y z> <fov> <exposure> <gamma>
       <saturation> <ray step> <gax file> <target image> <out scene.json>
       [steps=80] [lr=0.01] [noise LOD=3 | multiscale | fd] [ckpt=FILE]
   fitjoint <camera x y z> <target x y z> <up x y z> <fov> <exposure> <gamma>
       <saturation> <ray step> <gax file> <target image> <out scene.json>
       [rounds=2] [posesteps=30] [scenesteps=60] [fields=strength,r0,z0]
       [ckpt=FILE] [march=frozen] [pose=multiscale|fd]  (UNKNOWN camera AND
       unknown parameters: alternating pose-block / parameter-block
       descent — pose=fd probes the production kernel instead of the
       differentiable ladder; also writes the fitted galaxy as <out>.gax)
   serve [port=8100] [batch window s=0.05] [bands=8] [mesh] [warm=GAX[:SIZES]]
         [maxbatch=N]
   viewer [port=8000] [size=256] [gax dir]
<method>: omp | thread | pallas (TPU kernel) | xla | oracle | sharded
"""


def _xla_unsafe(size: int, backend: str = None) -> bool:
    """True when the lockstep XLA march should not run (see
    engine.render.xla_march_unsafe — the library guard). The CLI fails
    over to the Pallas kernel instead of erroring, keeping documented
    reference invocations working on TPU hardware."""
    from .engine.render import xla_march_unsafe

    return xla_march_unsafe(size, backend)


def _progress_printer(t0: float):
    state = {"prev": -1}

    def cb(frac: float, _img=None) -> None:
        cur = int(frac * 1000)
        if cur != state["prev"]:
            elapsed = (time.perf_counter() - t0) * 1000.0
            eta = elapsed / frac - elapsed if frac > 0 else 0.0
            print(f"\r[ {cur / 10:.1f}% ]  with ETA in {format_ms(eta)} ",
                  end="", flush=True)
            state["prev"] = cur
    return cb


def _save_png(img, outfile: str) -> str:
    from PIL import Image

    out = outfile if outfile.endswith(".png") else outfile + ".png"
    Image.fromarray(img).save(out)
    return out


def cmd_galaxy(argv) -> int:
    if len(argv) != 19:
        print(f"{len(argv)}\nIncorrect usage/parameters for galaxy. Usage:")
        print(USAGE)
        return 1
    method = argv[1].lower()
    if method not in ("omp", "thread", "pallas", "xla", "oracle", "sharded"):
        print(f"ERROR! Cannot recognize {argv[1]}")
        print("Must be 'omp', 'thread', 'pallas', 'xla', 'oracle' or 'sharded'")
        return 1
    fl = [float(x) for x in argv[2:16]]
    scene = Scene(
        camera=CameraParams(
            camera=tuple(fl[0:3]), target=tuple(fl[3:6]), up=tuple(fl[6:9]),
            fov=fl[9],
        ),
        instances=[GalaxyInstance(galaxy=gax.load(argv[16]))],
        config=RenderConfig(
            size=int(float(argv[17])), ray_step=fl[13],
            exposure=fl[10], gamma=fl[11], saturation=fl[12],
        ),
    )
    outfile = argv[18]
    if method == "xla" and _xla_unsafe(scene.config.size):
        print("WARNING: the lockstep XLA path is known to crash the TPU "
              "runtime at >=256^2 frames (large in-loop gathers); falling "
              "back to the Pallas kernel. Use a size < 256 for XLA "
              "conformance runs.")
        method = "pallas"
    print(f"Starting rendering on {_backend_desc(method)}.")
    t0 = time.perf_counter()
    with ScopedTimer("Rendering"):
        if method == "oracle":
            from .oracle.reference import render_oracle

            img, _ = render_oracle(scene)
        elif method == "sharded":
            from .parallel import render_scene_sharded

            img = render_scene_sharded(scene)
        elif method == "xla":
            from .engine.queue import render_progressive

            img = render_progressive(scene, chunks=16,
                                     on_progress=_progress_printer(t0))
            print()
        else:
            # 'omp'/'thread' (reference names) and 'pallas' -> the TPU
            # kernel, rendered in row bands so the reference's %/ETA ticker
            # (consolerenderer.cpp:80-93) runs on the production path too
            from .engine.pallas_render import render_progressive_pallas

            img = render_progressive_pallas(
                scene, bands=16, on_progress=_progress_printer(t0))
            print()
    out = _save_png(img, outfile)
    print(f"Image saved to file {out}")
    return 0


def cmd_skybox(argv) -> int:
    if len(argv) != 5:
        print(f"{len(argv)}\nIncorrect usage/parameters for skybox. Usage:")
        print(USAGE)
        return 1
    method = argv[1].lower()
    from .engine.queue import RenderQueue
    from .io.renderparams import RenderParamsFile

    rp = RenderParamsFile.load(argv[2])
    galaxy = gax.load(argv[3])
    size = int(float(argv[4]))
    scene = Scene(
        camera=rp.camera,
        instances=[GalaxyInstance(galaxy=galaxy)],
        config=rp.to_render_config(size=size),
        spectra=rp.spectra or None,
    )
    if method == "xla" and _xla_unsafe(scene.config.size):
        print("WARNING: the lockstep XLA path is known to crash the TPU "
              "runtime at >=256^2 frames; falling back to the batched "
              "Pallas kernel for the skybox faces.")
        method = "pallas"
    print(f"Starting rendering on {_backend_desc(method)}.")
    t0 = time.perf_counter()
    with ScopedTimer("Rendering"):
        if method == "xla":
            rq = RenderQueue()
            rq.add_skybox(scene)
            for job, _img, secs in rq.render_all("."):
                print(f"Image saved to file {job.filename}.png  ({secs:.1f}s)")
        else:
            # all 6 faces in ONE batched kernel launch
            from .engine.batch import render_batch
            from .engine.queue import skybox_jobs

            jobs = skybox_jobs(scene)
            frames = render_batch([j.scene for j in jobs])
            for job, img in zip(jobs, frames):
                out = _save_png(img, job.filename)
                print(f"Image saved to file {out}")
    return 0


def cmd_renderhpx(argv) -> int:
    if len(argv) != 7:
        print(USAGE)
        return 1
    import numpy as np

    from .engine.queue import _post_jitted
    from .io.fits import read_fits_image
    from .post.mollweide import mollweide_image

    import jax.numpy as jnp

    hpx = np.asarray(read_fits_image(argv[1])).ravel()
    nside = int(np.sqrt(hpx.size / 12))
    if 12 * nside * nside != hpx.size:
        print(f"ERROR: {hpx.size} values is not a HEALPix map (12*nside^2)")
        return 1
    size = int(argv[2])
    buf = mollweide_image(hpx, nside, size)
    img = np.asarray(_post_jitted()(
        jnp.asarray(buf), jnp.float32(float(argv[4])),
        jnp.float32(float(argv[5])), jnp.float32(float(argv[6]))))
    out = _save_png(img, argv[3])
    print(f"Image saved to file {out}")
    return 0


def cmd_allsky(argv) -> int:
    if len(argv) != 5:
        print(USAGE)
        return 1
    from .engine.allsky import render_allsky_image

    scene = Scene(
        camera=CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0), up=(0, 1, 0),
                            fov=90.0),
        instances=[GalaxyInstance(galaxy=gax.load(argv[1]))],
        config=RenderConfig(size=int(argv[3]), ray_step=0.025),
    )
    with ScopedTimer("All-sky rendering"):
        img = render_allsky_image(scene, nside=int(argv[2]), size=int(argv[3]))
    out = _save_png(img, argv[4])
    print(f"Image saved to file {out}")
    return 0


def cmd_render(argv) -> int:
    if len(argv) != 3:
        print(USAGE)
        return 1
    from .engine.pallas_render import render_linear_pallas, render_scene_pallas

    scene = scene_from_dict(json.loads(Path(argv[1]).read_text()))
    outfile = argv[2]
    with ScopedTimer("Rendering"):
        if outfile.endswith(".fits"):
            # per-channel FITS export of the linear radiance buffer — the
            # GUI's optional save path (mainwindow.cpp:889-893)
            import numpy as np

            from .io.fits import write_fits_channels

            linear = np.asarray(render_linear_pallas(scene))
            paths = write_fits_channels(outfile[:-5], linear)
            for p in paths:
                print(f"Image saved to file {p}")
            return 0
        img = render_scene_pallas(scene)
    out = _save_png(img, outfile)
    print(f"Image saved to file {out}")
    return 0


def cmd_info(argv) -> int:
    if len(argv) != 2:
        print(USAGE)
        return 1
    print(json.dumps(galaxy_to_dict(gax.load(argv[1])), indent=2))
    return 0


def cmd_flythrough(argv) -> int:
    """Orbit fly-through as ONE batched kernel launch (BASELINE config 4) —
    the reference renders camera paths one queued frame at a time
    (renderqueue.cpp:63-87); here the whole path is a single batch axis.
    Writes <outprefix>_NNN.png per frame plus an animated <outprefix>.gif."""
    if len(argv) != 5:
        print(USAGE)
        return 1
    from PIL import Image

    from .engine.batch import render_flythrough
    from .scene.cameracontrols import orbit_path

    frames = int(argv[2])
    size = int(argv[3])
    scene = Scene(
        camera=CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0), up=(0, 1, 0),
                            fov=90.0),
        instances=[GalaxyInstance(galaxy=gax.load(argv[1]))],
        config=RenderConfig(size=size, ray_step=0.025),
    )
    cams = orbit_path(scene.camera, frames)
    with ScopedTimer(f"{frames}-frame fly-through"):
        imgs = render_flythrough(scene, cams)
    prefix = argv[4]
    for i, frame in enumerate(imgs):
        Image.fromarray(frame).save(f"{prefix}_{i:03d}.png")
    Image.fromarray(imgs[0]).save(
        f"{prefix}.gif", save_all=True, duration=80, loop=0,
        append_images=[Image.fromarray(f) for f in imgs[1:]])
    print(f"Saved {frames} frames to {prefix}_NNN.png and {prefix}.gif")
    return 0


def cmd_scene(argv) -> int:
    """GUI scene-mode parity (mainwindow.cpp:1137-1170): N random instances
    of the given galaxies in a box, rendered in one frame."""
    if len(argv) != 7:
        print(USAGE)
        return 1
    from .engine.pallas_render import render_scene_pallas
    from .scene.generate import generate_scene

    pool = [gax.load(p) for p in argv[1].split(",")]
    n, box = int(argv[2]), float(argv[3])
    seed, size = int(argv[4]), int(argv[5])
    base = Scene(
        camera=CameraParams(camera=(2.5, 0.4, 0), target=(0, 0, 0),
                            up=(0, 1, 0), fov=70.0),
        config=RenderConfig(size=size, ray_step=0.025),
    )
    scene = generate_scene(pool, n, box, seed=seed, base_scene=base)
    with ScopedTimer(f"{n}-instance scene"):
        img = render_scene_pallas(scene)
    out = _save_png(img, argv[6])
    print(f"Image saved to file {out}")
    return 0


def cmd_dataset(argv) -> int:
    """Resumable dataset generation (BASELINE config 5): n structure-
    preserving variations of each galaxy rendered to .npy chunks with a
    manifest (re-running the same out_dir resumes after interruption).

    A comma-separated gax list generates a HETEROGENEOUS corpus — n
    variations per template, template-major ordered so chunks stay
    homogeneous except at structure boundaries (render_batch groups a
    mixed chunk by compiled structure: one launch per group, so a
    k-structure corpus compiles k chunk-sized executables plus the
    boundary-size stragglers). The realistic training-corpus case of the
    GUI scene mode's N-random-instances ambition (mainwindow.cpp:
    1137-1170) at dataset scale."""
    if len(argv) != 7:
        print(USAGE)
        return 1
    import dataclasses

    from .engine.jobs import DatasetJob
    from .engine.scene_prep import flatten_scene
    from .scene.generate import generate_galaxy_variations

    templates = [gax.load(p) for p in argv[1].split(",")]
    n, seed, size = int(argv[2]), int(argv[3]), int(argv[4])
    chunk = int(argv[5])
    base = Scene(
        camera=CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0), up=(0, 1, 0),
                            fov=90.0),
        config=RenderConfig(size=size, ray_step=0.025),
    )
    scenes = [
        dataclasses.replace(base, instances=[GalaxyInstance(galaxy=g)])
        for t, template in enumerate(templates)
        for g in generate_galaxy_variations(template, n, seed=seed + t)
    ]
    if len(templates) > 1:
        statics = {flatten_scene(s)[0] for s in scenes}
        print(f"{len(templates)} templates, {len(scenes)} scenes, "
              f"{len(statics)} distinct compiled structures")
    job = DatasetJob(scenes, argv[6], chunk_size=chunk)
    done = {"frames": 0}

    def on_chunk(c, cdt):
        total = len(scenes)
        done["frames"] += min(chunk, total - c * chunk)  # last may be short
        print(f"chunk {c + 1}/{job.n_chunks} in {format_ms(cdt * 1000.0)}")

    t0 = time.perf_counter()
    rendered = job.run(on_chunk=on_chunk)
    dt = time.perf_counter() - t0
    rate = done["frames"] / dt if dt > 0 and done["frames"] else 0.0
    print(f"{rendered}/{job.n_chunks} chunks this run "
          f"({done['frames']} scenes, {rate:.1f} scenes/s) -> {argv[6]}")
    return 0


def cmd_morph(argv) -> int:
    """Morph one galaxy into another: every frame is a parameter-space
    interpolation rendered in ONE batched kernel launch (scene/morph.py).
    Writes <outprefix>_NNN.png per frame plus an animated <outprefix>.gif."""
    if len(argv) != 6:
        print(USAGE)
        return 1
    from PIL import Image

    from .engine.batch import render_batch
    from .scene.morph import morph_scenes

    frames = int(argv[3])
    size = int(argv[4])
    scene = Scene(
        camera=CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0), up=(0, 1, 0),
                            fov=90.0),
        instances=[GalaxyInstance(galaxy=gax.load(argv[1]))],
        config=RenderConfig(size=size, ray_step=0.025),
    )
    try:
        scenes = morph_scenes(scene, gax.load(argv[2]), frames)
        with ScopedTimer(f"{frames}-frame morph"):
            imgs = render_batch(scenes)
    except ValueError as e:
        print(f"morph: {e}")
        return 1
    prefix = argv[5]
    for i, frame in enumerate(imgs):
        Image.fromarray(frame).save(f"{prefix}_{i:03d}.png")
    Image.fromarray(imgs[0]).save(
        f"{prefix}.gif", save_all=True, duration=120, loop=0,
        append_images=[Image.fromarray(f) for f in imgs[1:]])
    print(f"Saved {frames} frames to {prefix}_NNN.png and {prefix}.gif")
    return 0


def cmd_fit(argv) -> int:
    """Gradient-based galaxy fitting (inverse rendering; engine/fit.py).

    Optimizes the named parameter fields of <gax file> so its render from
    the given camera matches <target image>, then writes the fitted galaxy
    to <out gax>. A capability with no reference equivalent — the reference
    matches a look by hand in the Qt editor; here every editor knob is a
    differentiable degree of freedom.
    """
    ckpt = next((a[len("ckpt="):] for a in argv if a.startswith("ckpt=")),
                None)
    march = next((a[len("march="):] for a in argv if a.startswith("march=")),
                 "tensor")
    raw_sweep = next((a[len("sweep="):] for a in argv
                      if a.startswith("sweep=")), None)
    argv = [a for a in argv
            if not (a.startswith("ckpt=") or a.startswith("march=")
                    or a.startswith("sweep="))]
    sweep = 0
    if raw_sweep is not None:
        try:
            sweep = int(raw_sweep)
        except ValueError:
            print(f"bad sweep value {raw_sweep!r} (want an integer). Usage:")
            print(USAGE)
            return 1
        if march != "fd":
            print("fit: sweep= is the staged global search of march=fd")
            return 1
    multiscale = bool(argv) and argv[-1].lower() == "multiscale"
    if multiscale:
        argv = argv[:-1]
    if not 18 <= len(argv) <= 21:
        print(f"{len(argv)}\nIncorrect usage/parameters for fit. Usage:")
        print(USAGE)
        return 1
    import numpy as np
    from PIL import Image

    from .engine.fit import DEFAULT_FIT_FIELDS, fit_scene

    vals = [float(v) for v in argv[1:15]]
    gax_file, target_file, out_file = argv[15], argv[16], argv[17]
    steps = int(argv[18]) if len(argv) > 18 else 100
    lr = float(argv[19]) if len(argv) > 19 else 2e-2
    fields = tuple(argv[20].split(",")) if len(argv) > 20 else DEFAULT_FIT_FIELDS
    if steps < 1:
        print("fit: steps must be >= 1")
        return 1

    target = np.asarray(Image.open(target_file).convert("RGB"))
    if target.shape[0] != target.shape[1]:
        print("fit: target image must be square")
        return 1
    # Full-render sampling (is_preview False), matching what the `galaxy`
    # command produced the target with — a preview-mode fit against a
    # full-render target would bake the coarser near-camera sampling into
    # the fitted parameters as bias.
    scene = Scene(
        camera=CameraParams(camera=tuple(vals[0:3]), target=tuple(vals[3:6]),
                            up=tuple(vals[6:9]), fov=vals[9]),
        instances=[GalaxyInstance(galaxy=gax.load(gax_file))],
        config=RenderConfig(size=target.shape[0], ray_step=vals[13],
                            exposure=vals[10], gamma=vals[11],
                            saturation=vals[12]),
    )
    mode = " [multiscale LOD ladder]" if multiscale else ""
    print(f"Fitting {','.join(fields)} of {gax_file} to {target_file} "
          f"({steps} steps, lr {lr}){mode} ...")
    t0 = time.perf_counter()

    if march == "fd" and multiscale:
        print("fit: march=fd has no multiscale ladder (it needs none — "
              "FD probes are stable at full octaves); drop 'multiscale'")
        return 1
    if march == "fd":
        # central differences through the PRODUCTION kernel — the
        # trustworthy fast path for winding/scale/ks (fit.fit_scene_fd)
        from .engine.fit import fit_scene_fd

        def on_step(i, loss):
            print(f"\r[ step {i + 1}/{steps} ]  loss {loss:.6f} ",
                  end="", flush=True)

        # chaotic fields get the joint winding_b x scale grid stage when
        # both families are fitted (the measured deceptive pair)
        groups = None
        if sweep and "winding_b" in fields and "scale" in fields:
            groups = (("winding_b",), ("scale",))
        result = fit_scene_fd(scene, target, fields, steps=steps, lr=lr,
                              sweep=sweep, sweep_groups=groups,
                              on_step=on_step, checkpoint_path=ckpt)
    elif multiscale:
        from .engine.fit import DEFAULT_SCENE_SCHEDULE, fit_scene_multiscale

        total = steps * len(DEFAULT_SCENE_SCHEDULE)

        def on_step(i, loss):
            print(f"\r[ step {i + 1}/{total} ]  loss {loss:.6f} ",
                  end="", flush=True)

        result = fit_scene_multiscale(scene, target, fields, steps=steps,
                                      lr=lr, on_step=on_step, march=march,
                                      checkpoint_path=ckpt)
    else:
        def on_step(i, loss):
            print(f"\r[ step {i + 1}/{steps} ]  loss {loss:.6f} ",
                  end="", flush=True)

        result = fit_scene(scene, target, fields, steps=steps, lr=lr,
                           on_step=on_step, march=march,
                           checkpoint_path=ckpt)
    print(f"\nloss {result.losses[0]:.6f} -> {result.losses[-1]:.6f} in "
          f"{format_ms((time.perf_counter() - t0) * 1000.0)}")
    gax.save(result.scene.instances[0].galaxy, out_file)
    print(f"Saved fitted galaxy to {out_file}")
    return 0


def cmd_fitpose(argv) -> int:
    """Camera-pose refinement (engine/fit.fit_pose): refine the given
    initial camera toward the pose that produced <target image>, holding
    the galaxy fixed. Writes the fitted scene dict to <out scene.json>.
    Fits at the given noise LOD (see the fit_pose docstring: full-octave
    noise drowns the pose gradient)."""
    ckpt = next((a[len("ckpt="):] for a in argv if a.startswith("ckpt=")),
                None)
    argv = [a for a in argv if not a.startswith("ckpt=")]
    if not 18 <= len(argv) <= 21:
        print(f"{len(argv)}\nIncorrect usage/parameters for fitpose. Usage:")
        print(USAGE)
        return 1
    import numpy as np
    from PIL import Image

    from .engine.fit import fit_pose
    from .scene.schema import scene_to_dict

    vals = [float(v) for v in argv[1:15]]
    gax_file, target_file, out_file = argv[15], argv[16], argv[17]
    steps = int(argv[18]) if len(argv) > 18 else 80
    lr = float(argv[19]) if len(argv) > 19 else 1e-2
    lod_arg = argv[20] if len(argv) > 20 else "3"
    multiscale = lod_arg.lower() == "multiscale"
    use_fd = lod_arg.lower() == "fd"
    lod = 3 if multiscale or use_fd else int(lod_arg)
    if steps < 1:
        print("fitpose: steps must be >= 1")
        return 1

    target = np.asarray(Image.open(target_file).convert("RGB"))
    if target.shape[0] != target.shape[1]:
        print("fitpose: target image must be square")
        return 1
    scene = Scene(
        camera=CameraParams(camera=tuple(vals[0:3]), target=tuple(vals[3:6]),
                            up=tuple(vals[6:9]), fov=vals[9]),
        instances=[GalaxyInstance(galaxy=gax.load(gax_file))],
        config=RenderConfig(size=target.shape[0], ray_step=vals[13],
                            exposure=vals[10], gamma=vals[11],
                            saturation=vals[12], is_preview=True,
                            noise_octaves=None if multiscale or use_fd
                            else lod),
    )
    if use_fd:
        # finite-difference probes through the production kernel: full
        # octaves, no LOD ladder (fit_pose_fd docstring)
        from .engine.fit import fit_pose_fd

        print(f"Refining camera pose toward {target_file} "
              f"({steps} FD steps at full quality, lr {lr}) ...")
        t0 = time.perf_counter()

        def on_step(i, loss):
            print(f"\r[ step {i + 1}/{steps} ]  loss {loss:.6f} ",
                  end="", flush=True)

        result = fit_pose_fd(scene, target, ("camera",), steps=steps,
                             lr=lr, on_step=on_step, checkpoint_path=ckpt)
    elif multiscale:
        from .engine.fit import DEFAULT_POSE_SCHEDULE, fit_pose_multiscale

        total = steps * len(DEFAULT_POSE_SCHEDULE)
        print(f"Refining camera pose toward {target_file} "
              f"({steps} steps/rung over LOD schedule "
              f"{[s[0] or 'exact' for s in DEFAULT_POSE_SCHEDULE]}, lr {lr}) ...")
        t0 = time.perf_counter()

        def on_step(i, loss):
            print(f"\r[ step {i + 1}/{total} ]  loss {loss:.6f} ",
                  end="", flush=True)

        result = fit_pose_multiscale(scene, target, ("camera",), steps=steps,
                                     lr=lr, on_step=on_step,
                                     checkpoint_path=ckpt)
    else:
        print(f"Refining camera pose toward {target_file} "
              f"({steps} steps, lr {lr}, noise LOD {lod}) ...")
        t0 = time.perf_counter()

        def on_step(i, loss):
            print(f"\r[ step {i + 1}/{steps} ]  loss {loss:.6f} ",
                  end="", flush=True)

        result = fit_pose(scene, target, ("camera",), steps=steps, lr=lr,
                          on_step=on_step, checkpoint_path=ckpt)
    cam = result.scene.camera
    print(f"\nloss {result.losses[0]:.6f} -> {min(result.losses):.6f} in "
          f"{format_ms((time.perf_counter() - t0) * 1000.0)}")
    print(f"fitted camera: ({cam.camera[0]:.4f}, {cam.camera[1]:.4f}, "
          f"{cam.camera[2]:.4f})")
    out = out_file if out_file.endswith(".json") else out_file + ".json"
    with open(out, "w") as fh:
        json.dump(scene_to_dict(result.scene), fh, indent=2)
    print(f"Saved fitted scene to {out}")
    return 0


def cmd_fitjoint(argv) -> int:
    """Joint camera + parameter fitting (engine/fit.fit_joint): an image
    whose camera AND galaxy parameters are both unknown — block-coordinate
    descent alternating fit_pose_multiscale ladders and fit_scene blocks.
    Writes the fitted scene dict to <out scene.json> and the fitted galaxy
    to <out>.gax. No reference equivalent (the reference hand-tunes both
    in the GUI, mainwindow.cpp tabs)."""
    ckpt = next((a[len("ckpt="):] for a in argv if a.startswith("ckpt=")),
                None)
    march = next((a[len("march="):] for a in argv if a.startswith("march=")),
                 "frozen")
    pose_method = next((a[len("pose="):] for a in argv
                        if a.startswith("pose=")), "multiscale")
    fields_arg = next((a[len("fields="):] for a in argv
                       if a.startswith("fields=")), None)
    argv = [a for a in argv
            if not (a.startswith("ckpt=") or a.startswith("march=")
                    or a.startswith("pose=") or a.startswith("fields="))]
    if not 18 <= len(argv) <= 21:
        print(f"{len(argv)}\nIncorrect usage/parameters for fitjoint. Usage:")
        print(USAGE)
        return 1
    import numpy as np
    from PIL import Image

    from .engine.fit import (DEFAULT_FIT_FIELDS, DEFAULT_POSE_SCHEDULE,
                             fit_joint)
    from .scene.schema import scene_to_dict

    vals = [float(v) for v in argv[1:15]]
    gax_file, target_file, out_file = argv[15], argv[16], argv[17]
    rounds = int(argv[18]) if len(argv) > 18 else 2
    pose_steps = int(argv[19]) if len(argv) > 19 else 30
    scene_steps = int(argv[20]) if len(argv) > 20 else 60
    fields = tuple(fields_arg.split(",")) if fields_arg else DEFAULT_FIT_FIELDS
    if rounds < 1 or pose_steps < 1 or scene_steps < 1:
        print("fitjoint: rounds/posesteps/scenesteps must be >= 1")
        return 1

    target = np.asarray(Image.open(target_file).convert("RGB"))
    if target.shape[0] != target.shape[1]:
        print("fitjoint: target image must be square")
        return 1
    scene = Scene(
        camera=CameraParams(camera=tuple(vals[0:3]), target=tuple(vals[3:6]),
                            up=tuple(vals[6:9]), fov=vals[9]),
        instances=[GalaxyInstance(galaxy=gax.load(gax_file))],
        config=RenderConfig(size=target.shape[0], ray_step=vals[13],
                            exposure=vals[10], gamma=vals[11],
                            saturation=vals[12]),
    )
    pose_block = (pose_steps * len(DEFAULT_POSE_SCHEDULE)
                  if pose_method == "multiscale" else pose_steps)
    total = rounds * (pose_block + scene_steps)
    print(f"Jointly fitting camera + {','.join(fields)} of {gax_file} to "
          f"{target_file} ({rounds} rounds, {pose_steps} pose + "
          f"{scene_steps} scene steps/round, march={march}, "
          f"pose={pose_method}) ...")
    t0 = time.perf_counter()

    def on_step(i, loss):
        print(f"\r[ step {i + 1}/{total} ]  loss {loss:.6f} ",
              end="", flush=True)

    result = fit_joint(scene, target, fields, rounds=rounds,
                       pose_steps=pose_steps, scene_steps=scene_steps,
                       march=march, pose_method=pose_method,
                       on_step=on_step, checkpoint_path=ckpt)
    cam = result.scene.camera
    print(f"\nloss {result.losses[0]:.6f} -> {min(result.losses):.6f} in "
          f"{format_ms((time.perf_counter() - t0) * 1000.0)}")
    print(f"fitted camera: ({cam.camera[0]:.4f}, {cam.camera[1]:.4f}, "
          f"{cam.camera[2]:.4f})")
    out = out_file if out_file.endswith(".json") else out_file + ".json"
    with open(out, "w") as fh:
        json.dump(scene_to_dict(result.scene), fh, indent=2)
    gax_out = out[:-len(".json")] + ".gax"
    gax.save(result.scene.instances[0].galaxy, gax_out)
    print(f"Saved fitted scene to {out} and fitted galaxy to {gax_out}")
    return 0


def _backend_desc(method: str) -> str:
    if method == "oracle":
        return "the spec-exact CPU oracle"
    try:
        import jax

        d = jax.devices()
        return f"{len(d)} {d[0].platform.upper()} device(s)"
    except Exception:  # noqa: BLE001
        return "the default backend"


def cmd_serve(argv) -> int:
    """HTTP render service (POST /render with a scene dict; concurrent
    requests sharing a structure batch into ONE device launch — serve.py).
    A trailing 'mesh' serves over ALL attached devices: single frames
    row-sharded, batches/animations sharded on the batch axis. A
    'warm=FILE.gax[:SIZE,SIZE...]' token pre-compiles that galaxy's launch
    shapes (single path + pad buckets) at startup, so the first client at
    each size never pays a cold compile. 'maxbatch=N' caps how many
    compatible requests merge into one launch (latency/throughput dial —
    serve.py RenderService docstring)."""
    from .serve import serve

    args = argv[1:]
    use_mesh = any(a.lower() == "mesh" for a in args)
    warm = next((a[len("warm="):] for a in args if a.startswith("warm=")),
                None)
    raw_maxbatch = next((a[len("maxbatch="):] for a in args
                         if a.startswith("maxbatch=")), None)
    max_batch = None
    if raw_maxbatch is not None:
        try:
            max_batch = int(raw_maxbatch)
        except ValueError:
            print(f"bad maxbatch value {raw_maxbatch!r} (want an integer). "
                  "Usage:")
            print(USAGE)
            return 1
    args = [a for a in args
            if a.lower() != "mesh" and not a.startswith("warm=")
            and not a.startswith("maxbatch=")]
    port = int(args[0]) if len(args) > 0 else 8100
    window = float(args[1]) if len(args) > 1 else 0.05
    bands = int(args[2]) if len(args) > 2 else 8
    mesh = None
    if use_mesh:
        from .parallel import make_pixel_mesh

        mesh = make_pixel_mesh()
        print(f"serving over a {mesh.devices.size}-device mesh")
    warm_submit = None
    if warm is not None:
        path, _, size_csv = warm.partition(":")
        sizes = [int(s) for s in size_csv.split(",")] if size_csv else None
        scene = Scene(
            camera=CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                up=(0, 1, 0), fov=90.0),
            instances=[GalaxyInstance(galaxy=gax.load(path))],
            config=RenderConfig(size=sizes[0] if sizes else 512,
                                ray_step=0.025),
        )

        def warm_submit(service):
            jid = service.submit_warm(scene, sizes=sizes)
            print(f"warming {path} at sizes {sizes or [scene.config.size]} "
                  f"(job {jid})")

    serve(port, window, bands, mesh=mesh, on_start=warm_submit,
          max_batch=max_batch)
    return 0


def cmd_viewer(argv) -> int:
    """Interactive HTTP viewer (orbit/zoom/LOD/live edits — viewer.py)."""
    from .viewer import serve as viewer_serve

    args = argv[1:]
    port = int(args[0]) if len(args) > 0 else 8000
    size = int(args[1]) if len(args) > 1 else 256
    gax_dir = args[2] if len(args) > 2 else None
    viewer_serve(port, size, gax_dir)
    return 0


COMMANDS = {
    "galaxy": cmd_galaxy,
    "skybox": cmd_skybox,
    "renderhpx": cmd_renderhpx,
    "allsky": cmd_allsky,
    "render": cmd_render,
    "info": cmd_info,
    "flythrough": cmd_flythrough,
    "morph": cmd_morph,
    "fit": cmd_fit,
    "fitpose": cmd_fitpose,
    "fitjoint": cmd_fitjoint,
    "scene": cmd_scene,
    "dataset": cmd_dataset,
    "serve": cmd_serve,
    "viewer": cmd_viewer,
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    print("Welcome to gamer-tpu (GAMER-compatible TPU galaxy renderer)\n")
    # Persistent compile cache: a slow-compile tunnel hour is paid at most
    # once per program shape across all CLI invocations (VERDICT r2 #1).
    from .utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if not argv:
        print(USAGE)
        return 0
    handler = COMMANDS.get(argv[0].lower())
    if handler is None:
        print(USAGE)
        return 0
    return handler(argv)


if __name__ == "__main__":
    raise SystemExit(main())
