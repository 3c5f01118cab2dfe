"""Dataset job runner (checkpoint/resume) + profiling counters."""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import pytest

import gamer_tpu
from gamer_tpu.engine.jobs import DatasetJob
from gamer_tpu.scene import gax
from gamer_tpu.scene.generate import generate_galaxy_variations
from gamer_tpu.utils.profiling import RenderStats


def _scenes(fixtures_dir, n):
    g = gax.load(fixtures_dir / "VortexCloud.gax")
    base = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[],
        config=gamer_tpu.RenderConfig(size=16, ray_step=0.025),
    )
    return [
        dataclasses.replace(base, instances=[gamer_tpu.GalaxyInstance(galaxy=v)])
        for v in generate_galaxy_variations(g, n, seed=5)
    ]


def test_dataset_job_runs_and_resumes(tmp_path, fixtures_dir):
    scenes = _scenes(fixtures_dir, 6)
    job = DatasetJob(scenes, tmp_path / "job", chunk_size=2)
    assert job.n_chunks == 3

    # render one chunk, then simulate an interruption
    count = {"n": 0}

    def interrupt(c, dt):
        count["n"] += 1
        if count["n"] == 1:
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        job.run(on_chunk=interrupt)
    manifest = json.loads((tmp_path / "job" / "manifest.json").read_text())
    assert len(manifest["done"]) == 1

    # resume: a NEW job object picks up where it stopped
    job2 = DatasetJob(scenes, tmp_path / "job", chunk_size=2)
    assert len(job2.remaining) == 2
    rendered = job2.run()
    assert rendered == 2

    full = job2.load_all()
    assert full.shape == (6, 16, 16, 3)
    assert all(int(f.sum()) > 0 for f in full)


def _mixed_scenes(fixtures_dir, n_per: int):
    """Template-major heterogeneous corpus (the CLI dataset gax-list
    path): n variations of VortexCloud then n of Sombrero."""
    out = []
    for t, name in enumerate(("VortexCloud", "Sombrero")):
        g = gax.load(fixtures_dir / f"{name}.gax")
        base = gamer_tpu.Scene(
            camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0),
                                          target=(0, 0, 0),
                                          up=(0, 1, 0), fov=90.0),
            instances=[],
            config=gamer_tpu.RenderConfig(size=16, ray_step=0.025),
        )
        out += [
            dataclasses.replace(
                base, instances=[gamer_tpu.GalaxyInstance(galaxy=v)])
            for v in generate_galaxy_variations(g, n_per, seed=5 + t)
        ]
    return out


def test_dataset_job_mixed_structures_chunking(tmp_path, fixtures_dir):
    """Heterogeneous corpus (VERDICT r4 item 7): a chunk straddling the
    structure boundary renders per-group (render_batch groups by compiled
    static) and every frame is bitwise-equal to its single-scene render;
    SIGKILL-resume across the boundary chunk is bitwise too."""
    from gamer_tpu.engine.batch import render_batch
    from gamer_tpu.engine.scene_prep import flatten_scene

    scenes = _mixed_scenes(fixtures_dir, 3)  # 6 scenes, 2 structures
    assert len({flatten_scene(s)[0] for s in scenes}) == 2
    # chunk 1 (scenes 2..3) straddles the VortexCloud/Sombrero boundary
    job = DatasetJob(scenes, tmp_path / "mixed", chunk_size=2)
    assert job.run() == 3
    frames = job.load_all()
    assert frames.shape == (6, 16, 16, 3)
    for i in (1, 2, 3, 4):  # around the boundary, incl. the mixed chunk
        single = np.asarray(render_batch([scenes[i]]))[0]
        np.testing.assert_array_equal(frames[i], single)

    # SIGKILL after the first chunk: a fresh job resumes and the combined
    # dataset equals the uninterrupted run bitwise, boundary chunk included
    job2 = DatasetJob(scenes, tmp_path / "mixed2", chunk_size=2)
    first = job2.remaining[0]
    lo = first * job2.chunk_size
    np.save(job2.out_dir / f"chunk_{first:05d}.npy",
            render_batch(scenes[lo:lo + 2]))
    job2.manifest["done"].append(first)
    job2._save_manifest()
    job3 = DatasetJob(scenes, tmp_path / "mixed2", chunk_size=2)
    assert job3.remaining == [1, 2]
    job3.run()
    np.testing.assert_array_equal(job3.load_all(), frames)


def test_dataset_job_manifest_mismatch(tmp_path, fixtures_dir):
    scenes = _scenes(fixtures_dir, 4)
    job = DatasetJob(scenes, tmp_path / "j2", chunk_size=2)
    job.run()
    with pytest.raises(ValueError, match="manifest does not match"):
        DatasetJob(scenes[:2], tmp_path / "j2", chunk_size=2)


def test_render_stats_counters():
    import time

    st = RenderStats(samples_per_pixel=1000.0)
    with st.frame(256 * 256):
        time.sleep(0.01)
    s = st.summary()
    assert s["frames"] == 1
    assert s["rays_per_sec"] > 0
    assert s["msamples_per_sec"] == pytest.approx(
        s["rays_per_sec"] * 1000 / 1e6, rel=0.01)
