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
