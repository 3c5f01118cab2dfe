"""bench.py's streaming-ladder control flow (the judged-number harness).

The real children compile on a TPU; here _STREAM_SNIPPET is swapped for
tiny stand-ins so the parent's restart/retry/give-up/watchdog logic is
exercised deterministically: that logic is what decides whether a slow
tunnel hour costs one rung or the whole headline (VERDICT r2 weak #1).
"""

from __future__ import annotations

import json

import pytest

import bench


@pytest.fixture
def fake_child(monkeypatch):
    """Replace the stream child with a script body; sizes arrive in argv."""

    def install(body: str):
        monkeypatch.setattr(bench, "_CACHE_PREFIX", "")
        monkeypatch.setattr(bench, "_STREAM_SNIPPET", body)

    return install


def test_stream_ladder_happy_path(fake_child):
    fake_child("""
import json, sys
for s in sys.argv[1:]:
    print(json.dumps({"ok": True, "size": int(s), "dt": 0.5}), flush=True)
""")
    results = bench._stream_ladder((512, 4096, 2048), global_budget_s=30)
    assert [r["size"] for r in results] == [512, 4096, 2048]


def test_stream_ladder_restarts_after_crash(fake_child, tmp_path):
    # First child banks 512 then dies on 4096; the restart (state file now
    # present) walks the REMAINING sizes — the killed rung gets its retry.
    state = tmp_path / "crashed_once"
    fake_child(f"""
import json, os, sys
for s in sys.argv[1:]:
    s = int(s)
    if s == 4096 and not os.path.exists({str(state)!r}):
        open({str(state)!r}, "w").close()
        sys.exit(1)
    print(json.dumps({{"ok": True, "size": s, "dt": 0.5}}), flush=True)
""")
    results = bench._stream_ladder((512, 4096, 2048), global_budget_s=30)
    assert [r["size"] for r in results] == [512, 4096, 2048]


def test_stream_ladder_gives_up_after_two_attempts(fake_child):
    # 4096 crashes every time: two attempts, then it is skipped and the
    # rest of the ladder still lands (one rung must never cost the rest).
    fake_child("""
import json, sys
for s in sys.argv[1:]:
    s = int(s)
    if s == 4096:
        sys.exit(1)
    print(json.dumps({"ok": True, "size": s, "dt": 0.5}), flush=True)
""")
    results = bench._stream_ladder((512, 4096, 2048), global_budget_s=30)
    assert [r["size"] for r in results] == [512, 2048]


def test_stream_ladder_inactivity_watchdog(fake_child):
    # A child that prints nothing within inactivity_s is hung (a wedged
    # tunnel hangs rather than failing): killed, retried once, given up.
    fake_child("""
import time
time.sleep(60)
""")
    results = bench._stream_ladder((64,), global_budget_s=20,
                                   inactivity_s=0.5)
    assert results == []


def test_stream_ladder_respects_global_budget(fake_child):
    # Budget exhausted mid-ladder: keep what landed, never block past it.
    # inactivity_s > global_budget_s makes the sequence deterministic even
    # on a saturated box: rung 1's line lands (any startup < the budget),
    # then the parent sleeps straight to the deadline — the watchdog can
    # never fire first and hand the remaining budget to a restarted child
    # (with the old 3 s budget, a loaded box could exceed it with python
    # startup alone and the rung was misclassified as hung).
    fake_child("""
import json, sys, time
sizes = [int(s) for s in sys.argv[1:]]
print(json.dumps({"ok": True, "size": sizes[0], "dt": 0.5}), flush=True)
time.sleep(60)
""")
    results = bench._stream_ladder((512, 4096), global_budget_s=15,
                                   inactivity_s=60)
    assert [r["size"] for r in results] == [512]


def test_stream_ladder_ignores_tunnel_noise(fake_child):
    # The axon plugin writes diagnostics to stdout; non-JSON lines and
    # malformed JSON must be skipped, not crash the parent.
    fake_child("""
import json, sys
print("axon: tunnel established", flush=True)
print("{not json", flush=True)
print(json.dumps({"ok": True, "size": 64, "dt": 0.5}), flush=True)
""")
    results = bench._stream_ladder((64,), global_budget_s=30)
    assert [r["size"] for r in results] == [64]
