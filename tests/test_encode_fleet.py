"""Fleet encode: claim protocol and multi-process CPU fan-out."""

import json
import os
import shutil
import subprocess
import sys
import time

import pytest

from cbas_tpu.tools.encode_fleet import claim_path, release_claim, try_claim

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "examples", "demo_project")


def test_claim_is_exclusive_until_released(tmp_path):
    video = str(tmp_path / "cam_00001.mp4")
    open(video, "w").close()
    assert try_claim(video, ttl_s=3600)
    assert not try_claim(video, ttl_s=3600)  # second claimer loses
    release_claim(video)
    assert try_claim(video, ttl_s=3600)  # released -> claimable again
    release_claim(video)


def test_stale_claim_is_broken(tmp_path):
    video = str(tmp_path / "cam_00001.mp4")
    open(video, "w").close()
    assert try_claim(video, ttl_s=3600)
    old = time.time() - 7200
    os.utime(claim_path(video), (old, old))  # crashed-worker leftover
    assert try_claim(video, ttl_s=3600)  # TTL elapsed -> broken and re-owned
    release_claim(video)


@pytest.mark.slow
def test_two_cpu_workers_drain_the_demo_project(tmp_path):
    """Parent scans, two single-chip(-equivalent) worker processes drain the
    manifest via claims, every video ends up freshly stamped, no claim files
    are left behind."""
    root = str(tmp_path / "demo")
    shutil.copytree(DEMO, root)

    out = subprocess.run(
        [sys.executable, "-m", "cbas_tpu.tools.encode_fleet",
         "--project", root, "--workers", "2", "--force-cpu", "--batch", "64"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    summary = lines[-1]
    assert summary["fleet_done"] and summary["workers"] == 2
    assert summary["videos"] == 8 and summary["still_stale"] == 0

    per_file = [l for l in lines if "h5" in l]
    worker_tallies = [l for l in lines if "worker_done" in l]
    assert len(per_file) == 8 and all(l["fps"] > 0 for l in per_file)
    assert sum(w["encoded"] for w in worker_tallies) == 8
    assert sum(w["failed"] for w in worker_tallies) == 0

    from cbas_tpu.core.project import Project

    proj = Project(root)
    assert proj.stale_or_missing_embeddings() == []
    leftovers = [f for _, _, fs in os.walk(root) for f in fs if f.endswith(".claim")]
    assert leftovers == []

    # classify mode over the same fan-out: every H5 gains the committed
    # model's outputs CSV exactly once
    out = subprocess.run(
        [sys.executable, "-m", "cbas_tpu.tools.encode_fleet",
         "--project", root, "--workers", "2", "--force-cpu",
         "--model", "demo_behaviors_model"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert lines[-1]["still_stale"] == 0
    per_file = [l for l in lines if "csv" in l]
    assert len(per_file) == 8 and all(os.path.exists(l["csv"]) for l in per_file)
    tallies = [l for l in lines if "worker_done" in l]
    assert sum(w["classified"] for w in tallies) == 8
    leftovers = [f for _, _, fs in os.walk(root) for f in fs
                 if f.endswith(".claim") or f.endswith(".csv.tmp")]
    assert leftovers == []

    # same-name retrain: weights newer than every CSV -> all 8 are stale and
    # the workers must RE-classify them, not skip on bare CSV existence
    # (the skip rule must match the parent scan's outputs_csv_is_stale)
    model_dir = os.path.join(root, "models", "demo_behaviors_model")
    now = time.time()
    for fname in ("model.npz", "model.pth"):
        wp = os.path.join(model_dir, fname)
        if os.path.exists(wp):
            os.utime(wp, (now, now))  # "retrained" just now
    for l in per_file:  # CSVs predate the retrain
        os.utime(l["csv"], (now - 1000, now - 1000))
    out = subprocess.run(
        [sys.executable, "-m", "cbas_tpu.tools.encode_fleet",
         "--project", root, "--workers", "2", "--force-cpu",
         "--model", "demo_behaviors_model"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert lines[-1]["still_stale"] == 0
    tallies = [l for l in lines if "worker_done" in l]
    assert sum(w["classified"] for w in tallies) == 8, (
        "stale CSVs after a retrain were skipped instead of re-classified"
    )


def test_claim_contention_exactly_one_winner(tmp_path):
    """N threads racing for the same claim: exactly one wins per round, even
    when rounds are interleaved with releases and stale-claim breaking."""
    import threading

    from cbas_tpu.utils.claims import release_claim_path, try_claim_path

    path = str(tmp_path / "work.claim")
    for round_no in range(20):
        wins = []
        barrier = threading.Barrier(8)

        def racer():
            barrier.wait()
            if try_claim_path(path, ttl_s=3600):
                wins.append(1)

        threads = [threading.Thread(target=racer) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(wins) == 1, f"round {round_no}: {len(wins)} winners"
        if round_no % 2:
            release_claim_path(path)  # next round contends on a fresh file
        else:
            old = time.time() - 7200  # next round must break a stale claim
            os.utime(path, (old, old))
    leftovers = [f for f in os.listdir(tmp_path) if f.endswith(".break")]
    assert leftovers == [], "breaker guards must clean up after themselves"


def test_claim_heartbeat_keeps_live_lease_from_aging_out(tmp_path):
    """A worker whose single item outlives the TTL must not lose its LIVE
    lease (a second worker would truncate the same output under it); once the
    owner stops heartbeating, the lease ages out normally (r3 review
    finding)."""
    import time as _time

    from cbas_tpu.utils.claims import ClaimHeartbeat, try_claim_path

    claim = str(tmp_path / "out_cls.h5.claim")
    ttl = 0.6
    assert try_claim_path(claim, ttl_s=ttl)
    hb = ClaimHeartbeat(claim, ttl)
    hb.interval_s = 0.1  # the production floor is 5 s; tighten for the test
    with hb:
        _time.sleep(2 * ttl)  # well past the TTL while the owner is alive
        assert not try_claim_path(claim, ttl_s=ttl)  # lease still held
    _time.sleep(2 * ttl)  # heartbeat stopped: the lease may now age out
    assert try_claim_path(claim, ttl_s=ttl)
