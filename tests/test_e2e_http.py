"""End-to-end over the WIRE: the full product loop driven through HTTP.

This is the /verify recipe as a test — a fresh copy of the committed demo
project, a real RpcServer, and every stage exercised through the same JSON
RPCs the frontend issues: project load -> stale sweep re-encode -> training
-> batch classification -> review labeling (+ confidence refilter) ->
actogram/ethogram. The reference has no equivalent automated check; its
closest analogue is a human clicking through the Eel UI.
"""

import json
import os
import shutil
import time
import urllib.request

import pytest

cv2 = pytest.importorskip("cv2")

from cbas_tpu.app.api import Api
from cbas_tpu.app.server import RpcServer

DEMO = os.path.join(os.path.dirname(__file__), "..", "examples", "demo_project")


def _rpc(port, method, *args, **kwargs):
    payload = {"args": list(args)}
    if kwargs:
        payload["kwargs"] = kwargs
    req = urllib.request.Request(
        f"http://localhost:{port}/api/{method}",
        data=json.dumps(payload).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        doc = json.loads(resp.read())
    assert "error" not in doc, doc
    return doc.get("result")


@pytest.mark.slow
def test_full_product_loop_over_http(tmp_path):
    proj_dir = str(tmp_path / "demo")
    shutil.copytree(DEMO, proj_dir)

    api = Api()
    srv = RpcServer(api)
    srv.start()
    try:
        port = srv.port
        res = _rpc(port, "load_project", proj_dir)
        assert res["success"], res

        # stale sweep queued the 8 demo videos; wait for the encoder
        deadline = time.time() + 420
        while time.time() < deadline:
            q = _rpc(port, "get_encoding_queue_status")
            if q["total"] >= 8 and q["done"] == q["total"]:
                break
            time.sleep(3)
        else:
            pytest.fail(f"encode queue never drained: {q}")

        # train a tiny head on the committed labels
        assert _rpc(port, "train_model", "demo_behaviors",
                    epochs=2, sequence_length=15, lstm_hidden_size=16,
                    batch_size=64, learning_rate=0.003, num_runs=1,
                    num_trials=1, use_test=False, patience=3)
        model_dir = os.path.join(proj_dir, "models", "demo_behaviors_model")
        deadline = time.time() + 420
        marker = os.path.join(model_dir, "model.npz")
        t0 = os.path.getmtime(marker)
        while time.time() < deadline:
            if os.path.getmtime(marker) > t0:  # retrained over the shipped bundle
                break
            time.sleep(3)
        else:
            pytest.fail("training never wrote a fresh model.npz")

        # batch classification over every encoded file
        n = _rpc(port, "start_classification", "demo_behaviors_model",
                 [os.path.join(proj_dir, "recordings")])
        assert n == 8
        deadline = time.time() + 420
        while time.time() < deadline:
            csvs = [os.path.join(r, f)
                    for r, _, fs in os.walk(proj_dir) for f in fs
                    if f.endswith("_demo_behaviors_model_outputs.csv")]
            if len(csvs) >= 8:
                break
            time.sleep(3)
        else:
            pytest.fail("classification CSVs never appeared")

        # review labeling session with model preload + both refilter modes
        video = "recordings/sess1/mouse0/mouse0_00001.mp4"
        assert _rpc(port, "start_labeling_with_preload",
                    "demo_behaviors", "demo_behaviors_model", video, 0)
        assert _rpc(port, "refilter_instances", 50, "above")
        assert _rpc(port, "refilter_instances", 50, "below")

        # actogram + ethogram from the fresh predictions
        acto = _rpc(port, "generate_actograms",
                    os.path.join(proj_dir, "recordings", "sess1"), "mouse0",
                    "demo_behaviors_model", ["active"], 0.0116, 60, 0, 0.5,
                    "LD", False, 1)
        assert acto and len(acto.get("active", "")) > 1000  # a real base64 PNG
        etho = _rpc(port, "generate_ethogram", csvs[0], 10)
        assert etho and len(etho) > 1000
    finally:
        try:
            api.kill_all_processes()
        except Exception:
            pass
        srv.stop()
