"""The reference frontend carry-over contract, proven against a stub Eel.

Three contracts let `/root/reference/frontend/` + `main.js` drive this
backend unchanged:

1. JS -> Python: every reference ``@eel.expose`` function name binds
   (backend/app.py:40-383).
2. Python -> JS: every emission from the workers' ``Callbacks`` fan-out is
   forwarded to ``eel.<jsFunc>(*args)()`` — the names the reference pages
   register via JS-side ``eel.expose`` (frontend/js/*.js).
3. Shell: stdout carries ``Eel server starting on http://localhost:<port>``
   which main.js:87 scrapes to load the window.
"""

import glob
import os
import re
import subprocess
import sys
import threading
import types

import pytest

from cbas_tpu.app.api import Api, bind_eel, bridge_callbacks_to_eel
from cbas_tpu.app.state import AppState

REFERENCE = os.environ.get("CBAS_REFERENCE_DIR", "/root/reference")

# The cross-inventory tests diff our API against the reference checkout; on
# machines without it they skip rather than fail (the API surface itself is
# still covered by test_api.py / test_frontend.py).
needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "backend")),
    reason="reference checkout not available (set CBAS_REFERENCE_DIR)",
)


def reference_python_exposures():
    names = set()
    for path in glob.glob(os.path.join(REFERENCE, "backend", "*.py")) + glob.glob(
        os.path.join(REFERENCE, "*.py")
    ):
        with open(path, encoding="utf-8") as f:
            src = f.read()
        names |= set(re.findall(r"@eel\.expose\s*\ndef\s+([A-Za-z_0-9]+)", src))
    return names


def reference_js_callbacks():
    names = set()
    for path in glob.glob(os.path.join(REFERENCE, "frontend", "js", "*.js")):
        with open(path, encoding="utf-8") as f:
            src = f.read()
        names |= set(re.findall(r"eel\.expose\(([A-Za-z_0-9]+)", src))
    return names


class _JsHandle:
    """eel.<fn>(*args) returns a handle; calling it dispatches the JS call."""

    def __init__(self, stub, name, args):
        self.stub, self.name, self.args = stub, name, args

    def __call__(self, *callback):
        self.stub.js_calls.append((self.name, self.args))


class EelStub(types.ModuleType):
    def __init__(self):
        super().__init__("eel")
        self.exposed = {}
        self.js_calls = []
        self.init_dir = None
        self.start_args = None

    def _expose(self, name, fn):
        self.exposed[name] = fn

    def init(self, directory, **kw):
        self.init_dir = directory

    def start(self, *a, **kw):
        self.start_args = (a, kw)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return lambda *args: _JsHandle(self, name, args)


@pytest.fixture
def eel_stub(monkeypatch):
    stub = EelStub()
    monkeypatch.setitem(sys.modules, "eel", stub)
    return stub


@needs_reference
def test_reference_inventories_nonempty():
    assert len(reference_python_exposures()) == 78
    assert len(reference_js_callbacks()) >= 25


@needs_reference
def test_bind_eel_exposes_every_reference_function(eel_stub):
    api = Api(AppState())
    assert bind_eel(api)
    missing = reference_python_exposures() - set(eel_stub.exposed)
    assert not missing, f"reference @eel.expose functions not bound: {sorted(missing)}"


@needs_reference
def test_bridge_forwards_every_js_callback_name(eel_stub):
    """Every reference JS receiver is reachable through the bridge: verbatim
    for pass-through events, via _EEL_ADAPTERS for the shape-translated ones
    (whose payload fidelity test_reference_frontend_compat.py covers)."""
    from cbas_tpu.app.api import _EEL_ADAPTERS

    api = Api(AppState())
    bridge_callbacks_to_eel(api, eel_module=eel_stub)
    adapted_targets = {
        js_name
        for fn in _EEL_ADAPTERS.values()
        for js_name, _ in _probe_adapter(fn)
    }
    for i, name in enumerate(sorted(reference_js_callbacks())):
        if name in _EEL_ADAPTERS or name in adapted_targets:
            continue
        api.state.callbacks.emit(name, f"arg{i}", i)
    got = {name: args for name, args in eel_stub.js_calls}
    for i, name in enumerate(sorted(reference_js_callbacks())):
        if name in _EEL_ADAPTERS or name in adapted_targets:
            assert name in adapted_targets, f"adapter dropped '{name}'"
            continue
        assert got.get(name) == (f"arg{i}", i), f"callback '{name}' not delivered"


def _probe_adapter(fn):
    """Drive an adapter with a representative production payload so its
    target receiver names can be enumerated."""
    payload = {
        "frame": "b64", "frame_index": 1, "total_frames": 10,
        "video_name": "v.mp4", "timeline": [-1, 0], "zoom_timeline": [0],
        "zoom_start": 0.0, "zoom_end": 5.0, "behaviors": ["walk"],
        "colors": ["#1f77b4"], "pending": {"type": -1, "start": -1},
        "confirmation_mode": False, "counts": {"walk": 0},
        "instance_counts": {"walk": 0},
    }
    for probe in ((payload,), ({"walk": "b64"}, 1), (1, 2, 50.0), ("line",)):
        try:
            return fn(probe)
        except Exception:
            continue
    return []


def test_bridge_survives_js_side_errors(eel_stub, capsys):
    api = Api(AppState())
    bridge_callbacks_to_eel(api, eel_module=eel_stub)

    def boom(*args):
        raise RuntimeError("websocket gone")

    eel_stub.updateTrainingStatusOnUI = boom  # shadow __getattr__
    api.state.callbacks.emit("updateTrainingStatusOnUI", "d", "msg")  # must not raise
    api.state.callbacks.emit("notify_new_data_available")
    assert ("notify_new_data_available", ()) in eel_stub.js_calls


def test_worker_emission_reaches_js_end_to_end(eel_stub, monkeypatch, tmp_path):
    """EncodeWorker -> Callbacks -> bridge -> eel stub, the full in-process path."""
    from cbas_tpu.app import workers as workers_mod

    st = AppState()
    st.encoder = object()  # the worker only checks for presence

    api = Api(st)
    bridge_callbacks_to_eel(api, eel_module=eel_stub)

    def fake_encode_file(encoder, path, progress_callback=None, config=None, **kw):
        if progress_callback:
            progress_callback(50.0)
        return path + "_cls.h5"

    monkeypatch.setattr(workers_mod, "encode_file", fake_encode_file)
    worker = workers_mod.EncodeWorker(st)
    video = str(tmp_path / "v.mp4")
    st.encode_tasks.append(video)
    st.note_encode_queued()
    assert worker.process_one()

    # The bridge delivers the reference's single status-object shape
    # (frontend/js/global.js:22; backend/workthreads.py:298-314).
    progress_calls = [
        args[0] for name, args in eel_stub.js_calls
        if name == "update_global_encoding_progress"
    ]
    assert {  # mid-file progress
        "overall_processed": 0, "overall_total": 1, "current_percent": 50.0,
    } in progress_calls
    assert {  # completion
        "overall_processed": 1, "overall_total": 1, "current_percent": 100.0,
    } in progress_calls


def test_main_eel_mode_wires_bridge_and_prints_contract(eel_stub, tmp_path, capsys):
    """An eel-style frontend (pages loading /eel.js, i.e. the reference UI)
    switches main() into eel mode; the bundled JSON-RPC frontend must NOT
    (its /api fetches would 404 under eel's server)."""
    from cbas_tpu.app.main import _frontend_uses_eel, main

    frontend = tmp_path / "frontend"
    frontend.mkdir()
    (frontend / "index.html").write_text(
        '<html><script src="/eel.js"></script></html>'
    )
    assert _frontend_uses_eel(str(frontend))
    main(["--frontend", str(frontend), "--port", "8123"])

    assert eel_stub.init_dir == str(frontend)
    assert len(eel_stub.exposed) >= 78
    # Never spawn a browser: the desktop shell (or the user) owns the window.
    assert eel_stub.start_args[1].get("mode") is None
    out = capsys.readouterr().out
    m = re.search(r"Eel server starting on (http://localhost:\d+)", out)
    assert m and m.group(1) == "http://localhost:8123"  # main.js:87 scrape

    # The bundled RPC frontend must take the RpcServer branch instead.
    repo_frontend = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "frontend"
    )
    assert not _frontend_uses_eel(repo_frontend)


@pytest.mark.slow
def test_headless_stdout_contract_like_main_js(tmp_path):
    """Spawn the backend exactly as the reference shell would and scrape
    stdout with main.js's regex (reference main.js:22-55,87)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "cbas_tpu.app.main", "--headless"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    url = None
    try:
        deadline = threading.Event()

        def read_lines():
            nonlocal url
            for line in proc.stdout:
                m = re.search(r"Eel server starting on (http://localhost:\d+)", line)
                if m:
                    url = m.group(1)
                    deadline.set()
                    return

        t = threading.Thread(target=read_lines, daemon=True)
        t.start()
        assert deadline.wait(timeout=120), "server line never appeared on stdout"
        assert url is not None
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
