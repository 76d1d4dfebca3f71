"""Wire-shape compatibility with the REFERENCE frontend.

``bind_eel`` + ``bridge_callbacks_to_eel`` (cbas_tpu/app/api.py) claim the
reference's Electron pages can talk to this Api unchanged. That only holds if
every ``eel.<name>(args...)`` call site in /root/reference/frontend/js/ binds
to an Api method that accepts that many positional arguments. This test
parses the actual reference JS call sites and asserts each one is callable —
the same audit that caught 12 arity mismatches (since fixed, r3).
"""

import glob
import inspect
import os
import re

import pytest

from cbas_tpu.app.api import Api

REF_JS = "/root/reference/frontend/js"

# Names the reference JS calls that are NOT remote procedures.
_NOT_RPC = {"expose", "_websocket"}


def _reference_call_arities():
    """{name: {positional-arg counts seen at reference JS call sites}}."""
    calls = {}
    for path in glob.glob(os.path.join(REF_JS, "*.js")):
        src = open(path).read()
        for m in re.finditer(r"eel\.([a-zA-Z_][a-zA-Z_0-9]*)\(", src):
            name = m.group(1)
            if name in _NOT_RPC:
                continue
            # Count content-bearing top-level argument segments (strings and
            # nested brackets skipped; a trailing comma adds no argument).
            i, depth, args, content = m.end(), 1, 0, False
            while i < len(src) and depth:
                c = src[i]
                if c in "([{":
                    depth += 1
                elif c in ")]}":
                    depth -= 1
                elif depth == 1 and c == ",":
                    if content:
                        args += 1
                    content = False
                elif not c.isspace():
                    content = True
                if c in "'\"`":
                    q = c
                    i += 1
                    while i < len(src) and src[i] != q:
                        i += 2 if src[i] == "\\" else 1
                    content = True
                i += 1
            calls.setdefault(name, set()).add(args + 1 if content else args)
    return calls


@pytest.mark.skipif(not os.path.isdir(REF_JS), reason="reference not mounted")
def test_every_reference_js_call_site_binds():
    calls = _reference_call_arities()
    assert len(calls) > 60, "reference JS parse produced implausibly few calls"
    problems = []
    for name, arities in sorted(calls.items()):
        fn = getattr(Api, name, None)
        if fn is None:
            problems.append(f"{name}: missing on Api (called with {sorted(arities)} args)")
            continue
        sig = inspect.signature(fn)
        params = [p for p in sig.parameters.values() if p.name != "self"]
        required = sum(
            1
            for p in params
            if p.default is inspect.Parameter.empty
            and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        )
        maxpos = sum(
            1
            for p in params
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        )
        has_var = any(p.kind == p.VAR_POSITIONAL for p in params)
        for n in sorted(arities):
            if n < required or (n > maxpos and not has_var):
                problems.append(
                    f"{name}: reference calls with {n} args, ours accepts "
                    f"{required}..{'*' if has_var else maxpos}"
                )
    assert not problems, "\n".join(problems)


def _reference_receivers():
    """{name: (required, max_params)} for every JS-side eel.expose receiver."""
    recv = {}
    for path in glob.glob(os.path.join(REF_JS, "*.js")):
        src = open(path).read()
        for m in re.finditer(r"eel\.expose\((\w+)\)", src):
            name = m.group(1)
            fm = re.search(
                r"function\s+%s\s*\(([^)]*)\)" % re.escape(name), src
            )
            if not fm:
                continue
            params = [p.strip() for p in fm.group(1).split(",") if p.strip()]
            required = len([p for p in params if "=" not in p and not p.startswith("...")])
            recv[name] = (required, len(params))
    return recv


@pytest.mark.skipif(not os.path.isdir(REF_JS), reason="reference not mounted")
def test_bridged_callbacks_match_reference_receivers():
    """Emit our production event shapes through bridge_callbacks_to_eel and
    assert every forwarded call fits the REFERENCE page's receiver signature
    (the Python->JS direction of the drop-in claim)."""
    from cbas_tpu.app.api import bridge_callbacks_to_eel
    from cbas_tpu.app.state import Callbacks

    recv = _reference_receivers()
    assert len(recv) >= 20

    sent = []

    class FakeEel:
        def __getattr__(self, name):
            if name.startswith("_"):
                raise AttributeError(name)
            return lambda *a: (lambda: sent.append((name, a)))

    api = Api.__new__(Api)  # state only; no project needed

    class _St:
        callbacks = Callbacks()

    api.state = _St()
    bridge_callbacks_to_eel(api, eel_module=FakeEel())

    # Our production emission shapes (event name -> args), as emitted by
    # workers.py / api.py / labeling.py.
    payload = {
        "frame": "b64", "frame_index": 5, "total_frames": 100,
        "video_name": "v.mp4", "timeline": [-1, 0, 1, -1],
        "zoom_timeline": [0, 0, -1, -1], "zoom_start": 0.0, "zoom_end": 10.0,
        "behaviors": ["walk", "rest"], "colors": ["#1f77b4", "#ff7f0e"],
        "selected": None, "pending": {"type": 0, "start": 2},
        "mode": "scratch", "confirmation_mode": False,
        "counts": {"walk": 3, "rest": 0}, "instance_counts": {"walk": 1, "rest": 0},
    }
    emissions = [
        ("update_global_encoding_progress", (1, 4, 25.0)),
        ("updateActogramDisplay", ({"walk": "b64"}, 7)),
        ("updateLabelImageSrc", (payload,)),
        ("log_line", ("[INFO] hello",)),
        ("updateInferenceProgress", ("m", 50.0, "Processing 1/2")),
        ("updateTrainingStatusOnUI", ("ds", "Epoch 1")),
        ("notify_import_complete", (True, "Imported 2 video(s).")),
        ("showErrorOnStartup", ("boom",)),
        ("showErrorOnVisualizePage", ("boom",)),
        ("showErrorOnLabelTrainPage", ("boom",)),
        ("updateImageSrc", ("cam1", "b64")),
        ("update_live_frame", ("cam1", "b64")),
        ("notify_new_data_available", ()),
    ]
    for name, args in emissions:
        api.state.callbacks.emit(name, *args)

    assert sent, "bridge forwarded nothing"
    covered = set()
    for js_name, js_args in sent:
        if js_name not in recv:
            continue  # receiver our own frontend defines, not the reference
        required, maxp = recv[js_name]
        assert required <= len(js_args) <= maxp, (
            f"{js_name}: bridged {len(js_args)} args, reference receiver "
            f"takes {required}..{maxp}"
        )
        covered.add(js_name)

    # The reference's render-loop receivers must all have been driven by the
    # single payload emission (the adapter fans it out).
    assert {"updateLabelImageSrc", "updateFileInfo", "setConfirmationModeUI",
            "updateLabelingStats", "update_log_panel",
            "update_global_encoding_progress", "updateActogramDisplay"} <= covered

    # Shape spot-checks: the status object and the actogram list.
    status = [a for n, a in sent if n == "update_global_encoding_progress"][0][0]
    assert status["overall_processed"] == 1 and status["overall_total"] == 4
    acto_args = [a for n, a in sent if n == "updateActogramDisplay"][0]
    assert acto_args[0] == [{"name": "walk", "blob": "b64"}] and acto_args[1] == 7
    main, tl, zoom, active = [a for n, a in sent if n == "updateLabelImageSrc"][0]
    assert main == "b64" and active == "walk"
    for blob in (tl, zoom):  # server-rendered JPEG strips
        assert isinstance(blob, str) and len(blob) > 100


def test_train_model_reference_positional_order():
    """The 17-positional order matches the reference exactly
    (backend/label_train_page.py:1804-1808), including its string->number
    coercion of JS form values."""
    order = [k for k, _ in Api._TRAIN_POSITIONAL]
    assert order == [
        "batch_size", "learning_rate", "epochs", "sequence_length",
        "training_method", "patience", "num_runs", "num_trials",
        "optimization_target", "use_test", "test_split", "custom_weights",
        "weight_decay", "label_smoothing", "lstm_hidden_size", "lstm_layers",
    ]
