"""Frontend <-> backend lockstep checks.

The five-page UI (frontend/) talks to the Api exclusively through
``rpc("method", ...)`` / ``rpcKw("method", ...)`` calls and SSE callback
names. These tests parse the JS and assert every referenced method exists on
the Api and every callback name the JS listens for is one the backend emits,
so the two sides cannot drift. Plus static-file serving with traversal
protection.
"""

import json
import os
import re
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRONTEND = os.path.join(REPO, "frontend")


def _js_sources():
    out = {}
    for root, _, files in os.walk(FRONTEND):
        for f in files:
            if f.endswith(".js"):
                p = os.path.join(root, f)
                out[p] = open(p).read()
    assert out, "frontend/js must exist"
    return out


def test_all_rpc_methods_exist_on_api():
    from cbas_tpu.app.api import Api

    called = set()
    for src in _js_sources().values():
        called |= set(re.findall(r"rpc(?:Kw)?\(\s*[\"']([a-zA-Z_0-9]+)[\"']", src))
    assert called, "no rpc() calls found in frontend JS"
    missing = {m for m in called if not hasattr(Api, m)}
    assert not missing, f"frontend calls unknown Api methods: {sorted(missing)}"


def test_all_subscribed_callbacks_are_emitted():
    emitted = set()
    for root, _, files in os.walk(os.path.join(REPO, "cbas_tpu")):
        for f in files:
            if f.endswith(".py"):
                src = open(os.path.join(root, f)).read()
                # \s* spans newlines: emits are often wrapped across lines
                emitted |= set(re.findall(r"emit\(\s*\"([a-zA-Z_]+)\"", src))
    subscribed = set()
    for src in _js_sources().values():
        subscribed |= set(re.findall(r"bus\.on\(\s*[\"']([a-zA-Z_]+)[\"']", src))
    assert subscribed
    missing = subscribed - emitted
    assert not missing, f"frontend listens for callbacks nothing emits: {sorted(missing)}"


@pytest.fixture()
def server():
    from cbas_tpu.app.api import Api
    from cbas_tpu.app.server import RpcServer

    api = Api()
    srv = RpcServer(api, port=0)
    port = srv.start()
    yield f"http://localhost:{port}"
    srv.stop()
    api.state.shutdown.set()


def _get(url):
    req = urllib.request.Request(url)
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_static_serving_and_traversal_guard(server):
    status, body = _get(server + "/")
    assert status == 200 and b"CBAS-TPU" in body
    for path in ("/css/app.css", "/js/app.js", "/js/label_train.js",
                 "/js/record.js", "/js/inference.js", "/js/visualize.js"):
        status, _ = _get(server + path)
        assert status == 200, path
    # Traversal attempts must 404, encoded or not.
    for path in ("/js/%2e%2e/%2e%2e/cbas_tpu/app/api.py", "/..%2fpyproject.toml"):
        status, _ = _get(server + path)
        assert status == 404, path


def test_az_hotkeys_cover_behaviors_past_nine():
    """Behaviors 10+ are labelable via a-z (reference keyboard map,
    label_train_page.js:2525-2537) and the behavior table badges them."""
    src = open(os.path.join(FRONTEND, "js", "label_train.js")).read()
    # keydown branch converting a letter to behavior index 9+
    assert re.search(r"charCodeAt\(0\)\s*-\s*97\s*\+\s*9", src), \
        "a-z -> behavior index mapping missing from the keydown handler"
    # badge helper maps i<9 -> digits, i>=9 -> letters
    assert "String.fromCharCode(97 + (i - 9))" in src
    # digits stay limited to 1-9 (0 is not a behavior key)
    assert re.search(r"\^\[1-9\]\$", src)


def test_zoom_timeline_rendered_and_clickable():
    """The labeling UI renders the full strip AND the 10% zoom strip, and a
    click on the zoom strip jumps within the zoom window."""
    html = open(os.path.join(FRONTEND, "index.html")).read()
    assert 'id="lt-timeline"' in html and 'id="lt-timeline-zoom"' in html
    src = open(os.path.join(FRONTEND, "js", "label_train.js")).read()
    assert "zoom_timeline" in src and "drawZoomTimeline" in src
    # zoom click maps the fraction into [zoom_start, zoom_end)
    m = re.search(r'lt-timeline-zoom"\)\.onclick[\s\S]*?jump_to_frame', src)
    assert m and "zoom_start" in m.group(0)


def test_timeline_drag_scrubs():
    """Holding the mouse button on the full timeline drags the playhead
    (reference: handleMouseMoveForLabelScrub attached on mousedown,
    label_train_page.js:2370-2374), detaching again on mouseup."""
    src = open(os.path.join(FRONTEND, "js", "label_train.js")).read()
    m = re.search(r'lt-timeline"\)\.onmousedown[\s\S]*?\{ once: true \}', src)
    assert m, "timeline mousedown -> drag-scrub wiring missing"
    block = m.group(0)
    assert 'addEventListener("mousemove"' in block
    assert "jump_to_frame" in src[: m.start()] or "jump_to_frame" in block or (
        "scrubTo" in block and "jump_to_frame" in src
    )
    # moves are coalesced: an in-flight RPC drops intermediate positions
    assert "scrubBusy" in src


def test_crop_editor_is_interactive_and_saves_fractions():
    """The record page offers canvas drag-cropping (draw/move/resize) that
    saves fractional crop settings (reference: record_page.js crop overlay)."""
    html = open(os.path.join(FRONTEND, "index.html")).read()
    assert 'id="rc-crop-canvas"' in html
    src = open(os.path.join(FRONTEND, "js", "record.js")).read()
    for evt in ("mousedown", "mousemove", "mouseup", "mouseleave"):
        assert f'addEventListener("{evt}"' in src, evt
    # fractional conversion + save path
    assert "cropFractions" in src and "save_camera_settings" in src
    for f in ("crop_left_x", "crop_top_y", "crop_width", "crop_height"):
        assert f in src, f
    # resize handles (n/s/e/w compounds) are recognized
    assert "cropHandleAt" in src and '"move"' in src


def test_import_dialog_exposes_crop():
    """Videos can be cropped at import time (reference: label_train_page.py
    _video_import_worker crop_data {x,y,w,h,apply})."""
    html = open(os.path.join(FRONTEND, "index.html")).read()
    for el in ("rc-imp-crop", "rc-imp-crop-x", "rc-imp-crop-y", "rc-imp-crop-w", "rc-imp-crop-h"):
        assert f'id="{el}"' in html, el
    src = open(os.path.join(FRONTEND, "js", "record.js")).read()
    # the import call forwards a fractional crop box (or null for full frame)
    m = re.search(r'rpcKw\("import_videos"[\s\S]*?\}\);', src)
    assert m and "crop: importCrop" in m.group(0)
    # identity box (0,0,1,1) is treated as "no crop", matching the reference's
    # w==1&&h==1&&x==0&&y==0 guard (label_train_page.py:152)
    assert "box[0] === 0 && box[1] === 0 && box[2] === 1 && box[3] === 1" in src


def test_training_dialog_covers_all_hyperparams():
    """Every TrainingConfig hyperparameter a user tunes is settable from the
    training dialog (the reference exposes all 17, label_train_page.js)."""
    src = open(os.path.join(FRONTEND, "js", "label_train.js")).read()
    m = re.search(r"const kw = \{(.*?)\};", src, re.S)
    assert m
    exposed = set(re.findall(r"(\w+):", m.group(1)))
    import dataclasses

    from cbas_tpu.core.config import TrainingConfig

    fields = {f.name for f in dataclasses.fields(TrainingConfig)}
    # name/behaviors come from the dataset; custom_weights is attached after
    # the kw literal (per-behavior inputs exist only when that method is on).
    tunable = fields - {"name", "behaviors", "custom_weights"}
    assert tunable <= exposed, f"dialog missing: {sorted(tunable - exposed)}"
    assert exposed <= fields, f"dialog invents: {sorted(exposed - fields)}"
    # the custom-weights panel wires data-behavior inputs into kw.custom_weights
    assert "custom_weights" in src and "tr-weight" in src


def test_every_dom_id_referenced_in_js_exists_in_markup():
    """$(\"id\")/getElementById lookups in the page scripts must resolve:
    a dangling id is a silent runtime TypeError in the browser that no
    Python test would otherwise catch."""
    html = open(os.path.join(FRONTEND, "index.html")).read()
    ids = set(re.findall(r'id="([^"]+)"', html))
    # modal bodies and cards are built from JS template strings: ids defined
    # there (id="..." inside any JS source) count as markup too
    for src in _js_sources().values():
        ids |= set(re.findall(r'id="([^"$]+)"', src))
    missing = {}
    for path, src in sorted(_js_sources().items()):
        refs = set(re.findall(r'\$\("([^"]+)"\)', src))
        refs |= set(re.findall(r'getElementById\("([^"]+)"\)', src))
        # template-built ids (contain ${) are per-datum, not static markup
        bad = {r for r in refs - ids if "${" not in r}
        if bad:
            missing[os.path.basename(path)] = sorted(bad)
    assert not missing, f"JS references ids absent from any markup: {missing}"
