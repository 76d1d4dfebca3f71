"""Built-in RPC server tests (HTTP round trips + SSE event fan-out)."""

import json
import threading
import urllib.request

import pytest

from cbas_tpu.app.api import Api
from cbas_tpu.app.server import RpcServer
from cbas_tpu.core.project import Project


@pytest.fixture
def server(tmp_path):
    proj = Project.create_project(str(tmp_path), "p")
    api = Api()
    api.state.project = proj  # skip encoder bootstrapping
    srv = RpcServer(api)
    srv.start()
    yield srv, api
    srv.stop()


def rpc(port, method, *args, **kwargs):
    req = urllib.request.Request(
        f"http://localhost:{port}/api/{method}",
        data=json.dumps({"args": list(args), "kwargs": kwargs}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_rpc_round_trip(server):
    srv, api = server
    out = rpc(srv.port, "get_cbas_status")
    assert out["result"]["project_loaded"] is True
    out = rpc(srv.port, "create_dataset", "d1", ["walk"], [])
    assert out["result"] is True
    out = rpc(srv.port, "load_dataset_configs")
    assert "d1" in out["result"]


def test_rpc_errors(server):
    srv, _ = server
    req = urllib.request.Request(
        f"http://localhost:{srv.port}/api/no_such_method", data=b"{}", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 404
    # Private methods are not exposed.
    req = urllib.request.Request(
        f"http://localhost:{srv.port}/api/_start_session", data=b"{}", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(req)


def test_index_served(server):
    srv, _ = server
    with urllib.request.urlopen(f"http://localhost:{srv.port}/") as resp:
        body = resp.read().decode()
    assert "CBAS-TPU" in body  # embedded panel or the full frontend app


def test_sse_receives_callbacks(server):
    srv, api = server
    got = []
    done = threading.Event()

    def reader():
        req = urllib.request.Request(f"http://localhost:{srv.port}/events")
        with urllib.request.urlopen(req, timeout=10) as resp:
            for raw in resp:
                line = raw.decode().strip()
                if line.startswith("data: "):
                    got.append(json.loads(line[6:]))
                    if any("name" in g and g["name"] == "ping_event" for g in got):
                        done.set()
                        return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    import time

    time.sleep(0.3)  # let the listener attach
    api.state.callbacks.emit("ping_event", 42, "hello")
    assert done.wait(timeout=8)
    evt = [g for g in got if g.get("name") == "ping_event"][0]
    assert evt["args"] == [42, "hello"]


def test_cross_origin_posts_rejected(server):
    """CSRF guard: a browser fetch from a foreign page carries its Origin and
    must be refused before any state-changing method runs; same-origin and
    non-browser (no Origin) clients pass (review r4 finding)."""
    srv, _ = server
    url = f"http://localhost:{srv.port}/api/get_cbas_status"

    req = urllib.request.Request(
        url, data=b"{}", method="POST", headers={"Origin": "https://evil.example"}
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 403

    req = urllib.request.Request(
        url, data=b"{}", method="POST",
        headers={"Origin": f"http://localhost:{srv.port}"},
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200

    # DNS rebinding: a non-localhost Host header is refused too.
    req = urllib.request.Request(
        url, data=b"{}", method="POST", headers={"Host": "attacker.example"}
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 403


def test_events_stream_rejects_rebound_host(server):
    """GET /events carries log lines and frame payloads, so the same
    rebinding guard as POST applies: a rebound Host is refused, a localhost
    Host (with or without Origin) connects (r3 review finding)."""
    srv, _ = server
    url = f"http://localhost:{srv.port}/events"

    req = urllib.request.Request(url, headers={"Host": "attacker.example"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 403

    req = urllib.request.Request(url, headers={"Origin": "https://evil.example"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 403

    with urllib.request.urlopen(urllib.request.Request(url), timeout=5) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/event-stream")


def test_concurrent_requests_with_sse_held_open(server):
    """The UI holds a persistent /events stream while issuing API calls: N
    parallel POSTs must all complete (and deliver their own SSE events)
    while two streams stay attached — guards against any regression to a
    single-threaded accept loop."""
    import time

    srv, api = server
    streams_got = [[], []]

    def reader(idx):
        req = urllib.request.Request(f"http://localhost:{srv.port}/events")
        with urllib.request.urlopen(req, timeout=15) as resp:
            for raw in resp:
                line = raw.decode().strip()
                if line.startswith("data: "):
                    streams_got[idx].append(json.loads(line[6:]))
                    if len(streams_got[idx]) >= 8:
                        return

    readers = [threading.Thread(target=reader, args=(i,), daemon=True) for i in (0, 1)]
    for t in readers:
        t.start()
    time.sleep(0.3)

    results, errors = [], []

    def caller(i):
        try:
            results.append(rpc(srv.port, "get_cbas_status"))
            api.state.callbacks.emit("burst_event", i)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    callers = [threading.Thread(target=caller, args=(i,)) for i in range(8)]
    for t in callers:
        t.start()
    for t in callers:
        t.join(timeout=15)
    assert not errors and len(results) == 8
    for t in readers:
        t.join(timeout=10)
    for got in streams_got:
        bursts = {g["args"][0] for g in got if g.get("name") == "burst_event"}
        assert bursts == set(range(8)), bursts
