"""The desktop shell's backend contract (shell/main.js).

The Electron shell spawns ``python -m cbas_tpu.app.main`` and scrapes stdout
for the ready line (same mechanism as the reference shell, main.js:87). This
test drives that exact contract: the regex is parsed out of shell/main.js so
the two sides cannot drift apart, the backend is spawned as the shell would
spawn it, and the scraped URL must serve the API.
"""

import json
import os
import re
import subprocess
import sys
import time
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN_JS = os.path.join(REPO, "shell", "main.js")


def shell_ready_regex() -> re.Pattern:
    src = open(MAIN_JS).read()
    m = re.search(r"const READY_RE = /(.+?)/;", src)
    assert m, "shell/main.js must define READY_RE"
    return re.compile(m.group(1).replace("\\/", "/"))


def shell_backend_args() -> list:
    src = open(MAIN_JS).read()
    m = re.search(r"const BACKEND_ARGS = \[(.+?)\];", src)
    assert m, "shell/main.js must define BACKEND_ARGS"
    return [a.strip().strip("'\"") for a in m.group(1).split(",")]


@pytest.mark.slow
def test_backend_stdout_contract_and_api(tmp_path):
    ready_re = shell_ready_regex()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONUNBUFFERED"] = "1"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable] + shell_backend_args(),
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    url = None
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            m = ready_re.search(line)
            if m:
                url = m.group(1)
                break
        assert url, "backend never printed the shell-scraped ready line"

        req = urllib.request.Request(
            url + "/api/get_cbas_status", data=b"{}", method="POST"
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            body = json.loads(resp.read())
        assert body["result"]["project_loaded"] is False
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_shell_regex_matches_backend_line():
    """Unit-level lockstep check (no subprocess): the line main.py prints is
    matched by the shell's regex."""
    line = "Eel server starting on http://localhost:8123"
    m = shell_ready_regex().search(line)
    assert m and m.group(1) == "http://localhost:8123"
