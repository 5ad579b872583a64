"""Game-player UI server test: boot the stdlib HTTP server on a free port
and drive it like a browser (page, screenshot, /step)."""

import json
import threading
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server():
    import importlib.util
    import os
    import sys

    path = os.path.join(os.path.dirname(__file__), "..", "game_player_ui",
                        "server.py")
    spec = importlib.util.spec_from_file_location("game_ui_server", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["game_ui_server"] = mod
    spec.loader.exec_module(mod)

    from http.server import ThreadingHTTPServer

    from scmgan_tpu.envs import HostEnv, get_env

    env = HostEnv(get_env("gridworld"))
    mod._STATE["env"] = env
    mod._STATE["last"] = env.reset()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), mod.Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_index_page(server):
    html = urllib.request.urlopen(f"{server}/", timeout=10).read().decode()
    assert "gridworld" in html
    assert "screenshot.jpg" in html
    assert "<button" in html


def test_screenshot_jpeg(server):
    data = urllib.request.urlopen(f"{server}/screenshot.jpg",
                                  timeout=10).read()
    assert data[:2] == b"\xff\xd8"  # JPEG magic


def test_step_endpoint(server):
    req = urllib.request.Request(
        f"{server}/step",
        data=json.dumps({"action": 1}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST")
    body = json.loads(urllib.request.urlopen(req, timeout=30).read())
    assert body["steps"] == 1
    assert "cumulative" in body and "done" in body
    # out-of-range action clamps rather than crashing
    req2 = urllib.request.Request(
        f"{server}/step", data=json.dumps({"action": 99}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    body2 = json.loads(urllib.request.urlopen(req2, timeout=30).read())
    assert body2["steps"] == 2
