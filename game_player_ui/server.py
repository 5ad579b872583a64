#!/usr/bin/env python
"""Human-play web UI.

Parity with the reference's Flask + ALE server
(reference game_player_ui/server.py:1-56 + templates/index.html): an HTML
canvas shows the current frame, buttons / number keys 0-9 POST an action to
``/step``, and the server steps the environment and refreshes the
screenshot.  Differences by design: built on the Python stdlib
``http.server`` (no Flask dependency) and it can drive *any* registered
environment in the zoo (``--env pong``), not only an ALE ROM — ALE games
work too when atari support is importable.

Usage:
  python game_player_ui/server.py --env pong --port 8000
"""

from __future__ import annotations

import argparse
import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_STATE = {"env": None, "lock": threading.Lock(), "last": None,
          "cumulative": 0.0, "steps": 0}


def _render_jpeg(frame: np.ndarray) -> bytes:
    from PIL import Image

    from scmgan_tpu.analysis.video import resize_nearest, to_uint8

    img = to_uint8(frame)
    img = resize_nearest(img, (512, 512))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    return buf.getvalue()


_PAGE = """<!doctype html>
<html><head><title>scmgan_tpu game player</title>
<style>
 body {{ background:#111; color:#eee; font-family:monospace; text-align:center }}
 img {{ image-rendering: pixelated; border:2px solid #444; }}
 button {{ font-size:1.2em; margin:4px; padding:8px 16px; }}
</style></head>
<body>
<h2>{env} — human play</h2>
<img id="screen" src="/screenshot.jpg" width="512" height="512"/>
<div id="buttons">{buttons}</div>
<div id="status">reward: 0</div>
<script>
function step(a) {{
  fetch('/step', {{method:'POST', headers:{{'Content-Type':'application/json'}},
                 body: JSON.stringify({{action:a}})}})
    .then(r => r.json())
    .then(j => {{
       document.getElementById('screen').src = '/screenshot.jpg?t=' + Date.now();
       document.getElementById('status').innerText =
           'step ' + j.steps + '  reward: ' + j.cumulative.toFixed(2) +
           (j.done ? '  [episode reset]' : '');
    }});
}}
document.addEventListener('keydown', e => {{
  const n = parseInt(e.key);
  if (!isNaN(n) && n < {num_actions}) step(n);
}});
</script>
</body></html>"""


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):  # quiet
        pass

    def _send(self, code, body, ctype="text/html"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path.startswith("/screenshot.jpg"):
            with _STATE["lock"]:
                frame = _STATE["last"]
            self._send(200, _render_jpeg(frame), "image/jpeg")
            return
        n = _STATE["env"].spec.num_actions
        buttons = "".join(
            f"<button onclick=\"step({a})\">{a}</button>" for a in range(n))
        page = _PAGE.format(env=_STATE["env"].spec.name, buttons=buttons,
                            num_actions=n)
        self._send(200, page.encode())

    def do_POST(self):
        if self.path != "/step":
            self._send(404, b"not found")
            return
        length = int(self.headers.get("Content-Length", 0))
        data = json.loads(self.rfile.read(length) or b"{}")
        action = int(data.get("action", 0))
        with _STATE["lock"]:
            env = _STATE["env"]
            action = max(0, min(action, env.spec.num_actions - 1))
            obs, reward, done, info = env.step(action)
            _STATE["last"] = obs
            _STATE["cumulative"] += reward
            _STATE["steps"] += 1
            body = json.dumps({
                "reward": reward, "cumulative": _STATE["cumulative"],
                "steps": _STATE["steps"], "done": done,
            }).encode()
        self._send(200, body, "application/json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="pong")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--platform", default=None,
                    help="Force a JAX platform (e.g. cpu) — interactive "
                         "play doesn't need the TPU")
    args = ap.parse_args()

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from scmgan_tpu.envs import HostEnv, get_env

    env = HostEnv(get_env(args.env))
    _STATE["env"] = env
    _STATE["last"] = env.reset()

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"Serving {args.env} on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
