"""Metrics registry + embedded HTTP dashboard.

The reference ships a `DashboardServer` HTTP dashboard on :8080 whose
methods are all bodiless except the HTML template
(include/keyhunt/core/dashboard.h:102-387) and a 1 Hz printf stats loop
(keyhunt.cpp:2154-2252). This module is the working equivalent:

- `Metrics`: a process-global, thread-safe registry of counters and
  gauges the engines update (keys covered, device steps, chunk latency,
  found keys).
- `MetricsServer`: stdlib http.server exposing
    GET /metrics.json  — full snapshot
    GET /healthz       — liveness
    GET /              — minimal auto-refreshing HTML view
  Runs on a daemon thread; zero third-party deps.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional


class Metrics:
    def __init__(self):
        self._lock = threading.Lock()
        self._counters: Dict[str, float] = {}
        self._gauges: Dict[str, float] = {}
        self._info: Dict[str, str] = {}
        self.started_at = time.time()

    def inc(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] = self._counters.get(name, 0.0) + value

    def set_gauge(self, name: str, value: float) -> None:
        with self._lock:
            self._gauges[name] = value

    def set_info(self, name: str, value: str) -> None:
        with self._lock:
            self._info[name] = value

    def snapshot(self) -> dict:
        with self._lock:
            up = time.time() - self.started_at
            keys = self._counters.get("keys_covered", 0.0)
            return {
                "uptime_s": up,
                "keys_per_sec": keys / up if up > 0 else 0.0,
                "counters": dict(self._counters),
                "gauges": dict(self._gauges),
                "info": dict(self._info),
            }


_global = Metrics()


def get_metrics() -> Metrics:
    return _global


_HTML = """<!doctype html><meta charset=utf-8>
<title>keyhunt-tpu</title>
<meta http-equiv=refresh content=2>
<style>body{font:14px monospace;margin:2em}td{padding:.2em 1em}</style>
<h2>keyhunt-tpu</h2><table id=t>%ROWS%</table>
"""


class _Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        snap = self.server.metrics.snapshot()  # type: ignore[attr-defined]
        if self.path == "/metrics.json":
            self._send(200, json.dumps(snap, indent=1).encode(), "application/json")
        elif self.path == "/healthz":
            self._send(200, b"ok", "text/plain")
        elif self.path == "/":
            rows = [f"<tr><td>uptime_s</td><td>{snap['uptime_s']:.1f}</td></tr>",
                    f"<tr><td>keys/s</td><td>{snap['keys_per_sec']:.3e}</td></tr>"]
            for src in ("counters", "gauges", "info"):
                for k, v in sorted(snap[src].items()):
                    rows.append(f"<tr><td>{k}</td><td>{v}</td></tr>")
            body = _HTML.replace("%ROWS%", "".join(rows)).encode()
            self._send(200, body, "text/html")
        else:
            self._send(404, b"not found", "text/plain")

    def log_message(self, *a):  # silence default request logging
        pass


class MetricsServer:
    def __init__(self, port: int, metrics: Optional[Metrics] = None,
                 host: str = "127.0.0.1"):
        self.httpd = ThreadingHTTPServer((host, port), _Handler)
        self.httpd.metrics = metrics or get_metrics()  # type: ignore[attr-defined]
        self.port = self.httpd.server_address[1]
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def start(self) -> "MetricsServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
