"""HTTP healthcheck endpoint — parity with the reference's
``/healthcheck`` server (/root/reference/main.go:147-151,
healthcheck.go:11-79): JSON body with per-check status, worst status
wins, HTTP 200 when ok / 500 when critical.

Serves on localhost only (this engine has no other network surface);
started by the CLI with ``--healthcheck-port`` or embedded via
``start_healthcheck_server``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer


def healthcheck_payload(engine) -> dict:
    """Per-check statuses + aggregate (worst wins —
    healthcheck/healthcheck.go:143-150)."""
    checks = {}
    try:
        shard_statuses = engine.seen.health()
        checks["seen_set"] = ("ok" if all(s == "ok"
                                          for s in shard_statuses)
                              else "critical")
    except Exception:
        checks["seen_set"] = "critical"
    try:
        if engine.pool is not None:
            import ray

            ray.get([w.ping.remote() for w in engine.pool.workers],
                    timeout=10)
        checks["fetch_pool"] = "ok"
    except Exception:
        checks["fetch_pool"] = "critical"
    overall = ("ok" if all(v == "ok" for v in checks.values())
               else "critical")
    return {"status": overall, "checks": checks}


def start_healthcheck_server(engine, port: int) -> HTTPServer:
    """Serve GET /healthcheck on 127.0.0.1:port in a daemon thread;
    returns the server (call .shutdown() to stop)."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API name)
            if self.path != "/healthcheck":
                self.send_response(404)
                self.end_headers()
                return
            payload = healthcheck_payload(engine)
            body = json.dumps(payload).encode()
            self.send_response(200 if payload["status"] == "ok" else 500)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet
            pass

    server = HTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
