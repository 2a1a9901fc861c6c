"""Standalone Prometheus metrics listener on a dedicated port.

Reference analog: ``try_start_metrics_server``
(src/server/mod.rs:112-129) — both ``serve-http`` and
``serve-flightsql`` optionally take a metrics address and expose the
Prometheus text format there, separate from the data-plane port (so an
operator can scrape metrics without data-plane auth, and a slow query
cannot starve the scrape). Here: a stdlib ThreadingHTTPServer on a
daemon thread rendering a point-in-time snapshot — no exporter
dependency.
"""

from __future__ import annotations

import threading
from collections.abc import Callable


def render_prometheus(metrics: dict, prefix: str = "dft_spark") -> str:
    """Counters/gauges from a flat name->number dict, Prometheus text.

    Names ending in ``_active`` (point-in-time populations) render as
    gauges; everything else as monotonic counters.
    """
    lines = []
    for name in sorted(metrics):
        value = metrics[name]
        if not isinstance(value, (int, float)):
            continue
        kind = "gauge" if name.endswith("_active") else "counter"
        lines.append(f"# TYPE {prefix}_{name} {kind}")
        lines.append(f"{prefix}_{name} {value}")
    return "\n".join(lines) + "\n"


def split_addr(addr: str | None) -> tuple[str, int] | None:
    """'host:port' → (host, port); None/'' → None (no listener)."""
    if not addr:
        return None
    host, _, port = addr.rpartition(":")
    if not host or not port.isdigit():
        raise ValueError(f"server_metrics_addr must be 'host:port', got {addr!r}")
    return host, int(port)


def start_metrics_server(render: Callable[[], str], host: str, port: int):
    """Serve ``render()`` at ``/metrics`` (and ``/``) on host:port.

    Returns the HTTP server (``.server_address`` carries the bound
    port when 0 was requested; ``.shutdown()`` stops it). The serving
    thread is a daemon — it dies with the process, like the
    reference's exporter task.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib casing)
            if self.path.split("?")[0] not in ("/metrics", "/"):
                self.send_error(404)
                return
            body = render().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # scrapes must not spam stderr
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(
        target=server.serve_forever, name="dft-metrics", daemon=True
    )
    thread.start()
    return server
