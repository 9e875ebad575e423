"""HTTP query interface (SURVEY §3 entry point B: the reference's
HTTP endpoint, /root/reference/src/Server/HTTPHandler.h — `GET/POST
/?query=...`, result in the FORMAT the query requests, `/ping` health
check).

Embedded stdlib server wrapping the same chsql → Spark path as the
CLI entry point: one SparkSession serves all requests (the reference's
server model); concurrency is Spark's scheduler — the HTTP layer is a
thin translator. For production fronting you'd put this behind a real
ASGI server, but the protocol surface (query param, POST body, ping,
FORMAT) is what a migrating client needs."""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# headers of the HTTP request currently executing (request-scoped
# under the per-server query lock); read by getClientHTTPHeader
CURRENT_HTTP_HEADERS: dict[str, str] = {}


def _url_settings(qs: dict[str, list[str]]) -> dict[str, str]:
    """Recognized ClickHouse settings passed as URL parameters."""
    from clickhouse_25_5_3_75_stable_spark.chsql import _KNOWN_SETTINGS

    return {k: v[0] for k, v in qs.items() if k in _KNOWN_SETTINGS and v}


def _url_params(qs: dict[str, list[str]]) -> dict[str, str] | None:
    """param_<name> URL parameters bind {name:Type} query parameters
    (reference src/Server/HTTPHandler.cpp customizeContext)."""
    out = {k[len("param_"):]: v[0]
           for k, v in qs.items() if k.startswith("param_") and v}
    return out or None


def make_server(spark, data_dir: str, port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; port 0 picks a free port."""
    import io

    from clickhouse_25_5_3_75_stable_spark.__main__ import run_local

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _run(self, query: str, url_settings: dict[str, str] | None = None,
                 params: dict[str, str] | None = None) -> None:
            out = io.StringIO()
            try:
                # one query at a time per session (the reference
                # serializes per connection; Spark jobs parallelize
                # internally)
                with lock:
                    # request scope for getClientHTTPHeader — safe as a
                    # module global because queries serialize under the
                    # lock and the dialect reads it at transpile time
                    global CURRENT_HTTP_HEADERS
                    CURRENT_HTTP_HEADERS = dict(self.headers.items())
                    from clickhouse_25_5_3_75_stable_spark.chsql import (
                        apply_settings,
                        restore_settings,
                        settings_snapshot,
                    )

                    # reference HTTP accepts settings as URL params
                    # (src/Server/HTTPHandler.cpp); recognized names
                    # apply for this request then restore. The snapshot
                    # covers EVERY conf a SETTINGS clause inside the
                    # query text could touch too — without it, one
                    # client's 'SELECT ... SETTINGS max_threads=4'
                    # would leak into every later request (run_local
                    # collects eagerly, so restore-after is safe).
                    settings = dict(url_settings or {})
                    cap = settings.pop("max_result_rows", None)
                    snap = settings_snapshot(spark)
                    apply_settings(spark, settings)
                    try:
                        run_local(query, data_dir, spark=spark, out=out,
                                  max_result_rows=cap, params=params)
                    finally:
                        restore_settings(spark, snap)
                        CURRENT_HTTP_HEADERS = {}
                body = out.getvalue().encode("utf-8")
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # noqa: BLE001 — error surface is the contract
                body = f"Code: 62. {type(e).__name__}: {e}\n".encode()
                self.send_response(400)
                self.send_header("Content-Type", "text/plain; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib naming)
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/ping":
                self.send_response(200)
                self.send_header("Content-Length", "3")
                self.end_headers()
                self.wfile.write(b"Ok\n")
                return
            qs = urllib.parse.parse_qs(parsed.query)
            query = (qs.get("query") or [""])[0]
            if not query:
                self.send_response(400)
                self.end_headers()
                return
            self._run(query, _url_settings(qs), _url_params(qs))

        def do_POST(self):  # noqa: N802
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length).decode("utf-8")
            parsed = urllib.parse.urlparse(self.path)
            qs = urllib.parse.parse_qs(parsed.query)
            url_query = (qs.get("query") or [""])[0]
            if url_query and body and url_query.upper().lstrip().startswith("INSERT"):
                # reference HTTP INSERT: statement in the URL, rows in
                # the body (INSERT INTO t FORMAT JSONEachRow + payload)
                query = url_query.rstrip() + "\n" + body
            else:
                query = url_query or body
            self._run(query, _url_settings(qs), _url_params(qs))

        def log_message(self, *a):  # silence request logging
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def serve_in_thread(spark, data_dir: str, port: int = 0):
    """Start the server on a daemon thread; returns (server, port)."""
    srv = make_server(spark, data_dir, port)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    return srv, srv.server_address[1]
