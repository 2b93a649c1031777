"""The reference CLI's ``-pprof`` analog: an in-process diagnostics
HTTP server (reference: /root/reference/baker_cli.go:25,40,61 — a Go
``net/http/pprof`` server on a user-given host:port, ``"localhost:"``
picking a free port).

Python + Spark have no goroutine dump, so the endpoints map the
*intent* onto this runtime — all stdlib, zero deps, daemon thread:

- ``/debug/pprof/``                 index (mirrors Go's pprof index page)
- ``/debug/pprof/profile?seconds=N`` driver-side CPU profile: samples
  every thread's stack for N seconds (default 5) — the same statistical
  model Go's pprof uses — and returns hottest-frames/hottest-stacks
  tables (text, not Go's protobuf — this is a human surface here).
- ``/debug/pprof/threads``          all Python thread stacks (the
  goroutine-dump analog), via ``sys._current_frames``.
- ``/debug/spark/status``           JSON snapshot from the
  SparkContext status tracker: active jobs/stages with task counts —
  the executor-side story, which for Spark lives in the Spark UI
  (port 4040) that this endpoint links.

Executor CPU time is NOT profiled here by design: on a real cluster
that is the Spark UI / history server's job; a driver-local pprof
server profiling executor JVMs would be fiction. The driver profile is
real and useful — toml_compiler, plan construction, collect-side
sinks, Python data sources all run on the driver.
"""

from __future__ import annotations

import json
import sys
import threading
import time
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_INDEX = """<html><head><title>baker_spark pprof</title></head><body>
<h1>baker_spark diagnostics</h1>
<ul>
<li><a href="/debug/pprof/profile?seconds=5">profile</a> — driver CPU profile (all-thread stack sampling)</li>
<li><a href="/debug/pprof/threads">threads</a> — python thread stacks</li>
<li><a href="/debug/spark/status">spark status</a> — active jobs/stages JSON</li>
</ul></body></html>"""


def _profile_driver(seconds: float, interval: float = 0.005) -> str:
    """Statistical all-thread driver profile for ``seconds`` wall-clock:
    poll ``sys._current_frames()`` every ``interval`` and aggregate
    samples by innermost frame and by (depth-capped) stack — the same
    sampling model Go's pprof uses. cProfile is NOT usable here: it
    instruments only the calling thread, and this handler thread just
    waits out the window, so a cProfile-based endpoint returns nothing
    but its own sleep (the round-8 review catch). Sampling sees every
    thread — TOML compiles, plan construction, Py4J callbacks, Python
    data source planners, collect-side sinks. Cheap enough to run on
    demand; never on by default."""
    deadline = time.perf_counter() + max(0.0, min(seconds, 60.0))
    own = threading.get_ident()
    leaves: dict[str, int] = {}
    stacks: dict[str, int] = {}
    samples = 0
    while time.perf_counter() < deadline:
        names = {t.ident: t.name for t in threading.enumerate()}
        for ident, frame in list(sys._current_frames().items()):
            if ident == own:
                continue
            samples += 1
            code = frame.f_code
            leaf = (
                f"{names.get(ident, '?')}: {code.co_filename}:"
                f"{frame.f_lineno} {code.co_name}"
            )
            leaves[leaf] = leaves.get(leaf, 0) + 1
            chain, f, depth = [], frame, 0
            while f is not None and depth < 12:
                chain.append(f.f_code.co_name)
                f = f.f_back
                depth += 1
            stack = f"{names.get(ident, '?')}: " + " < ".join(chain)
            stacks[stack] = stacks.get(stack, 0) + 1
        time.sleep(interval)
    if not samples:
        return "(no samples in window)\n"
    out = [f"{samples} samples over {seconds:g}s ({interval * 1000:g}ms interval)",
           "", "hottest frames (thread: file:line function  samples  share):"]
    for leaf, n in sorted(leaves.items(), key=lambda kv: -kv[1])[:40]:
        out.append(f"  {leaf}  {n}  {n / samples:.1%}")
    out.append("")
    out.append("hottest stacks (innermost < caller < ...):")
    for stack, n in sorted(stacks.items(), key=lambda kv: -kv[1])[:15]:
        out.append(f"  [{n}] {stack}")
    return "\n".join(out) + "\n"


def _thread_dump() -> str:
    frames = sys._current_frames()
    names = {t.ident: t.name for t in threading.enumerate()}
    parts = []
    for ident, frame in frames.items():
        parts.append(f"--- thread {names.get(ident, '?')} (id {ident}) ---")
        parts.append("".join(traceback.format_stack(frame)))
    return "\n".join(parts) + "\n"


def _spark_status(spark) -> dict:
    if spark is None:
        return {"spark": None, "note": "no SparkSession attached"}
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    jobs = []
    for jid in tracker.getActiveJobsIds():
        info = tracker.getJobInfo(jid)
        if info:
            jobs.append({"jobId": jid, "status": info.status, "stageIds": list(info.stageIds)})
    stages = []
    for sid in tracker.getActiveStageIds():
        info = tracker.getStageInfo(sid)
        if info:
            stages.append(
                {
                    "stageId": sid,
                    "name": info.name,
                    "numTasks": info.numTasks,
                    "numActiveTasks": info.numActiveTasks,
                    "numCompletedTasks": info.numCompletedTasks,
                    "numFailedTasks": info.numFailedTasks,
                }
            )
    return {
        "appId": sc.applicationId,
        "uiWebUrl": sc.uiWebUrl,  # the executor-side deep-dive lives here
        "defaultParallelism": sc.defaultParallelism,
        "activeJobs": jobs,
        "activeStages": stages,
    }


class _Handler(BaseHTTPRequestHandler):
    server_version = "baker-spark-pprof/1"
    spark = None  # class attr set by serve()

    def log_message(self, fmt, *args):  # quiet: diagnostics, not access logs
        pass

    def _send(self, body: str, ctype: str = "text/plain; charset=utf-8", code: int = 200):
        data = body.encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):  # noqa: N802 (http.server API)
        url = urlparse(self.path)
        try:
            if url.path in ("/", "/debug/pprof", "/debug/pprof/"):
                self._send(_INDEX, "text/html; charset=utf-8")
            elif url.path == "/debug/pprof/profile":
                secs = float(parse_qs(url.query).get("seconds", ["5"])[0])
                self._send(_profile_driver(secs))
            elif url.path == "/debug/pprof/threads":
                self._send(_thread_dump())
            elif url.path == "/debug/spark/status":
                self._send(json.dumps(_spark_status(type(self).spark), indent=2), "application/json")
            else:
                self._send("not found\n", code=404)
        except Exception as e:  # diagnostics must not kill the server
            self._send(f"error: {e}\n", code=500)


class PProfServer:
    """Lifecycle wrapper: ``serve_pprof(addr, spark)`` -> running server
    on a daemon thread; ``.address`` is the bound (host, port);
    ``.close()`` for tests (the CLI lets process exit reap it)."""

    def __init__(self, httpd: ThreadingHTTPServer):
        self._httpd = httpd
        self.address = httpd.server_address

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def parse_host_port(addr: str) -> tuple[str, int]:
    """Reference semantics (baker_cli.go checkHostPort): ``host:port``,
    ``"localhost:"`` (empty port) -> pick a free port; bare ``:6060``
    -> all interfaces."""
    host, sep, port = addr.rpartition(":")
    if not sep:
        raise ValueError(f"pprof address {addr!r} must be host:port (use 'localhost:' for a free port)")
    return host or "0.0.0.0", int(port) if port else 0


def serve_pprof(addr: str, spark=None) -> PProfServer:
    """Start the diagnostics server on ``addr`` (daemon thread,
    returns immediately) — the CLI's ``--pprof`` implementation."""
    host, port = parse_host_port(addr)
    handler = type("BoundHandler", (_Handler,), {"spark": spark})
    httpd = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=httpd.serve_forever, name="baker-pprof", daemon=True)
    t.start()
    return PProfServer(httpd)
