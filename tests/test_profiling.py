"""The -pprof analog (reference baker_cli.go:25,40,61): a live HTTP
diagnostics server — index, driver CPU profile, thread dump, Spark
status — exercised with real requests against a free port."""

import json
import threading
import urllib.request

from baker_spark.profiling import parse_host_port, serve_pprof


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read().decode()


def test_parse_host_port():
    assert parse_host_port("localhost:6060") == ("localhost", 6060)
    assert parse_host_port("localhost:") == ("localhost", 0)  # free port
    assert parse_host_port(":7070") == ("0.0.0.0", 7070)
    import pytest

    with pytest.raises(ValueError):
        parse_host_port("6060")


def test_pprof_endpoints(spark):
    srv = serve_pprof("localhost:", spark)  # reference's free-port form
    port = srv.address[1]
    assert port > 0
    try:
        # index lists the endpoints
        code, ctype, body = _get(port, "/debug/pprof/")
        assert code == 200 and "profile" in body and "threads" in body

        # thread dump contains this very thread
        code, _, body = _get(port, "/debug/pprof/threads")
        assert code == 200 and "MainThread" in body

        # CPU profile: burn driver CPU on ANOTHER thread during the
        # window — the sampler must attribute samples to it by function
        # name (the cProfile version measured only its own sleep and
        # could never see this; round-8 review catch)
        stop = threading.Event()

        def burn_for_profile():
            x = 0
            while not stop.is_set():
                x += sum(i * i for i in range(500))

        t = threading.Thread(target=burn_for_profile, daemon=True)
        t.start()
        try:
            code, _, body = _get(port, "/debug/pprof/profile?seconds=0.3")
        finally:
            stop.set()
            t.join()
        assert code == 200 and "hottest frames" in body
        assert "burn_for_profile" in body  # the busy thread was sampled

        # spark status is JSON with the app id and a UI link
        code, ctype, body = _get(port, "/debug/spark/status")
        assert code == 200 and ctype.startswith("application/json")
        status = json.loads(body)
        assert status["appId"] == spark.sparkContext.applicationId
        assert "activeJobs" in status and "activeStages" in status

        code, _, _ = _get(port, "/debug/nope")
        assert code == 404
    except urllib.error.HTTPError as e:  # 404 raises in urllib
        assert e.code == 404
    finally:
        srv.close()


def test_cli_run_accepts_pprof_flag(tmp_path):
    """--pprof on the run subcommand starts the server for the run's
    duration. Subprocess on purpose: cmd_run stops its session at the
    end (process entrypoint semantics), which must not tear down the
    suite's shared fixture session."""
    import os
    import subprocess
    import sys

    src = tmp_path / "in.csv"
    src.write_text("a,b,c\nd,e,f\n")
    out = tmp_path / "out"
    toml = tmp_path / "t.toml"
    toml.write_text(
        f"""
[fields]
names=["f0","f1","f2"]
[input]
name="List"
[input.config]
Files=["{src}"]
[output]
name="FileWriter"
procs=1
[output.config]
PathString="{out}/out.csv.gz"
"""
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "baker_spark.cli", "run", str(toml), "--cpus", "2",
         "--pprof", "localhost:"],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "running pprof server on" in proc.stderr
    # default log format is JSON lines (reference: logrus JSONFormatter;
    # -pretty opts into text) — the structured twin of the line above
    jl = [ln for ln in proc.stderr.splitlines() if ln.startswith('{"level"')]
    assert any('"running pprof server"' in ln and '"addr"' in ln for ln in jl)


def test_cli_log_formats():
    """_log emits logrus-shaped JSON by default and plain text under
    --pretty (reference baker_cli.go:31,39)."""
    import io
    import json
    from contextlib import redirect_stderr

    from baker_spark.cli import _log

    err = io.StringIO()
    with redirect_stderr(err):
        _log("daemon topology started; Ctrl-C to stop", pretty=False, checkpoint="/tmp/c")
    doc = json.loads(err.getvalue())
    assert doc["level"] == "info"
    assert doc["msg"] == "daemon topology started; Ctrl-C to stop"
    assert doc["checkpoint"] == "/tmp/c"
    assert "time" in doc

    err = io.StringIO()
    with redirect_stderr(err):
        _log("daemon topology started; Ctrl-C to stop", pretty=True, checkpoint="/tmp/c")
    line = err.getvalue().strip()
    # level prefix kept in pretty mode too (logrus TextFormatter prints
    # it; warn-level filtering must work in both modes)
    assert line == "level=info daemon topology started; Ctrl-C to stop checkpoint=/tmp/c"
