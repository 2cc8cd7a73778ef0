"""Process entry point: ``python -m gravity_spark --config pipeline.toml``.

The reference runs as ``gravity -config config.toml -http-addr :8080``
(cmd/gravity/main.go): load + validate config, start the pipeline,
serve /metrics /status /healthz /reset, restart on config change, exit
cleanly on SIGINT/SIGTERM. This is that process shape with Spark as the
engine:

- batch-mode configs run one batch apply and exit (rc 0);
- stream-mode configs run until the stream stops or a signal arrives;
- ``--watch`` hot-reloads the pipeline when the config file changes
  (plans/watch.py — invalid configs are rejected, last good one keeps
  running);
- ``--http-port`` serves the Prometheus-format ops surface
  (ops_server.py) with /status reporting pipeline name, mode, and
  stream progress.
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading

from gravity_spark.ops_server import MetricsRegistry, OpsServer
from gravity_spark.plans.pipeline import build_pipeline, load_pipeline
from gravity_spark.plans.watch import ConfigWatcher
from gravity_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gravity_spark")
    ap.add_argument("--config", required=True, help="pipeline TOML (v2 or v3 layout)")
    ap.add_argument("--http-port", type=int, default=None,
                    help="serve /metrics /status /healthz /reset on this port (0 = ephemeral)")
    ap.add_argument("--watch", action="store_true",
                    help="restart the pipeline when the config file changes")
    ap.add_argument("--cpus", type=int, default=None, help="local[] core count")
    args = ap.parse_args(argv)

    spark = get_spark("gravity_spark_main", cpus=args.cpus)
    state: dict = {"stopping": False}

    def build():
        state["pipeline"] = load_pipeline(spark, args.config)

    build()

    ops = None
    if args.http_port is not None:
        def status():
            p = state.get("pipeline")
            q = state.get("query")
            return {
                "name": p.config.get("name") if p else None,
                "streaming": bool(p and p.is_streaming),
                "progress": q.lastProgress if q is not None else None,
            }
        ops = OpsServer(MetricsRegistry(), port=args.http_port, status_fn=status).start()
        print(f"ops server on 127.0.0.1:{ops.port}", file=sys.stderr)

    stop_evt = threading.Event()

    def on_signal(_sig, _frm):
        state["stopping"] = True
        stop_evt.set()

    prev_int = signal.signal(signal.SIGINT, on_signal)
    prev_term = signal.signal(signal.SIGTERM, on_signal)

    watcher = None
    if args.watch:
        def restart(cfg):
            # Build the replacement pipeline from the ALREADY-validated
            # cfg (re-reading the file would race a second edit) BEFORE
            # stopping the running query: a failed build raises into the
            # watcher, which counts it rejected and leaves the old
            # pipeline running. state["query"]=None marks the restart
            # in progress so the main loop keeps waiting instead of
            # treating the stopped old query as end-of-stream.
            new_pipe = build_pipeline(spark, cfg)
            q = state.get("query")
            state["query"] = None
            if q is not None:
                q.stop()
            state["pipeline"] = new_pipe
            if new_pipe.is_streaming and not state["stopping"]:
                state["query"] = new_pipe.start_stream()
        watcher = ConfigWatcher(args.config, restart).start()

    try:
        pipeline = state["pipeline"]
        if not pipeline.is_streaming:
            # batch configs are one-shot (the reference's long-running
            # process shape applies to streams); ops/watch threads are
            # torn down in finally
            pipeline.run_batch()
            return 0
        state["query"] = pipeline.start_stream()
        while not stop_evt.is_set():
            q = state.get("query")
            # The restart path nulls state["query"] BEFORE stopping the
            # old query, so re-checking identity after the isActive read
            # distinguishes "stream ended" from "restart in progress".
            if q is not None and not q.isActive and state.get("query") is q:
                break
            stop_evt.wait(0.5)
        q = state.get("query")
        if q is not None and q.isActive:
            q.stop()
        return 0
    finally:
        signal.signal(signal.SIGINT, prev_int)
        signal.signal(signal.SIGTERM, prev_term)
        if watcher is not None:
            watcher.stop()
        if ops is not None:
            ops.stop()


if __name__ == "__main__":
    raise SystemExit(main())
