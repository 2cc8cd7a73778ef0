"""Ops / control plane: Prometheus-format metrics + status HTTP surface.

Reference parity:
  - pkg/metrics/metrics.go:20-132 — the metric contract:
    gravity_input_counter{pipeline,db,table,type,subtype},
    input→emitter→scheduler→output stage counters, exponential-bucket
    latency histograms (0.5 ms · 2^k), end-to-end event/process-time
    histograms, queue-length gauges.
  - cmd/gravity/main.go:95-105,149-173 — the HTTP surface: /metrics,
    /status, /healthz, /reset.

No prometheus client library exists in the harness image, so the text
exposition format (v0.0.4) is rendered directly — it is a stable,
documented public format. The registry is driver-side only: per-batch
aggregates arrive via Observation results / StreamingQueryProgress
(computed on executors as part of the job), so scrape cost is O(metric
cardinality), never O(rows) — the only acceptable shape at 100 TB.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Mapping, Sequence


def exponential_buckets(start: float, factor: float, count: int) -> list[float]:
    """prometheus.ExponentialBuckets — upper bounds of `count` buckets."""
    out, b = [], start
    for _ in range(count):
        out.append(b)
        b *= factor
    return out


#: reference bucket layouts (metrics.go:34-41,100-131)
INPUT_BUCKETS = exponential_buckets(0.0005, 2, 15)        # ~8 s
OUTPUT_BUCKETS = exponential_buckets(0.0005, 2, 18)       # ~65 s
PROCESS_BUCKETS = exponential_buckets(0.0005, 2, 19)      # ~2 min
EVENT_TIME_BUCKETS = exponential_buckets(0.0005, 2, 15) + exponential_buckets(
    0.0005 * (1 << 15), 8, 6
)  # 0~8 s then 16 s~150 h


def _fmt_labels(labels: Mapping[str, str]) -> str:
    if not labels:
        return ""
    inner = ",".join(
        f'{k}="{str(v).replace(chr(92), chr(92) * 2).replace(chr(34), chr(92) + chr(34))}"'
        for k, v in sorted(labels.items())
    )
    return "{" + inner + "}"


def _fmt_value(v: float) -> str:
    if v == float("inf"):
        return "+Inf"
    return repr(float(v)) if v != int(v) else str(int(v))


class Counter:
    def __init__(self, name: str, help_: str, label_names: Sequence[str]):
        self.name, self.help, self.label_names = name, help_, tuple(label_names)
        self._values: dict[tuple, float] = {}
        self._lock = threading.Lock()

    def inc(self, amount: float = 1.0, **labels) -> None:
        key = tuple(str(labels.get(n, "")) for n in self.label_names)
        with self._lock:
            self._values[key] = self._values.get(key, 0.0) + amount

    def render(self) -> list[str]:
        lines = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} counter"]
        for key, v in sorted(self._values.items()):
            lbl = _fmt_labels(dict(zip(self.label_names, key)))
            lines.append(f"{self.name}{lbl} {_fmt_value(v)}")
        return lines

    def reset(self) -> None:
        with self._lock:
            self._values.clear()


class Gauge(Counter):
    def set(self, value: float, **labels) -> None:
        key = tuple(str(labels.get(n, "")) for n in self.label_names)
        with self._lock:
            self._values[key] = float(value)

    def render(self) -> list[str]:
        lines = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} gauge"]
        for key, v in sorted(self._values.items()):
            lbl = _fmt_labels(dict(zip(self.label_names, key)))
            lines.append(f"{self.name}{lbl} {_fmt_value(v)}")
        return lines


class Histogram:
    def __init__(self, name: str, help_: str, label_names: Sequence[str], buckets: Sequence[float]):
        self.name, self.help, self.label_names = name, help_, tuple(label_names)
        self.buckets = list(buckets)
        self._counts: dict[tuple, list[int]] = {}
        self._sum: dict[tuple, float] = {}
        self._n: dict[tuple, int] = {}
        self._lock = threading.Lock()

    def observe(self, value: float, **labels) -> None:
        key = tuple(str(labels.get(n, "")) for n in self.label_names)
        with self._lock:
            counts = self._counts.setdefault(key, [0] * len(self.buckets))
            for i, ub in enumerate(self.buckets):
                if value <= ub:
                    counts[i] += 1
            self._sum[key] = self._sum.get(key, 0.0) + value
            self._n[key] = self._n.get(key, 0) + 1

    def render(self) -> list[str]:
        lines = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} histogram"]
        for key, counts in sorted(self._counts.items()):
            base = dict(zip(self.label_names, key))
            cum = 0
            for ub, c in zip(self.buckets, counts):
                cum += c
                lines.append(
                    f"{self.name}_bucket{_fmt_labels({**base, 'le': _fmt_value(ub)})} {cum}"
                )
            lines.append(
                f"{self.name}_bucket{_fmt_labels({**base, 'le': '+Inf'})} {self._n[key]}"
            )
            lines.append(f"{self.name}_sum{_fmt_labels(base)} {repr(self._sum[key])}")
            lines.append(f"{self.name}_count{_fmt_labels(base)} {self._n[key]}")
        return lines

    def reset(self) -> None:
        with self._lock:
            self._counts.clear()
            self._sum.clear()
            self._n.clear()


class MetricsRegistry:
    """The reference's metric set (pkg/metrics/metrics.go:20-132)."""

    def __init__(self) -> None:
        P = ["pipeline"]
        self.input_counter = Counter(
            "gravity_input_counter",
            "Number of message input received(generated)",
            P + ["db", "table", "type", "subtype"],
        )
        self.input_emitter_counter = Counter(
            "gravity_input_emitter_counter",
            "Number of message input sends to emitter", P,
        )
        self.emitter_scheduler_counter = Counter(
            "gravity_emitter_scheduler_counter",
            "Number of message emitter sends to scheduler", P,
        )
        self.scheduler_retry_counter = Counter(
            "gravity_scheduler_retry_counter",
            "Number of retries scheduler attempt", P,
        )
        self.scheduler_output_counter = Counter(
            "gravity_scheduler_output_counter",
            "Number of message scheduler sends to output", P,
        )
        self.output_counter = Counter(
            "gravity_output_counter",
            "Number of message output sends",
            P + ["cat0", "cat1", "cat2", "cat3"],
        )
        self.input_latency = Histogram(
            "gravity_input_latency", "Latency of input in seconds.", P, INPUT_BUCKETS
        )
        self.emitter_latency = Histogram(
            "gravity_emitter_latency", "Latency of emitter in seconds.", P, INPUT_BUCKETS
        )
        self.scheduler_total_latency = Histogram(
            "gravity_scheduler_total_latency",
            "Latency of scheduler from submit to end of ack in seconds.",
            P, INPUT_BUCKETS,
        )
        self.output_latency = Histogram(
            "gravity_output_latency", "Latency of output in seconds.", P, OUTPUT_BUCKETS
        )
        self.event_time_latency = Histogram(
            "gravity_event_time_latency",
            "Latency of end to end event time in seconds.", P, EVENT_TIME_BUCKETS,
        )
        self.process_time_latency = Histogram(
            "gravity_process_time_latency",
            "Latency of end to end process time in seconds.", P, PROCESS_BUCKETS,
        )
        self.queue_length = Gauge(
            "gravity_queue_length", "Length of internal queue", P + ["queue"]
        )
        self._all = [
            self.input_counter, self.input_emitter_counter,
            self.emitter_scheduler_counter, self.scheduler_retry_counter,
            self.scheduler_output_counter, self.output_counter,
            self.input_latency, self.emitter_latency,
            self.scheduler_total_latency, self.output_latency,
            self.event_time_latency, self.process_time_latency,
            self.queue_length,
        ]

    def render(self) -> str:
        lines: list[str] = []
        for m in self._all:
            lines.extend(m.render())
        return "\n".join(lines) + "\n"

    def reset(self) -> None:
        for m in self._all:
            m.reset()

    # --- Spark bridges ---------------------------------------------------

    def record_observation(self, pipeline: str, db: str, table: str, obs_result: Mapping) -> None:
        """Feed an Observation result (metrics.observe_input) into the
        input counter label set — per-op subtypes like the binlog
        tailer's insert/update/delete split."""
        for op in ("insert", "update", "delete"):
            n = obs_result.get(f"n_{op}")
            if n:
                self.input_counter.inc(
                    n, pipeline=pipeline, db=db, table=table, type="dml", subtype=op
                )

    def record_progress(self, pipeline: str, progress: Mapping) -> None:
        """Feed a StreamingQueryProgress snapshot (metrics.progress_snapshot)
        into stage counters/histograms."""
        n = progress.get("num_input_rows") or 0
        if n:
            self.input_emitter_counter.inc(n, pipeline=pipeline)
            self.emitter_scheduler_counter.inc(n, pipeline=pipeline)
            self.scheduler_output_counter.inc(n, pipeline=pipeline)
        dur = progress.get("duration_ms") or {}
        if "triggerExecution" in dur:
            self.process_time_latency.observe(dur["triggerExecution"] / 1000.0, pipeline=pipeline)
        if "addBatch" in dur:
            self.output_latency.observe(dur["addBatch"] / 1000.0, pipeline=pipeline)
        for so in progress.get("state_operators") or []:
            rows = so.get("numRowsTotal")
            if rows is not None:
                self.queue_length.set(rows, pipeline=pipeline, queue="state_rows")


class OpsServer:
    """/metrics, /status, /healthz, /reset on a background thread
    (cmd/gravity/main.go:95-105). `status_fn` supplies the /status JSON
    (position snapshot, progress); `reset_fn` is the position-reset hook
    (position_repos semantics) — metrics are always cleared."""

    def __init__(
        self,
        registry: MetricsRegistry,
        port: int = 0,
        status_fn: Callable[[], Mapping] | None = None,
        reset_fn: Callable[[], None] | None = None,
    ) -> None:
        self.registry = registry
        self.status_fn = status_fn or (lambda: {})
        self.reset_fn = reset_fn
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:
                if self.path == "/metrics":
                    self._send(
                        200, outer.registry.render().encode(),
                        "text/plain; version=0.0.4; charset=utf-8",
                    )
                elif self.path == "/healthz":
                    self._send(200, b"ok", "text/plain")
                elif self.path == "/status":
                    body = json.dumps(outer.status_fn(), default=str).encode()
                    self._send(200, body, "application/json")
                elif self.path == "/reset":
                    outer.registry.reset()
                    if outer.reset_fn is not None:
                        outer.reset_fn()
                    self._send(200, b"reset", "text/plain")
                else:
                    self._send(404, b"not found", "text/plain")

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "OpsServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
