"""Pull-based data subscription with ack-advanced positions.

Reference: the HTTP server pipeline (dt-pipeline/src/http_server_pipeline.rs:
122-141,149-363) exposes ``/info``, ``/fetch_new``, ``/fetch_old`` and
``/ack`` so downstream consumers pull change batches at their own pace;
positions only advance when the consumer acks, so an un-acked batch is
re-served by ``/fetch_old`` after a consumer crash.

Spark-native shape: the versioned ``ParquetTable`` commit log (the Delta-CDF
stand-in) *is* the retained change buffer — ``changes_between(v1, v2)``
reconstructs the events between any two committed versions, so the
subscription only has to persist two integers per consumer:

- ``acked``   — last version the consumer confirmed durable,
- ``fetched`` — last version served by ``fetch_new``.

``fetch_new`` serves ``(fetched, current]`` and advances ``fetched``;
``fetch_old`` re-serves ``(acked, fetched]`` without advancing anything;
``ack(v)`` advances ``acked`` (never past ``fetched``, never backwards).
State is a JSON file per (table, consumer) — crash-safe like the reference's
position files.

``serve()`` wraps the same object in a stdlib ThreadingHTTPServer with the
reference's four endpoints returning JSON rows. The HTTP facade collects
batches to the driver — it is a *consumer edge* for modest change volumes
(the reference's use case: notify/pull integration), not a bulk transport;
bulk consumers read the change feed DataFrames directly.
"""

from __future__ import annotations

import json
import logging
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame

from ape_dts_spark.sinks.parquet_table import ParquetTable


class DataSubscription:
    def __init__(
        self,
        table: ParquetTable,
        key_cols: list[str],
        state_path: str,
        consumer: str = "default",
    ):
        self.table = table
        self.key_cols = key_cols
        self.state_file = os.path.join(state_path, f"subscription_{consumer}.json")
        os.makedirs(state_path, exist_ok=True)

    # -- positions ----------------------------------------------------------

    def _state(self) -> dict:
        if not os.path.exists(self.state_file):
            return {"acked": -1, "fetched": -1}
        with open(self.state_file) as f:
            return json.load(f)

    def _save(self, st: dict) -> None:
        tmp = self.state_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self.state_file)

    def info(self) -> dict:
        st = self._state()
        return {
            "acked": st["acked"],
            "fetched": st["fetched"],
            "current": self.table.version(),
        }

    # -- pulls --------------------------------------------------------------

    def fetch_new(self) -> tuple[DataFrame, int]:
        """Changes in (fetched, current]; advances the fetched position.
        Returns (events, version) — ack the version once durable."""
        st = self._state()
        current = self.table.version()
        events = self.table.changes_between(st["fetched"], current, self.key_cols)
        if current > st["fetched"]:
            st["fetched"] = current
            self._save(st)
        return events, current

    def fetch_old(self) -> tuple[DataFrame, int]:
        """Re-serve the un-acked window (acked, fetched] — what a consumer
        replays after crashing between fetch and ack. Advances nothing."""
        st = self._state()
        events = self.table.changes_between(st["acked"], st["fetched"], self.key_cols)
        return events, st["fetched"]

    def ack(self, version: int) -> dict:
        st = self._state()
        if version > st["fetched"]:
            raise ValueError(f"ack({version}) ahead of fetched={st['fetched']}")
        if version > st["acked"]:
            st["acked"] = version
            self._save(st)
        return {"acked": st["acked"]}

    # -- HTTP facade --------------------------------------------------------

    def serve(self, port: int = 0) -> tuple[ThreadingHTTPServer, int]:
        """Start the reference's pull API on a background thread. Returns
        (server, bound_port); call server.shutdown() to stop."""
        sub = self

        class Handler(BaseHTTPRequestHandler):
            def _json(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _rows(self, df: DataFrame, version: int):
                # Arrow collect (df.toArrow) + to_pylist: the same
                # list-of-dicts (nested structs -> dicts, Python-native
                # scalars) as Row.asDict(recursive=True), minus the
                # row-at-a-time pickle + per-row dict rebuild — the facade
                # collects whole change batches, so the driver transfer
                # dominates the endpoint (guide: Arrow for driver transfers)
                rows = df.toArrow().to_pylist()
                self._json({"version": version, "events": rows})

            def do_GET(self):
                if self.path == "/info":
                    self._json(sub.info())
                elif self.path == "/fetch_new":
                    self._rows(*sub.fetch_new())
                elif self.path == "/fetch_old":
                    self._rows(*sub.fetch_old())
                else:
                    self._json({"error": "unknown endpoint"}, 404)

            def do_POST(self):
                if self.path.startswith("/ack"):
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    try:
                        self._json(sub.ack(int(payload["version"])))
                    except ValueError as e:
                        self._json({"error": str(e)}, 409)
                else:
                    self._json({"error": "unknown endpoint"}, 404)

            def log_message(self, fmt, *args):
                # route the access log through logging instead of stderr so
                # test output stays quiet but nothing is silently dropped
                logging.getLogger(__name__).debug("subscription http: " + fmt, *args)

        server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server, server.server_address[1]
