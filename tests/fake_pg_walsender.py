"""Loopback fake PostgreSQL walsender for replication-client tests: speaks
the real frontend/backend v3 bytes — startup + (optional cleartext) auth,
IDENTIFY_SYSTEM / CREATE_REPLICATION_SLOT simple-query responses,
START_REPLICATION -> CopyBothResponse, keepalives, XLogData frames (built
by the at-rest pgoutput encoder), standby-status-update bookkeeping. Test
infrastructure only; the production client under test is
ape_dts_spark/sources/pg_replication.py."""

from __future__ import annotations

import socket
import struct
import threading

from ape_dts_spark.sources.pg_replication import PgSocket, _cstr


def segment_to_frames(segment: bytes) -> list[bytes]:
    """Captured-segment bytes (u32 len + XLogData each) -> the raw XLogData
    messages a live walsender sends as CopyData payloads."""
    frames, i = [], 0
    while i < len(segment):
        (ln,) = struct.unpack(">I", segment[i : i + 4])
        frames.append(segment[i + 4 : i + 4 + ln])
        i += 4 + ln
    return frames


def _row_description(cols: list[str]) -> bytes:
    out = struct.pack(">H", len(cols))
    for c in cols:
        out += _cstr(c) + struct.pack(">IHIhiH", 0, 0, 25, -1, -1, 0)
    return out


def _data_row(vals: list[str]) -> bytes:
    out = struct.pack(">H", len(vals))
    for v in vals:
        b = v.encode()
        out += struct.pack(">i", len(b)) + b
    return out


class FakeWalsender(threading.Thread):
    def __init__(
        self,
        frames: list[bytes] | None = None,
        password: str | None = None,
        known_slots: set[str] | None = None,
        keepalive_first: bool = True,
        max_clients: int = 4,
    ):
        super().__init__(daemon=True)
        self.frames = frames or []
        self.password = password
        self.known_slots = known_slots  # None = accept any slot
        self.keepalive_first = keepalive_first
        self.startups: list[dict] = []
        self.status_updates: list[tuple[int, int, int, int]] = []
        self.max_clients = max_clients
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(max_clients)
        self.port = self.srv.getsockname()[1]
        self.srv.settimeout(30)

    def run(self) -> None:
        handled = 0
        try:
            while handled < self.max_clients:
                try:
                    sock, _ = self.srv.accept()
                except (socket.timeout, OSError):
                    return
                handled += 1
                threading.Thread(
                    target=self._serve, args=(sock,), daemon=True
                ).start()
        finally:
            self.srv.close()

    def stop(self) -> None:
        try:
            self.srv.close()
        except OSError:
            pass

    def _serve(self, sock: socket.socket) -> None:
        sock.settimeout(30)
        conn = PgSocket(sock)
        try:
            params = conn.read_startup()
            self.startups.append(params)
            if self.password is not None:
                conn.send_msg(b"R", struct.pack(">I", 3))  # CleartextPassword
                mtype, payload = conn.read_msg()
                if mtype != b"p" or payload.rstrip(b"\x00").decode() != self.password:
                    conn.send_msg(
                        b"E",
                        b"SFATAL\x00C28P01\x00M" + _cstr("password authentication failed") + b"\x00",
                    )
                    return
            conn.send_msg(b"R", struct.pack(">I", 0))  # AuthenticationOk
            conn.send_msg(b"S", _cstr("server_version") + _cstr("16.3"))
            conn.send_msg(b"K", struct.pack(">II", 4242, 7))
            conn.send_msg(b"Z", b"I")
            while True:
                mtype, payload = conn.read_msg()
                if mtype == b"Q":
                    self._query(conn, payload.rstrip(b"\x00").decode())
                elif mtype == b"d" and payload[:1] == b"r":
                    rx, fl, ap, _clock, reply = struct.unpack(
                        ">QQQqB", payload[1:34]
                    )
                    self.status_updates.append((rx, fl, ap, reply))
                elif mtype == b"X":
                    return
        except (ValueError, OSError):
            return  # client closed

    def _query(self, conn: PgSocket, sql: str) -> None:
        up = sql.upper()
        if up.startswith("IDENTIFY_SYSTEM"):
            conn.send_msg(b"T", _row_description(
                ["systemid", "timeline", "xlogpos", "dbname"]))
            conn.send_msg(b"D", _data_row(
                ["7000000000000000001", "1", "1/0", "postgres"]))
            conn.send_msg(b"C", _cstr("IDENTIFY_SYSTEM"))
            conn.send_msg(b"Z", b"I")
        elif up.startswith("CREATE_REPLICATION_SLOT"):
            slot = sql.split()[1]
            conn.send_msg(b"T", _row_description(
                ["slot_name", "consistent_point", "snapshot_name",
                 "output_plugin"]))
            conn.send_msg(b"D", _data_row(
                [slot, "1/0", "00000003-000001", "pgoutput"]))
            conn.send_msg(b"C", _cstr("CREATE_REPLICATION_SLOT"))
            conn.send_msg(b"Z", b"I")
        elif up.startswith("START_REPLICATION"):
            slot = sql.split()[2]
            if self.known_slots is not None and slot not in self.known_slots:
                conn.send_msg(
                    b"E",
                    b"SERROR\x00C42704\x00M"
                    + _cstr(f'replication slot "{slot}" does not exist')
                    + b"\x00",
                )
                conn.send_msg(b"Z", b"I")
                return
            conn.send_msg(b"W", b"\x00\x00\x00")  # CopyBothResponse
            if self.keepalive_first:  # primary keepalive requesting a reply
                conn.send_msg(b"d", b"k" + struct.pack(">QqB", 0, 0, 1))
            for frame in self.frames:
                conn.send_msg(b"d", frame)
        else:
            conn.send_msg(b"E", b"SERROR\x00M" + _cstr("unknown command") + b"\x00")
            conn.send_msg(b"Z", b"I")
