"""Loopback fake Redis master for PSYNC client tests: speaks the real
replication wire bytes — RESP command decode, AUTH/PING/REPLCONF handling,
+FULLRESYNC / +CONTINUE, length-framed or diskless-EOF-framed RDB payload,
RESP command stream, REPLCONF ACK bookkeeping. Test infrastructure only;
the production client under test is ape_dts_spark/sources/redis_psync.py."""

from __future__ import annotations

import secrets
import socket
import threading

from ape_dts_spark.sources.redis_psync import RespSocket


class FakeMaster(threading.Thread):
    def __init__(
        self,
        rdb_bytes: bytes = b"",
        commands: list[list[str]] | None = None,
        repl_id: str | None = None,
        master_offset: int = 1000,
        diskless: bool = False,
        password: str | None = None,
        keepalive_newlines: int = 2,
        max_clients: int = 4,
        drop_after_bytes: int | None = None,
        offset_aware: bool = False,
        drop_resumes: bool = False,
    ):
        super().__init__(daemon=True)
        self.rdb_bytes = rdb_bytes
        self.commands = commands or []
        # drop_after_bytes: full-sync sessions send only that many stream
        # bytes then close (mid-command drop). offset_aware: +CONTINUE serves
        # the stream from the REQUESTED offset (relative to master_offset)
        # instead of replaying all commands — the real resume semantics.
        self.drop_after_bytes = drop_after_bytes
        self.offset_aware = offset_aware
        self.drop_resumes = drop_resumes
        self.repl_id = repl_id or secrets.token_hex(20)
        self.master_offset = master_offset
        self.diskless = diskless
        self.password = password
        self.keepalive_newlines = keepalive_newlines
        self.max_clients = max_clients
        self.acks: list[int] = []
        self.errors: list[str] = []
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
                t = threading.Thread(target=self._serve, args=(sock,), daemon=True)
                t.start()
        finally:
            self.srv.close()

    def stop(self) -> None:
        try:
            self.srv.close()
        except OSError:
            pass

    # -- one client session -------------------------------------------------
    def _serve(self, sock: socket.socket) -> None:
        sock.settimeout(30)
        conn = RespSocket(sock)
        authed = self.password is None
        try:
            while True:
                kind, v, _ = conn.read_value()
                if kind != "array" or not isinstance(v, list):
                    self.errors.append(f"non-array from client: {kind} {v!r}")
                    return
                argv = [
                    x.decode() if isinstance(x, bytes) else str(x) for x in v
                ]
                name = argv[0].lower()
                if name == "auth":
                    if argv[1] == self.password:
                        authed = True
                        conn.send_raw(b"+OK\r\n")
                    else:
                        conn.send_raw(b"-ERR invalid password\r\n")
                        return
                elif not authed:
                    conn.send_raw(b"-NOAUTH Authentication required.\r\n")
                    return
                elif name == "ping":
                    conn.send_raw(b"+PONG\r\n")
                elif name == "replconf":
                    if argv[1].lower() == "ack":
                        self.acks.append(int(argv[2]))  # ACK gets no reply
                    else:
                        conn.send_raw(b"+OK\r\n")
                elif name == "psync":
                    self._psync(conn, argv)
                    # after the stream: keep reading ACKs until client closes
                else:
                    conn.send_raw(f"-ERR unknown command '{argv[0]}'\r\n".encode())
        except (ValueError, OSError):
            return  # client closed

    def stream_bytes(self) -> bytes:
        out = bytearray()
        for cmd in self.commands:
            out += ("*%d\r\n" % len(cmd)).encode() + b"".join(
                b"$%d\r\n%s\r\n" % (len(a), a.encode()) for a in cmd
            )
        return bytes(out)

    def _psync(self, conn: RespSocket, argv: list[str]) -> None:
        if argv[1] == "?" or argv[2] == "-1":
            conn.send_raw(
                f"+FULLRESYNC {self.repl_id} {self.master_offset}\r\n".encode()
            )
            conn.send_raw(b"\n" * self.keepalive_newlines)  # fork keepalives
            if self.diskless:
                delim = secrets.token_hex(20).encode()  # 40 bytes
                conn.send_raw(b"$EOF:" + delim + b"\r\n")
                conn.send_raw(self.rdb_bytes + delim)
            else:
                conn.send_raw(
                    b"$" + str(len(self.rdb_bytes)).encode() + b"\r\n"
                )
                conn.send_raw(self.rdb_bytes)
            if self.drop_after_bytes is not None:
                conn.send_raw(self.stream_bytes()[: self.drop_after_bytes])
                conn.sock.close()  # mid-command drop: resume or bust
                return
        elif argv[1] == self.repl_id:
            conn.send_raw(b"+CONTINUE\r\n")
            if self.drop_resumes:
                conn.sock.close()  # a master that keeps failing resumes
                return
            if self.offset_aware:
                rel = int(argv[2]) - self.master_offset
                conn.send_raw(self.stream_bytes()[rel:])
                return
        else:
            conn.send_raw(
                f"+FULLRESYNC {self.repl_id} {self.master_offset}\r\n".encode()
            )
            conn.send_raw(b"$" + str(len(self.rdb_bytes)).encode() + b"\r\n")
            conn.send_raw(self.rdb_bytes)
        for cmd in self.commands:
            conn.send_cmd(*cmd)
