"""Loopback fake mongod for wire-client tests: speaks the real OP_MSG
bytes — header framing, kind-0/kind-1 sections, optional CRC-32C — and the
command surface the production client uses: ``hello``, SCRAM-SHA-256
``saslStart``/``saslContinue`` (verifying the client proof and signing the
server final), ``find`` with the snapshot/oplog filter shapes (empty,
``{ts: {$gte}}``, ``{$expr: {$gt: ["$_id", key]}}``) evaluated over stored
documents with BSON type-order ``_id`` sorting, ``getMore`` cursor pages,
``killCursors``, and ``count``. Test infrastructure only; the production
client under test is ape_dts_spark/sources/mongo_client.py."""

from __future__ import annotations

import base64
import hashlib
import hmac
import secrets
import socket
import struct
import threading

from ape_dts_spark.sources import bson_codec as bc
from ape_dts_spark.sources.mongo_client import MongoSocket

# BSON type-order ranks (MongoDB "Comparison/Sort Order" docs): numbers sort
# together before strings; the subset covers the _id types fixtures use.
_RANKS = [
    (type(None), 5),
    (bool, 40),  # before int — bool is an int subclass
    ((int, float), 10),
    (str, 15),
    (dict, 20),
    (list, 25),
    (bc.Binary, 30),
    (bc.ObjectId, 35),
    (bc.DateTime, 45),
    (bc.Timestamp, 50),
]


def bson_sort_key(v):
    for klass, rank in _RANKS:
        if isinstance(v, klass):
            if isinstance(v, bc.ObjectId):
                return (rank, v.raw)
            if isinstance(v, bc.Binary):
                return (rank, v.data)
            if isinstance(v, bc.DateTime):
                return (rank, v.ms)
            if isinstance(v, bc.Timestamp):
                return (rank, v.sort_key())
            if isinstance(v, (dict, list)):
                return (rank, str(v))
            if isinstance(v, bool):
                return (rank, int(v))
            return (rank, v)
    raise TypeError(f"no BSON sort rank for {type(v).__name__}")


def _matches(doc: dict, filt: dict | None) -> bool:
    if not filt:
        return True
    if "ts" in filt and isinstance(filt["ts"], dict) and "$gte" in filt["ts"]:
        ts = doc.get("ts")
        want = filt["ts"]["$gte"]
        return isinstance(ts, bc.Timestamp) and ts.sort_key() >= want.sort_key()
    if "$expr" in filt:
        (op, args), = filt["$expr"].items()
        if op != "$gt" or args[0] != "$_id":
            raise ValueError(f"fake mongod: unsupported $expr {filt}")
        return bson_sort_key(doc.get("_id")) > bson_sort_key(args[1])
    # exact-match fallback for simple equality filters
    return all(doc.get(k) == v for k, v in filt.items())


class FakeMongod(threading.Thread):
    """``collections``: {(db, coll): [doc, ...]}. ``users``: {name: password}
    — when non-empty, every command except hello/sasl* requires a completed
    SCRAM-SHA-256 exchange. ``hold_tail_open``: tailable cursors on the
    oplog keep a live id after draining (the real TailableAwait shape), so
    client-side max_docs / timeout bounding is exercised; when False the
    drained cursor closes (deterministic bounded gates)."""

    def __init__(
        self,
        collections: dict[tuple[str, str], list[dict]],
        users: dict[str, str] | None = None,
        hold_tail_open: bool = False,
        checksum_replies: bool = False,
        max_clients: int = 16,
        change_events: list[dict] | None = None,
    ):
        super().__init__(daemon=True)
        self.collections = collections
        self.users = users or {}
        # deployment-level change-stream events served by the $changeStream
        # aggregation (each carries _id resume token + clusterTime)
        self.change_events = change_events or []
        self.hold_tail_open = hold_tail_open
        self.checksum_replies = checksum_replies
        self.max_clients = max_clients
        self.commands_seen: list[str] = []
        self.killed_cursors: list[int] = []
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(max_clients)
        self.port = self.srv.getsockname()[1]
        self.srv.settimeout(60)

    def run(self) -> None:
        handled = 0
        try:
            while handled < self.max_clients:
                try:
                    sock, _ = self.srv.accept()
                except (socket.timeout, OSError):
                    return
                handled += 1
                threading.Thread(target=self._serve, args=(sock,), daemon=True).start()
        finally:
            self.srv.close()

    def stop(self) -> None:
        try:
            self.srv.close()
        except OSError:
            pass

    # -- session ------------------------------------------------------------
    def _serve(self, sock: socket.socket) -> None:
        sock.settimeout(60)
        conn = MongoSocket(sock)
        cursors: dict[int, dict] = {}  # id -> {db, coll, docs, pos, tailable}
        next_cursor = [secrets.randbelow(1 << 30) + 1]
        authed = [not self.users]
        scram: dict = {}
        from ape_dts_spark.sources.mongo_client import encode_op_msg

        def reply(to_rid: int, doc: dict) -> None:
            rid = conn.next_request_id
            conn.next_request_id += 1
            sock.sendall(encode_op_msg(
                doc, rid, response_to=to_rid, checksum=self.checksum_replies
            ))

        try:
            while True:
                rid, _, cmd = conn.read_msg()
                name = next(iter(cmd))
                self.commands_seen.append(name)
                if name == "hello":
                    reply(rid, {
                        "isWritablePrimary": True, "setName": "rs0",
                        "maxWireVersion": 17, "minWireVersion": 0,
                        "maxBsonObjectSize": 16 * 1024 * 1024, "ok": 1.0,
                    })
                elif name == "saslStart":
                    out = self._sasl_start(cmd, scram)
                    reply(rid, out)
                elif name == "saslContinue":
                    out = self._sasl_continue(cmd, scram, authed)
                    reply(rid, out)
                elif not authed[0]:
                    reply(rid, {"ok": 0.0, "code": 13,
                                "errmsg": "command requires authentication"})
                elif name == "count":
                    docs = self.collections.get((cmd["$db"], cmd["count"]), [])
                    reply(rid, {"n": len(docs), "ok": 1.0})
                elif name == "find":
                    reply(rid, self._find(cmd, cursors, next_cursor))
                elif name == "aggregate":
                    reply(rid, self._aggregate(cmd, cursors, next_cursor))
                elif name == "getMore":
                    reply(rid, self._get_more(cmd, cursors))
                elif name == "killCursors":
                    ids = [int(getattr(c, "value", c)) for c in cmd.get("cursors", [])]
                    for cid in ids:
                        cursors.pop(cid, None)
                        self.killed_cursors.append(cid)
                    reply(rid, {"cursorsKilled": ids, "ok": 1.0})
                else:
                    reply(rid, {"ok": 0.0, "code": 59,
                                "errmsg": f"no such command: '{name}'"})
        except (ValueError, OSError):
            return

    # -- SCRAM server side ---------------------------------------------------
    def _sasl_start(self, cmd: dict, scram: dict) -> dict:
        payload = bytes(cmd["payload"].data).decode()
        if cmd.get("mechanism") != "SCRAM-SHA-256":
            return {"ok": 0.0, "code": 2,
                    "errmsg": f"unsupported mechanism {cmd.get('mechanism')}"}
        bare = payload.split(",", 2)[2]  # strip gs2 header "n,,"
        attrs = dict(p.split("=", 1) for p in bare.split(","))
        cnonce = attrs["r"]
        user = attrs.get("n", "").replace("=2C", ",").replace("=3D", "=")
        if user not in self.users:
            return {"ok": 0.0, "code": 18,
                    "errmsg": f"authentication failed for {user!r}"}
        snonce = cnonce + base64.b64encode(secrets.token_bytes(18)).decode()
        salt, iters = secrets.token_bytes(16), 4096
        password = self.users[user]
        salted = hashlib.pbkdf2_hmac("sha256", password.encode(), salt, iters)
        server_first = f"r={snonce},s={base64.b64encode(salt).decode()},i={iters}"
        scram.update(
            bare=bare, server_first=server_first, snonce=snonce, salted=salted
        )
        return {"conversationId": 1, "done": False,
                "payload": bc.Binary(server_first.encode()), "ok": 1.0}

    def _sasl_continue(self, cmd: dict, scram: dict, authed: list) -> dict:
        payload = bytes(cmd["payload"].data).decode()
        if authed[0] or not payload:  # post-verification empty exchange
            authed[0] = True
            return {"conversationId": 1, "done": True,
                    "payload": bc.Binary(b""), "ok": 1.0}
        attrs = dict(p.split("=", 1) for p in payload.split(","))
        if attrs.get("r") != scram["snonce"]:
            return {"ok": 0.0, "code": 18, "errmsg": "nonce mismatch"}
        client_key = hmac.digest(scram["salted"], b"Client Key", "sha256")
        stored_key = hashlib.sha256(client_key).digest()
        without_proof = payload.rsplit(",p=", 1)[0]
        auth_msg = f"{scram['bare']},{scram['server_first']},{without_proof}".encode()
        want = bytes(
            a ^ b
            for a, b in zip(client_key, hmac.digest(stored_key, auth_msg, "sha256"))
        )
        if base64.b64decode(attrs["p"]) != want:
            return {"ok": 0.0, "code": 18, "errmsg": "authentication failed"}
        server_key = hmac.digest(scram["salted"], b"Server Key", "sha256")
        sig = base64.b64encode(hmac.digest(server_key, auth_msg, "sha256")).decode()
        authed[0] = True
        return {"conversationId": 1, "done": True,
                "payload": bc.Binary(f"v={sig}".encode()), "ok": 1.0}

    # -- cursors -------------------------------------------------------------
    def _find(self, cmd: dict, cursors: dict, next_cursor: list) -> dict:
        db, coll = cmd["$db"], cmd["find"]
        key = (db, coll)
        if key not in self.collections:
            docs: list[dict] = []
        else:
            docs = [d for d in self.collections[key] if _matches(d, cmd.get("filter"))]
        if cmd.get("sort"):
            (field, direction), = cmd["sort"].items()
            docs = sorted(
                docs, key=lambda d: bson_sort_key(d.get(field)),
                reverse=direction < 0,
            )
        if cmd.get("limit"):
            docs = docs[: int(cmd["limit"])]
        batch = int(cmd.get("batchSize", 101))
        first, rest = docs[:batch], docs[batch:]
        tailable = bool(cmd.get("tailable")) and self.hold_tail_open
        if rest or tailable:
            cid = next_cursor[0]
            next_cursor[0] += 1
            cursors[cid] = {"coll": coll, "docs": rest, "tailable": tailable}
        else:
            cid = 0
        return {
            "cursor": {"firstBatch": first, "id": bc.Int64(cid),
                       "ns": f"{db}.{coll}"},
            "ok": 1.0,
        }

    def _aggregate(self, cmd: dict, cursors: dict, next_cursor: list) -> dict:
        """Deployment-level $changeStream aggregation: serves the configured
        change-stream events, honoring startAtOperationTime (clusterTime >=)
        XOR startAfter (strictly after the event with that _id token)."""
        pipeline = cmd.get("pipeline") or []
        if not (pipeline and isinstance(pipeline[0], dict)
                and "$changeStream" in pipeline[0]):
            return {"ok": 0.0, "code": 40324,
                    "errmsg": "only $changeStream aggregations supported"}
        stage = pipeline[0]["$changeStream"]
        events = list(self.change_events)
        if "startAfter" in stage:
            token = stage["startAfter"]
            idx = next((i for i, e in enumerate(events) if e.get("_id") == token),
                       None)
            if idx is None:
                return {"ok": 0.0, "code": 286,
                        "errmsg": "resume token not found"}
            events = events[idx + 1:]
        elif "startAtOperationTime" in stage:
            want = stage["startAtOperationTime"].sort_key()
            events = [
                e for e in events
                if isinstance(e.get("clusterTime"), bc.Timestamp)
                and e["clusterTime"].sort_key() >= want
            ]
        batch = int((cmd.get("cursor") or {}).get("batchSize", 101))
        first, rest = events[:batch], events[batch:]
        tailable = self.hold_tail_open
        if rest or tailable:
            cid = next_cursor[0]
            next_cursor[0] += 1
            cursors[cid] = {"coll": "$cmd.aggregate", "docs": rest,
                            "tailable": tailable}
        else:
            cid = 0
        return {
            "cursor": {"firstBatch": first, "id": bc.Int64(cid),
                       "ns": f"{cmd['$db']}.$cmd.aggregate"},
            "ok": 1.0,
        }

    def _get_more(self, cmd: dict, cursors: dict) -> dict:
        cid = int(getattr(cmd["getMore"], "value", cmd["getMore"]))
        state = cursors.get(cid)
        if state is None:
            return {"ok": 0.0, "code": 43, "errmsg": f"cursor id {cid} not found"}
        batch = int(cmd.get("batchSize", 101))
        out, state["docs"] = state["docs"][:batch], state["docs"][batch:]
        if state["docs"] or state["tailable"]:
            new_id = cid
        else:
            new_id = 0
            cursors.pop(cid, None)
        if state["tailable"] and not out:
            # TailableAwait with nothing new: stall past the client's socket
            # timeout before replying — the bounded pull must end via its
            # own timeout, exactly like a quiet production oplog
            import time

            time.sleep(10)
        return {
            "cursor": {"nextBatch": out, "id": bc.Int64(new_id),
                       "ns": f"{cmd['$db']}.{state['coll']}"},
            "ok": 1.0,
        }
