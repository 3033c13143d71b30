"""Out-of-process CAS lock service + client commit guard.

The :mod:`bazof_spark.commitguard` registry is the seam where a real
deployment plugs a network mutual-exclusion service (DynamoDB lock /
S3 If-None-Match PUT / GCS precondition) in front of object-store
publishes. This module proves the seam carries a REAL network CAS —
not just the in-process file-lock emulation — with the smallest
possible such service: a TCP lock server whose state lives in another
process, speaking a 4-verb line protocol, plus the client-side
:class:`LockServerGuard` that adapts it to the ``CommitGuard``
contract. The semantics mirror ``FileLockGuard`` exactly:

- ``acquire`` is a compare-and-set: it succeeds iff the resource is
  free (or its holder is stale), and hands out a holder token;
- stale breaking is token-verified on the HOLDER's side: a holder
  whose lock was broken (taken over after ``stale_after``) fails
  ``verify()`` — called immediately before the version-pointer flip —
  and the publish turns into a clean ``CommitConflictError`` retry
  instead of a lost update;
- ``release`` only releases the caller's OWN token, so releasing
  after a stale-break never removes a successor's lock.

Protocol (one request per connection, UTF-8 lines; fields are
URL-quoted so resources may be arbitrary URIs)::

    ACQUIRE <resource> <token> <stale_after_s>  ->  OK | HELD
    VERIFY  <resource> <token>                  ->  OK | LOST
    RELEASE <resource> <token>                  ->  OK
    PING                                        ->  OK

Run standalone: ``python -m bazof_spark.lockserver --port 0`` (prints
``PORT <n>`` once bound; binds loopback only). Register for a scheme::

    from bazof_spark.lockserver import register_lockserver_guard
    register_lockserver_guard("s3", "127.0.0.1", port)

after which EVERY commit path (writer + maintenance publishes resolve
through ``commitguard.guard_for``) on ``s3://`` tables serializes its
check→flip window through the server.
"""

from __future__ import annotations

import argparse
import socket
import socketserver
import threading
import time
import urllib.parse
import uuid

from bazof_spark.commitguard import (
    STALE_AFTER_S,
    CommitGuard,
    HeldGuard,
    register_commit_guard,
)
from bazof_spark.errors import CommitConflictError

_ENC = "utf-8"


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------


class _LockState:
    """resource -> (token, monotonic acquire time); every operation is
    atomic under one mutex — the server IS the point of serialization,
    which is what makes acquire a true CAS across client processes."""

    def __init__(self) -> None:
        self._held: dict[str, tuple[str, float]] = {}
        self._mu = threading.Lock()

    def acquire(self, resource: str, token: str, stale_after: float) -> bool:
        now = time.monotonic()
        with self._mu:
            cur = self._held.get(resource)
            if cur is not None and now - cur[1] <= stale_after:
                return False
            # free, or abandoned by a holder that stopped heartbeating
            # its publish window: take over. The old holder's verify()
            # now fails (token changed) — same discipline as the file
            # guard's token-verified stale break.
            self._held[resource] = (token, now)
            return True

    def verify(self, resource: str, token: str) -> bool:
        with self._mu:
            cur = self._held.get(resource)
            return cur is not None and cur[0] == token

    def release(self, resource: str, token: str) -> None:
        with self._mu:
            cur = self._held.get(resource)
            if cur is not None and cur[0] == token:
                del self._held[resource]


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # one request per connection
        state: _LockState = self.server.lock_state  # type: ignore[attr-defined]
        line = self.rfile.readline(8192).decode(_ENC, "replace").strip()
        parts = line.split(" ")
        verb = parts[0].upper() if parts else ""
        try:
            if verb == "PING":
                reply = "OK"
            elif verb == "ACQUIRE" and len(parts) == 4:
                res = urllib.parse.unquote(parts[1])
                ok = state.acquire(res, parts[2], float(parts[3]))
                reply = "OK" if ok else "HELD"
            elif verb == "VERIFY" and len(parts) == 3:
                res = urllib.parse.unquote(parts[1])
                reply = "OK" if state.verify(res, parts[2]) else "LOST"
            elif verb == "RELEASE" and len(parts) == 3:
                res = urllib.parse.unquote(parts[1])
                state.release(res, parts[2])
                reply = "OK"
            else:
                reply = "ERR bad request"
        except Exception as exc:  # malformed floats etc.
            reply = f"ERR {exc}"
        self.wfile.write((reply + "\n").encode(_ENC))


class LockServer(socketserver.ThreadingTCPServer):
    """Loopback-only threaded TCP lock server; state in ``lock_state``."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, port: int = 0):
        super().__init__(("127.0.0.1", port), _Handler)
        self.lock_state = _LockState()

    @property
    def port(self) -> int:
        return self.server_address[1]


def serve(port: int = 0) -> None:
    """Blocking entrypoint: bind, announce ``PORT <n>``, serve forever."""
    srv = LockServer(port)
    print(f"PORT {srv.port}", flush=True)
    srv.serve_forever()


# ---------------------------------------------------------------------------
# Client guard
# ---------------------------------------------------------------------------


def _roundtrip(host: str, port: int, line: str, timeout: float) -> str:
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall((line + "\n").encode(_ENC))
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(256)
            if not chunk:
                break
            buf += chunk
    return buf.decode(_ENC, "replace").strip()


class _HeldRemoteLock(HeldGuard):
    def __init__(self, host: str, port: int, resource: str, token: str,
                 timeout: float):
        self._host, self._port = host, port
        self._res, self._token = resource, token
        self._timeout = timeout

    def verify(self) -> None:
        """Holder's half of safe stale-breaking, over the network: if
        the server no longer maps the resource to OUR token, a breaker
        took over and another writer may have published — abort before
        the pointer flip. A network failure here also aborts: with the
        lock state unknowable, retrying is the only safe outcome."""
        q = urllib.parse.quote(self._res, safe="")
        try:
            reply = _roundtrip(
                self._host, self._port,
                f"VERIFY {q} {self._token}", self._timeout,
            )
        except OSError as exc:
            raise CommitConflictError(
                f"lock server unreachable at verify ({exc}); lock state "
                "unknown — re-read and retry"
            ) from exc
        if reply != "OK":
            raise CommitConflictError(
                f"lock on {self._res} was broken as stale while this "
                f"publish ran (server reply {reply!r}); re-read and retry"
            )

    def release(self) -> None:
        q = urllib.parse.quote(self._res, safe="")
        try:
            _roundtrip(
                self._host, self._port,
                f"RELEASE {q} {self._token}", self._timeout,
            )
        except OSError:
            # the server releases-by-token, so a lost RELEASE degrades
            # to a stale lock the next acquirer breaks — never a wedge
            pass


class LockServerGuard(CommitGuard):
    """CommitGuard backed by the out-of-process lock server — the
    reference shape for any network CAS (DynamoDB lock client, etcd,
    ZooKeeper) plugged into ``register_commit_guard``."""

    def __init__(
        self,
        host: str,
        port: int,
        resource: str,
        stale_after: float = STALE_AFTER_S,
        timeout: float = 5.0,
    ):
        self._host, self._port = host, port
        self._res = resource
        self._stale_after = stale_after
        self._timeout = timeout

    def acquire(self) -> HeldGuard:
        token = uuid.uuid4().hex
        q = urllib.parse.quote(self._res, safe="")
        try:
            reply = _roundtrip(
                self._host, self._port,
                f"ACQUIRE {q} {token} {self._stale_after}", self._timeout,
            )
        except OSError as exc:
            raise CommitConflictError(
                f"lock server unreachable ({exc}); cannot serialize the "
                "publish window — retry"
            ) from exc
        if reply != "OK":
            raise CommitConflictError(
                f"commit lock on {self._res} held by a concurrent writer "
                "(lock server); re-read the table and retry"
            )
        return _HeldRemoteLock(
            self._host, self._port, self._res, token, self._timeout
        )


def register_lockserver_guard(
    scheme: str,
    host: str,
    port: int,
    stale_after: float = STALE_AFTER_S,
) -> None:
    """Route every commit on ``scheme://`` tables through the server
    (the table URI is the lock resource, so distinct tables never
    contend)."""
    register_commit_guard(
        scheme,
        lambda uri: LockServerGuard(host, port, uri, stale_after=stale_after),
    )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--port", type=int, default=0,
                   help="TCP port (0 = OS-assigned; printed as PORT <n>)")
    args = p.parse_args()
    serve(args.port)


if __name__ == "__main__":
    main()
