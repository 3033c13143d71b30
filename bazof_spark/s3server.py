"""Minimal S3-protocol object-store server — pure stdlib, in-memory.

The reference runs on any ``object_store`` backend
(/root/reference/README.md:47, crates/azof/src/lakehouse.rs:19-27).
The repo's ``BAZOF_FS_EMULATE`` harness exercises every URI code branch
but swaps the transport for the local filesystem; THIS module closes
the remaining seam with a real network S3 endpoint: pyarrow's
S3FileSystem (the AWS C++ SDK) speaks genuine HTTP S3 REST —
ListObjectsV2, ranged GETs, multipart uploads, CopyObject, batch
DeleteObjects — against this server, so the writer→scan→maintenance
loop runs over an actual object-store protocol with no local-path
fallback anywhere (``tests/test_object_store_real.py``).

Supported API (the subset pyarrow's S3FileSystem + this repo's iofs
layer exercise):

- Bucket: PUT (create), HEAD, GET ?list-type=2 (prefix/delimiter/
  continuation-token/max-keys), GET ?location, POST ?delete (batch)
- Object: PUT (incl. ``x-amz-copy-source`` = CopyObject), GET (with
  Range), HEAD, DELETE
- Multipart: POST ?uploads, PUT ?partNumber&uploadId, POST ?uploadId
  (complete), DELETE ?uploadId (abort)

Auth headers are accepted and ignored (this is a test double, not a
service — like moto/MinIO in anonymous mode). State is in-memory and
thread-safe; run standalone with ``python -m bazof_spark.s3server
[--port N]`` or in-process via :class:`S3Server`.
"""

from __future__ import annotations

import hashlib
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, quote, unquote, urlsplit
from xml.sax.saxutils import escape

_XMLNS = "http://s3.amazonaws.com/doc/2006-03-01/"


def _rfc3339(ts: float) -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%S.000Z", time.gmtime(ts))


def _etag(data: bytes) -> str:
    return '"%s"' % hashlib.md5(data).hexdigest()


class _Store:
    """Thread-safe in-memory bucket/key/bytes store."""

    def __init__(self) -> None:
        self.lock = threading.RLock()
        #: bucket -> key -> (bytes, mtime)
        self.buckets: dict[str, dict[str, tuple[bytes, float]]] = {}
        #: GET census (test instrumentation): ("bucket/key", Range
        #: header or None) per object GET — lets reader tests count
        #: ranged GETs per file (the object-store cost model)
        self.get_log: list[tuple[str, str | None]] = []
        #: upload_id -> (bucket, key, {part_number: bytes})
        self.uploads: dict[str, tuple[str, str, dict[int, bytes]]] = {}
        self._upload_seq = 0

    def new_upload(self, bucket: str, key: str) -> str:
        with self.lock:
            self._upload_seq += 1
            uid = f"upload-{self._upload_seq:08d}"
            self.uploads[uid] = (bucket, key, {})
            return uid


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    store: _Store  # set by the server factory

    # -- plumbing ----------------------------------------------------------

    def log_message(self, fmt, *args):  # silence the default stderr spam
        pass

    def _respond(
        self,
        status: int,
        body: bytes = b"",
        headers: dict[str, str] | None = None,
    ) -> None:
        self.send_response(status)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        # RFC 9110 §8.6: a message must not carry two differing
        # Content-Length headers — when the caller already framed the
        # response (HEAD replaying a GET's length, ranged GETs), don't
        # append a second one
        if not any(
            k.lower() == "content-length" for k in (headers or {})
        ):
            self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body and self.command != "HEAD":
            self.wfile.write(body)

    def _xml(self, status: int, inner: str, root: str) -> None:
        body = (
            f'<?xml version="1.0" encoding="UTF-8"?>'
            f'<{root} xmlns="{_XMLNS}">{inner}</{root}>'
        ).encode()
        self._respond(
            status, body, {"Content-Type": "application/xml"}
        )

    def _error(self, status: int, code: str, message: str = "") -> None:
        self._xml(
            status,
            f"<Code>{code}</Code><Message>{escape(message)}</Message>",
            "Error",
        )

    def _parse(self):
        parts = urlsplit(self.path)
        path = unquote(parts.path)
        bucket, _, key = path.lstrip("/").partition("/")
        return bucket, key, parse_qs(parts.query, keep_blank_values=True)

    def _read_body(self) -> bytes:
        if self.headers.get("Transfer-Encoding", "").lower() == "chunked":
            chunks = []
            while True:
                size_line = self.rfile.readline().strip()
                # ignore chunk extensions (aws-chunked signatures)
                size = int(size_line.split(b";")[0], 16)
                if size == 0:
                    # trailing headers until blank line
                    while self.rfile.readline().strip():
                        pass
                    return b"".join(chunks)
                chunks.append(self.rfile.read(size))
                self.rfile.read(2)  # CRLF
        n = int(self.headers.get("Content-Length", "0") or "0")
        body = self.rfile.read(n) if n else b""
        # the AWS SDK may stream 'aws-chunked' WITH a Content-Length:
        # payload framed as <hex-size>;chunk-signature=...\r\n<data>\r\n
        if "aws-chunked" in self.headers.get("Content-Encoding", ""):
            out, i = [], 0
            while i < len(body):
                nl = body.index(b"\r\n", i)
                size = int(body[i:nl].split(b";")[0], 16)
                if size == 0:
                    break
                out.append(body[nl + 2 : nl + 2 + size])
                i = nl + 2 + size + 2
            return b"".join(out)
        return body

    # -- verbs -------------------------------------------------------------

    def do_GET(self):
        bucket, key, q = self._parse()
        st = self.store
        with st.lock:
            if bucket not in st.buckets:
                return self._error(404, "NoSuchBucket", bucket)
            if not key:
                if "location" in q:
                    return self._xml(
                        200, "", "LocationConstraint"
                    )
                return self._list_objects(bucket, q)
            obj = st.buckets[bucket].get(key)
            if obj is None:
                return self._error(404, "NoSuchKey", key)
            data, mtime = obj
            st.get_log.append(
                (f"{bucket}/{key}", self.headers.get("Range"))
            )
        rng = self.headers.get("Range")
        headers = {
            "ETag": _etag(data),
            "Last-Modified": _rfc3339(mtime),
            "Accept-Ranges": "bytes",
            "Content-Type": "application/octet-stream",
        }
        if rng:
            m = re.fullmatch(r"bytes=(\d*)-(\d*)", rng.strip())
            if m:
                lo = int(m.group(1)) if m.group(1) else None
                hi = int(m.group(2)) if m.group(2) else None
                if lo is None:  # suffix range: last N bytes
                    lo = max(0, len(data) - (hi or 0))
                    hi = len(data) - 1
                elif hi is None or hi >= len(data):
                    hi = len(data) - 1
                part = data[lo : hi + 1]
                headers["Content-Range"] = f"bytes {lo}-{hi}/{len(data)}"
                return self._respond(206, part, headers)
        self._respond(200, data, headers)

    def do_HEAD(self):
        bucket, key, _ = self._parse()
        st = self.store
        with st.lock:
            if bucket not in st.buckets:
                return self._respond(404)
            if not key:
                return self._respond(200)
            obj = st.buckets[bucket].get(key)
            if obj is None:
                return self._respond(404)
            data, mtime = obj
        self._respond(
            200,
            b"",
            {
                "ETag": _etag(data),
                "Last-Modified": _rfc3339(mtime),
                "Content-Length": str(len(data)),
                "Content-Type": "application/octet-stream",
            },
        )

    def do_PUT(self):
        bucket, key, q = self._parse()
        body = self._read_body()
        st = self.store
        if not key:  # CreateBucket
            with st.lock:
                st.buckets.setdefault(bucket, {})
            return self._respond(200)
        if "partNumber" in q and "uploadId" in q:
            uid = q["uploadId"][0]
            n = int(q["partNumber"][0])
            with st.lock:
                up = st.uploads.get(uid)
                if up is None:
                    return self._error(404, "NoSuchUpload", uid)
                up[2][n] = body
            return self._respond(200, b"", {"ETag": _etag(body)})
        src = self.headers.get("x-amz-copy-source")
        with st.lock:
            if bucket not in st.buckets:
                return self._error(404, "NoSuchBucket", bucket)
            if src:  # CopyObject
                s = unquote(src.lstrip("/"))
                sb, _, sk = s.partition("/")
                sobj = st.buckets.get(sb, {}).get(sk)
                if sobj is None:
                    return self._error(404, "NoSuchKey", s)
                data = sobj[0]
                st.buckets[bucket][key] = (data, time.time())
                return self._xml(
                    200,
                    f"<ETag>{_etag(data)}</ETag>"
                    f"<LastModified>{_rfc3339(time.time())}</LastModified>",
                    "CopyObjectResult",
                )
            st.buckets[bucket][key] = (body, time.time())
        self._respond(200, b"", {"ETag": _etag(body)})

    def do_POST(self):
        bucket, key, q = self._parse()
        st = self.store
        if "delete" in q:  # batch DeleteObjects
            body = self._read_body().decode("utf-8", "replace")
            keys = [unquote(k) for k in re.findall(r"<Key>(.*?)</Key>", body)]
            inner = []
            with st.lock:
                objs = st.buckets.get(bucket, {})
                for k in keys:
                    objs.pop(k, None)
                    inner.append(f"<Deleted><Key>{escape(k)}</Key></Deleted>")
            return self._xml(200, "".join(inner), "DeleteResult")
        if "uploads" in q:  # CreateMultipartUpload
            with st.lock:
                st.buckets.setdefault(bucket, {})
            uid = st.new_upload(bucket, key)
            return self._xml(
                200,
                f"<Bucket>{escape(bucket)}</Bucket>"
                f"<Key>{escape(key)}</Key><UploadId>{uid}</UploadId>",
                "InitiateMultipartUploadResult",
            )
        if "uploadId" in q:  # CompleteMultipartUpload
            self._read_body()  # part list XML; we assemble by number
            uid = q["uploadId"][0]
            with st.lock:
                up = st.uploads.pop(uid, None)
                if up is None:
                    return self._error(404, "NoSuchUpload", uid)
                b, k, parts = up
                data = b"".join(parts[n] for n in sorted(parts))
                st.buckets.setdefault(b, {})[k] = (data, time.time())
            return self._xml(
                200,
                f"<Location>/{escape(b)}/{escape(k)}</Location>"
                f"<Bucket>{escape(b)}</Bucket><Key>{escape(k)}</Key>"
                f"<ETag>{_etag(data)}</ETag>",
                "CompleteMultipartUploadResult",
            )
        self._error(400, "InvalidRequest", "unsupported POST")

    def do_DELETE(self):
        bucket, key, q = self._parse()
        st = self.store
        if "uploadId" in q:  # AbortMultipartUpload
            with st.lock:
                st.uploads.pop(q["uploadId"][0], None)
            return self._respond(204)
        with st.lock:
            if bucket not in st.buckets:
                return self._respond(204)
            if not key:  # DeleteBucket
                if not st.buckets[bucket]:
                    st.buckets.pop(bucket)
                    return self._respond(204)
                return self._error(409, "BucketNotEmpty", bucket)
            st.buckets[bucket].pop(key, None)
        self._respond(204)

    # -- ListObjectsV2 -----------------------------------------------------

    def _list_objects(self, bucket: str, q) -> None:
        st = self.store
        prefix = q.get("prefix", [""])[0]
        delimiter = q.get("delimiter", [""])[0]
        max_keys = int(q.get("max-keys", ["1000"])[0])
        token = q.get("continuation-token", [""])[0]
        with st.lock:
            names = sorted(st.buckets[bucket].keys())
            snapshot = {k: st.buckets[bucket][k] for k in names}
        contents: list[str] = []
        common: list[str] = []
        seen_prefixes: set[str] = set()
        n = 0
        truncated = False
        next_token = ""
        for k in names:
            if not k.startswith(prefix):
                continue
            if token and k <= token:
                continue
            if n >= max_keys:
                truncated = True
                break
            if delimiter:
                rest = k[len(prefix):]
                di = rest.find(delimiter)
                if di >= 0:
                    cp = prefix + rest[: di + len(delimiter)]
                    if cp not in seen_prefixes:
                        seen_prefixes.add(cp)
                        common.append(
                            f"<CommonPrefixes><Prefix>{escape(cp)}"
                            "</Prefix></CommonPrefixes>"
                        )
                        n += 1
                        next_token = k
                    continue
            data, mtime = snapshot[k]
            contents.append(
                f"<Contents><Key>{escape(k)}</Key>"
                f"<LastModified>{_rfc3339(mtime)}</LastModified>"
                f"<ETag>{escape(_etag(data))}</ETag>"
                f"<Size>{len(data)}</Size>"
                "<StorageClass>STANDARD</StorageClass></Contents>"
            )
            n += 1
            next_token = k
        inner = (
            f"<Name>{escape(bucket)}</Name>"
            f"<Prefix>{escape(prefix)}</Prefix>"
            f"<KeyCount>{n}</KeyCount><MaxKeys>{max_keys}</MaxKeys>"
            f"<Delimiter>{escape(delimiter)}</Delimiter>"
            f"<IsTruncated>{'true' if truncated else 'false'}</IsTruncated>"
        )
        if truncated:
            inner += (
                "<NextContinuationToken>"
                f"{escape(quote(next_token))}</NextContinuationToken>"
            )
        self._xml(200, inner + "".join(contents) + "".join(common),
                  "ListBucketResult")


class S3Server:
    """In-process S3-protocol server on 127.0.0.1 (ephemeral port by
    default). ``with S3Server() as srv: ... srv.endpoint`` — or call
    start()/stop() explicitly."""

    def __init__(self, port: int = 0) -> None:
        self.store = _Store()
        handler = type("BoundHandler", (_Handler,), {"store": self.store})
        self.httpd = ThreadingHTTPServer(("127.0.0.1", port), handler)
        self.httpd.daemon_threads = True
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def start(self) -> "S3Server":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="bazof-s3server", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> "S3Server":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="bazof-s3server")
    p.add_argument("--port", type=int, default=9000)
    args = p.parse_args(argv)
    srv = S3Server(port=args.port).start()
    print(f"bazof s3server listening on {srv.endpoint}", flush=True)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
