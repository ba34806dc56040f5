"""Loopback protocol stubs for driving the S13 sync legs for real.

The sandbox has no outbound network and no installable FTP/S3 daemons, so
the reference's external systems (``ftputil.FTPHost`` / ``boto3`` S3,
reference sync.py:32-58) are stood in for by two in-process servers:

- :class:`StubFTPServer` — a threaded, read-only FTP server speaking the
  subset of RFC 959 + RFC 3659 that stdlib :mod:`ftplib` exercises
  (USER/PASS, TYPE, PASV, MLSD, NLST, SIZE, RETR, CWD/PWD, FEAT), serving
  a local directory tree.
- :class:`StubS3Server` — a threaded HTTP server speaking the S3 REST
  shapes the sync path needs: ``ListObjectsV2`` (with real
  continuation-token pagination), GET/PUT object, HEAD/PUT bucket,
  backed by an in-memory dict.

Both bind 127.0.0.1 on an ephemeral port; executors in local mode reach
them over loopback, so the *distributed* transfer path is the one under
test — not a monkeypatched client.
"""

from __future__ import annotations

import os
import socket
import socketserver
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlsplit
from xml.sax.saxutils import escape


# --------------------------------------------------------------------------
# FTP
# --------------------------------------------------------------------------

class _FTPHandler(socketserver.StreamRequestHandler):
    """One FTP control connection. Data transfers use fresh PASV sockets."""

    def _send(self, line: str) -> None:
        self.wfile.write((line + "\r\n").encode("latin-1"))

    def _resolve(self, arg: str) -> str:
        """Map an FTP path onto the served root, refusing escapes."""
        path = arg if arg.startswith("/") else f"{self.cwd}/{arg}" if arg else self.cwd
        norm = os.path.normpath(path.replace("\\", "/"))
        if norm in ("/", "."):
            norm = "/"
        full = os.path.normpath(os.path.join(self.server.root, norm.lstrip("/")))
        if not full.startswith(self.server.root):
            raise PermissionError(arg)
        return full

    def _open_pasv(self) -> None:
        self.pasv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.pasv.bind(("127.0.0.1", 0))
        self.pasv.listen(1)
        h, p = self.pasv.getsockname()
        self._send("227 Entering Passive Mode (%s,%d,%d)"
                   % (h.replace(".", ","), p >> 8, p & 0xFF))

    def _data_conn(self) -> socket.socket:
        conn, _ = self.pasv.accept()
        self.pasv.close()
        self.pasv = None
        return conn

    def handle(self) -> None:  # noqa: C901 - a protocol switch is a switch
        self.cwd = "/"
        self.pasv = None
        self._user = None
        self._send("220 stub ftp ready")
        while True:
            raw = self.rfile.readline()
            if not raw:
                break
            line = raw.decode("latin-1").rstrip("\r\n")
            cmd, _, arg = line.partition(" ")
            cmd = cmd.upper()
            try:
                if cmd == "USER":
                    self._user = arg
                    self._send("331 password required")
                elif cmd == "PASS":
                    ok = self.server.user is None or (
                        self._user == self.server.user
                        and arg == self.server.password
                    )
                    self._send("230 logged in" if ok else "530 login incorrect")
                elif cmd == "SYST":
                    self._send("215 UNIX Type: L8")
                elif cmd == "FEAT":
                    self.wfile.write(b"211-Features:\r\n MLSD\r\n SIZE\r\n211 End\r\n")
                elif cmd == "TYPE":
                    self._send("200 type set")
                elif cmd == "PWD":
                    self._send('257 "%s"' % self.cwd)
                elif cmd == "CWD":
                    full = self._resolve(arg)
                    if os.path.isdir(full):
                        rel = os.path.relpath(full, self.server.root)
                        self.cwd = "/" if rel == "." else "/" + rel.replace(os.sep, "/")
                        self._send("250 ok")
                    else:
                        self._send("550 no such directory")
                elif cmd == "PASV":
                    self._open_pasv()
                elif cmd in ("MLSD", "NLST"):
                    full = self._resolve(arg)
                    self._send("150 listing follows")
                    conn = self._data_conn()
                    try:
                        for name in sorted(os.listdir(full)):
                            p = os.path.join(full, name)
                            if cmd == "NLST":
                                out = name
                            elif os.path.isdir(p):
                                out = "type=dir;modify=20200101000000; " + name
                            else:
                                out = ("type=file;size=%d;modify=20200101000000; "
                                       % os.path.getsize(p)) + name
                            conn.sendall((out + "\r\n").encode("utf-8"))
                    finally:
                        conn.close()
                    self._send("226 done")
                elif cmd == "SIZE":
                    full = self._resolve(arg)
                    if os.path.isfile(full):
                        self._send("213 %d" % os.path.getsize(full))
                    else:
                        self._send("550 no such file")
                elif cmd == "RETR":
                    full = self._resolve(arg)
                    if not os.path.isfile(full):
                        self._send("550 no such file")
                        continue
                    self._send("150 sending")
                    conn = self._data_conn()
                    try:
                        with open(full, "rb") as f:
                            while chunk := f.read(65536):
                                conn.sendall(chunk)
                    finally:
                        conn.close()
                    self._send("226 transfer complete")
                elif cmd == "QUIT":
                    self._send("221 bye")
                    break
                else:
                    self._send("502 not implemented")
            except PermissionError:
                self._send("550 permission denied")


class _FTPServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class StubFTPServer:
    """Serve ``root`` read-only over FTP on 127.0.0.1:<ephemeral>."""

    def __init__(self, root: str, user: str | None = None,
                 password: str | None = None):
        self._srv = _FTPServer(("127.0.0.1", 0), _FTPHandler)
        self._srv.root = os.path.abspath(root)
        self._srv.user = user
        self._srv.password = password
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    def __enter__(self) -> "StubFTPServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()

    @property
    def port(self) -> int:
        return self._srv.server_address[1]

    @property
    def host(self) -> str:
        return "127.0.0.1"


# --------------------------------------------------------------------------
# S3
# --------------------------------------------------------------------------

class _S3State:
    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.buckets: dict[str, dict[str, bytes]] = {}


class _S3Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a) -> None:  # silence per-request stderr noise
        pass

    def _reply(self, code: int, body: bytes = b"",
               ctype: str = "application/xml") -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(body)

    def _split(self) -> tuple[str, str, dict]:
        u = urlsplit(self.path)
        parts = u.path.lstrip("/").split("/", 1)
        bucket = unquote(parts[0])
        key = unquote(parts[1]) if len(parts) > 1 else ""
        return bucket, key, parse_qs(u.query)

    def do_HEAD(self) -> None:
        bucket, key, _ = self._split()
        st = self.server.state
        with st.lock:
            if bucket not in st.buckets:
                self._reply(404)
            elif key and key not in st.buckets[bucket]:
                self._reply(404)
            else:
                self._reply(200)

    def do_PUT(self) -> None:
        bucket, key, _ = self._split()
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n) if n else b""
        st = self.server.state
        with st.lock:
            if not key:
                st.buckets.setdefault(bucket, {})
                self._reply(200)
                return
            if bucket not in st.buckets:
                self._reply(404, b"<Error><Code>NoSuchBucket</Code></Error>")
                return
            st.buckets[bucket][key] = body
        self._reply(200)

    def do_GET(self) -> None:
        bucket, key, q = self._split()
        st = self.server.state
        with st.lock:
            if bucket not in st.buckets:
                self._reply(404, b"<Error><Code>NoSuchBucket</Code></Error>")
                return
            objs = dict(st.buckets[bucket])
        if key:
            if key not in objs:
                self._reply(404, b"<Error><Code>NoSuchKey</Code></Error>")
            else:
                self._reply(200, objs[key], "application/octet-stream")
            return
        # ListObjectsV2 with real pagination: keys sorted, resume strictly
        # after the continuation token (which we make the last key itself).
        prefix = q.get("prefix", [""])[0]
        max_keys = int(q.get("max-keys", ["1000"])[0])
        token = q.get("continuation-token", [""])[0]
        keys = sorted(k for k in objs if k.startswith(prefix))
        if token:
            keys = [k for k in keys if k > token]
        page, rest = keys[:max_keys], keys[max_keys:]
        xml = ['<?xml version="1.0"?><ListBucketResult>',
               "<IsTruncated>%s</IsTruncated>" % ("true" if rest else "false")]
        if rest:
            xml.append("<NextContinuationToken>%s</NextContinuationToken>"
                       % escape(page[-1]))
        for k in page:
            xml.append("<Contents><Key>%s</Key><Size>%d</Size></Contents>"
                       % (escape(k), len(objs[k])))
        xml.append("</ListBucketResult>")
        self._reply(200, "".join(xml).encode("utf-8"))


class StubS3Server:
    """In-memory S3-shaped object store on 127.0.0.1:<ephemeral>."""

    def __init__(self) -> None:
        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), _S3Handler)
        self._srv.state = _S3State()
        self._srv.daemon_threads = True
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    def __enter__(self) -> "StubS3Server":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()

    @property
    def endpoint(self) -> str:
        return "http://127.0.0.1:%d" % self._srv.server_address[1]

    def objects(self, bucket: str) -> dict[str, bytes]:
        with self._srv.state.lock:
            return dict(self._srv.state.buckets.get(bucket, {}))


class CopyCaptureCursor:
    """DBAPI-cursor stub that exposes ``copy_expert`` (the psycopg2 bulk
    COPY surface) and spools every payload to a file, so a contract test
    can assert the COPY wire path was chosen and fed correctly-escaped
    CSV — the sandbox has no Postgres server to receive the real thing
    (reference analog: d6tstack utils.py:69-111 pd_to_psql)."""

    def __init__(self, spool_dir: str):
        self._spool = spool_dir

    def copy_expert(self, sql: str, buf) -> None:
        import os
        import uuid

        os.makedirs(self._spool, exist_ok=True)
        p = os.path.join(self._spool, f"{uuid.uuid4().hex}.copy")
        with open(p, "w") as f:
            f.write(sql + "\n\x00\n")
            f.write(buf.read())

    def executemany(self, sql: str, rows) -> None:
        # reached only when the sink deliberately declines COPY (binary
        # frames); spooled so tests can assert WHICH wire path ran
        import os
        import uuid

        os.makedirs(self._spool, exist_ok=True)
        p = os.path.join(self._spool, f"{uuid.uuid4().hex}.rows")
        with open(p, "w") as f:
            f.write(sql + "\n")
            f.write(repr(list(rows)))

    def execute(self, sql: str) -> None:
        pass

    def close(self) -> None:
        pass


class CopyCaptureConnection:
    def __init__(self, spool_dir: str):
        self._spool = spool_dir

    def cursor(self) -> CopyCaptureCursor:
        return CopyCaptureCursor(self._spool)

    def commit(self) -> None:
        pass

    def close(self) -> None:
        pass


def make_copy_capture_conn(spool_dir: str) -> CopyCaptureConnection:
    """Picklable ``connect_fn`` factory for
    :func:`d6tstack_spark.sources.sql.to_sql_dbapi` contract tests."""
    return CopyCaptureConnection(spool_dir)
