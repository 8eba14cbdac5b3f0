"""Minimal in-process FTP server for protocol-ftp tests (test-only;
binds 127.0.0.1). Speaks just enough RFC 959 for stdlib ftplib in
passive mode: USER/PASS/SYST/TYPE/PASV/CWD/SIZE/MDTM/LIST/RETR/QUIT,
serving a real directory tree."""

from __future__ import annotations

import os
import socket
import socketserver
import threading
import time


class _Handler(socketserver.StreamRequestHandler):
    def _send(self, line: str) -> None:
        self.wfile.write((line + "\r\n").encode("latin-1"))

    def _resolve(self, arg: str) -> str:
        path = arg if arg.startswith("/") else os.path.join(self.cwd, arg)
        full = os.path.realpath(self.server.root + "/" + path)
        root = os.path.realpath(self.server.root)
        if not (full == root or full.startswith(root + "/")):
            return root
        return full

    def _open_data(self):
        listener, _ = self.pasv
        conn, _ = listener.accept()
        listener.close()
        self.pasv = None
        return conn

    def handle(self):
        self.cwd = "/"
        self.pasv = None
        self.user = None
        self._send("220 mini ftp ready")
        for raw in self.rfile:
            line = raw.decode("latin-1").strip()
            cmd, _, arg = line.partition(" ")
            cmd = cmd.upper()
            if cmd == "USER":
                self.user = arg
                self._send("331 password please")
            elif cmd == "PASS":
                ok_user, ok_pass = self.server.credentials
                if self.user == ok_user and (ok_pass is None or arg == ok_pass):
                    self._send("230 logged in")
                else:
                    self._send("530 login incorrect")
            elif cmd == "SYST":
                self._send("215 UNIX Type: L8")
            elif cmd == "TYPE":
                self._send("200 ok")
            elif cmd == "PASV":
                listener = socket.socket()
                listener.bind(("127.0.0.1", 0))
                listener.listen(1)
                port = listener.getsockname()[1]
                self.pasv = (listener, port)
                self._send(
                    f"227 entering passive mode (127,0,0,1,{port >> 8},{port & 255})"
                )
            elif cmd == "CWD":
                full = self._resolve(arg)
                if os.path.isdir(full):
                    self.cwd = "/" + os.path.relpath(
                        full, os.path.realpath(self.server.root)
                    ).strip(".").strip("/")
                    self._send("250 ok")
                else:
                    self._send("550 not a directory")
            elif cmd == "SIZE":
                full = self._resolve(arg)
                if os.path.isfile(full):
                    self._send(f"213 {os.path.getsize(full)}")
                else:
                    self._send("550 not a file")
            elif cmd == "MDTM":
                full = self._resolve(arg)
                if os.path.isfile(full):
                    ts = time.strftime(
                        "%Y%m%d%H%M%S", time.gmtime(os.path.getmtime(full))
                    )
                    self._send(f"213 {ts}")
                else:
                    self._send("550 not a file")
            elif cmd == "LIST":
                full = self._resolve(arg) if arg else self._resolve(self.cwd)
                if not os.path.isdir(full) or self.pasv is None:
                    self._send("550 cannot list")
                    continue
                self._send("150 here comes the listing")
                conn = self._open_data()
                for name in sorted(os.listdir(full)):
                    kind = "d" if os.path.isdir(os.path.join(full, name)) else "-"
                    ln = (
                        f"{kind}rw-r--r-- 1 ftp ftp "
                        f"{os.path.getsize(os.path.join(full, name)) if kind == '-' else 0} "
                        f"Jan 1 00:00 {name}\r\n"
                    )
                    conn.sendall(ln.encode("latin-1"))
                conn.close()
                self._send("226 done")
            elif cmd == "RETR":
                full = self._resolve(arg)
                if not os.path.isfile(full) or self.pasv is None:
                    self._send("550 not a file")
                    continue
                self._send("150 sending")
                conn = self._open_data()
                try:
                    with open(full, "rb") as f:
                        while True:
                            b = f.read(65536)
                            if not b:
                                break
                            conn.sendall(b)
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client truncated the transfer
                finally:
                    conn.close()
                self._send("226 done")
            elif cmd == "QUIT":
                self._send("221 bye")
                return
            else:
                self._send("502 not implemented")


class MiniFtpServer:
    """with MiniFtpServer(root) as url_base: fetch(f'{url_base}/a.txt')"""

    def __init__(self, root: str, user: str = "anonymous", password: str | None = None):
        self._srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Handler)
        self._srv.daemon_threads = True
        self._srv.allow_reuse_address = True
        self._srv.root = root
        self._srv.credentials = (user, password)
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    @property
    def port(self) -> int:
        return self._srv.server_address[1]

    def __enter__(self) -> str:
        self._thread.start()
        return f"ftp://127.0.0.1:{self.port}"

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()
