"""Minimal RFC 6455 WebSocket broadcast server (stdlib-only).

The reference's WebSocket output runs an actual server in the pipeline
process and broadcasts every record to all connected clients
(/root/reference/output/websocket/server.go:28-77 client registry +
SendAll fan-out; output/websocket.go wires records into it). This is
that server for :class:`baker_spark.sinks.simple.WebSocketSink` — plug
``server.broadcast`` in as the sink's ``send_fn``.

Scope matches the reference's (a dev tool): server-side handshake,
unfragmented text frames server->client, clean close. Client->server
payloads are read and discarded (the reference ignores them too — its
client loop only forwards server pushes). No extensions, no TLS. The
``websockets`` package is not bundled in this environment, and the
protocol subset needed here is ~100 lines of stdlib.
"""

from __future__ import annotations

import base64
import hashlib
import socket
import struct
import threading

#: RFC 6455 §1.3 handshake GUID (a protocol constant, same in every
#: implementation)
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept for a client's Sec-WebSocket-Key (RFC 6455 §4.2.2)."""
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_text_frame(payload: str) -> bytes:
    """One unfragmented, unmasked text frame (server->client MUST NOT
    mask, RFC 6455 §5.1)."""
    data = payload.encode("utf-8")
    n = len(data)
    if n < 126:
        header = struct.pack("!BB", 0x81, n)
    elif n < 1 << 16:
        header = struct.pack("!BBH", 0x81, 126, n)
    else:
        header = struct.pack("!BBQ", 0x81, 127, n)
    return header + data


def decode_frames(buf: bytes) -> tuple[list[str], bytes]:
    """Parse complete text frames from ``buf``; returns (payloads,
    remainder). Used by tests' client side; handles masked and unmasked
    payloads and skips control frames."""
    out: list[str] = []
    while True:
        if len(buf) < 2:
            return out, buf
        opcode = buf[0] & 0x0F
        masked = buf[1] & 0x80
        n = buf[1] & 0x7F
        pos = 2
        if n == 126:
            if len(buf) < 4:
                return out, buf
            n = struct.unpack("!H", buf[2:4])[0]
            pos = 4
        elif n == 127:
            if len(buf) < 10:
                return out, buf
            n = struct.unpack("!Q", buf[2:10])[0]
            pos = 10
        mask = b""
        if masked:
            if len(buf) < pos + 4:
                return out, buf
            mask = buf[pos:pos + 4]
            pos += 4
        if len(buf) < pos + n:
            return out, buf
        payload = buf[pos:pos + n]
        if masked:
            payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        if opcode == 0x1:  # text; control/continuation frames are skipped
            out.append(payload.decode("utf-8"))
        buf = buf[pos + n:]


class WebSocketBroadcastServer:
    """Accept clients, keep a registry, fan every ``broadcast`` out to
    all of them — the SendAll semantics of the reference's server
    (websocket/server.go:50-62). A client whose socket errors on send is
    dropped, like the reference's del channel path."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self.port = host, port
        self._clients: dict[int, socket.socket] = {}
        self._lock = threading.Lock()
        self._next_id = 0
        self._server_sock: socket.socket | None = None
        self._accept_thread: threading.Thread | None = None
        self._running = False
        self.sent = 0

    # -- lifecycle ---------------------------------------------------------

    @property
    def running(self) -> bool:
        return self._running

    def start(self) -> tuple[str, int]:
        # idempotent: the sink lazy-starts on first write, and a caller
        # (test/daemon) may have started the server explicitly before —
        # a second start must not rebind the port
        if self._running:
            return self.host, self.port
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind((self.host, self.port))
        s.listen()
        self.port = s.getsockname()[1]
        self._server_sock = s
        self._running = True
        self._accept_thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._accept_thread.start()
        return self.host, self.port

    def stop(self) -> None:
        self._running = False
        if self._server_sock is not None:
            try:
                self._server_sock.close()
            except OSError:
                pass
        with self._lock:
            clients, self._clients = dict(self._clients), {}
        for sock in clients.values():
            try:
                # close frame (opcode 0x8), then drop
                sock.sendall(struct.pack("!BB", 0x88, 0))
                sock.close()
            except OSError:
                pass
        if self._accept_thread is not None:
            self._accept_thread.join(timeout=5)

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    # -- server internals --------------------------------------------------

    def _accept_loop(self) -> None:
        while self._running:
            try:
                conn, _addr = self._server_sock.accept()
            except OSError:
                return  # socket closed by stop()
            try:
                self._handshake(conn)
            except (OSError, ValueError):
                conn.close()
                continue
            with self._lock:
                if not self._running:
                    # stop() ran while this handshake was in flight: the
                    # old client dict was already swapped and closed, so
                    # registering now would leak the socket on a stopped
                    # server (client_count > 0 forever)
                    conn.close()
                    return
                self._next_id += 1
                self._clients[self._next_id] = conn

    @staticmethod
    def _handshake(conn: socket.socket) -> None:
        conn.settimeout(5)
        request = b""
        while b"\r\n\r\n" not in request:
            chunk = conn.recv(4096)
            if not chunk:
                raise ValueError("client closed during handshake")
            request += chunk
        key = None
        for line in request.split(b"\r\n"):
            name, _, value = line.partition(b":")
            if name.strip().lower() == b"sec-websocket-key":
                key = value.strip().decode()
        if key is None:
            raise ValueError("not a websocket upgrade request")
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
            ).encode()
        )
        conn.settimeout(None)

    # -- the sink-facing surface ------------------------------------------

    def broadcast(self, message: str) -> int:
        """Send one text frame to every connected client; returns the
        number of clients reached. Matches ``WebSocketSink``'s
        ``send_fn`` signature."""
        frame = encode_text_frame(message)
        dead = []
        with self._lock:
            clients = list(self._clients.items())
        for cid, sock in clients:
            try:
                sock.sendall(frame)
            except OSError:
                dead.append(cid)
        if dead:
            with self._lock:
                for cid in dead:
                    sock = self._clients.pop(cid, None)
                    if sock is not None:
                        try:
                            sock.close()
                        except OSError:
                            pass
        self.sent += 1
        return len(clients) - len(dead)

    @property
    def client_count(self) -> int:
        with self._lock:
            return len(self._clients)
