"""Storage providers + the built-in RESP client (against an in-process fake
Redis server speaking real RESP over a socket — the fakeredis analogue of
the reference's test strategy, reference conftest.py:69-121)."""

import os
import socket
import threading
import time

import pytest

from dreamlab_tpu.persistence import (
    FilesystemStorageProvider,
    InMemoryStorageProvider,
    make_storage_provider_from_env,
)
from dreamlab_tpu.persistence.redis_provider import RedisStorageProvider
from dreamlab_tpu.utils.resp import RespClient, RespError


# ---------------------------------------------------------------------------
# fake RESP server
# ---------------------------------------------------------------------------


class FakeRedis(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]
        self.kv = {}
        self.hashes = {}
        self.zsets = {}
        self.expiry = {}
        self._stop = False

    def run(self):
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def stop(self):
        self._stop = True
        self.sock.close()

    # -- protocol ------------------------------------------------------
    def _serve(self, conn):
        buf = b""

        def read_line():
            nonlocal buf
            while b"\r\n" not in buf:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            line, rest = buf.split(b"\r\n", 1)
            buf = rest
            return line

        def read_exact(n):
            nonlocal buf
            while len(buf) < n + 2:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            data, buf = buf[:n], buf[n + 2:]
            return data

        try:
            while True:
                line = read_line()
                assert line[:1] == b"*"
                nargs = int(line[1:])
                args = []
                for _ in range(nargs):
                    l = read_line()
                    assert l[:1] == b"$"
                    args.append(read_exact(int(l[1:])))
                conn.sendall(self._dispatch(args))
        except (ConnectionError, OSError):
            pass

    @staticmethod
    def _bulk(v):
        if v is None:
            return b"$-1\r\n"
        return b"$%d\r\n%s\r\n" % (len(v), v)

    def _gc(self, key):
        exp = self.expiry.get(key)
        if exp and exp <= time.time():
            for store in (self.kv, self.hashes, self.zsets):
                store.pop(key, None)
            self.expiry.pop(key, None)

    def _dispatch(self, args):
        cmd = args[0].upper()
        if cmd == b"PING":
            return b"+PONG\r\n"
        if cmd == b"SET":
            key, val = args[1], args[2]
            self.kv[key] = val
            if len(args) >= 5 and args[3].upper() == b"EX":
                self.expiry[key] = time.time() + int(args[4])
            return b"+OK\r\n"
        if cmd == b"GET":
            self._gc(args[1])
            return self._bulk(self.kv.get(args[1]))
        if cmd == b"DEL":
            n = 0
            for k in args[1:]:
                for store in (self.kv, self.hashes, self.zsets):
                    if store.pop(k, None) is not None:
                        n += 1
                        break
            return b":%d\r\n" % n
        if cmd == b"EXPIRE":
            self.expiry[args[1]] = time.time() + int(args[2])
            return b":1\r\n"
        if cmd == b"HSET":
            h = self.hashes.setdefault(args[1], {})
            added = 0
            for i in range(2, len(args), 2):
                if args[i] not in h:
                    added += 1
                h[args[i]] = args[i + 1]
            return b":%d\r\n" % added
        if cmd == b"HGETALL":
            self._gc(args[1])
            h = self.hashes.get(args[1], {})
            out = b"*%d\r\n" % (2 * len(h))
            for k, v in h.items():
                out += self._bulk(k) + self._bulk(v)
            return out
        if cmd == b"ZADD":
            z = self.zsets.setdefault(args[1], {})
            added = 0
            for i in range(2, len(args), 2):
                member = args[i + 1]
                if member not in z:
                    added += 1
                z[member] = float(args[i])
            return b":%d\r\n" % added
        if cmd == b"ZREVRANGE":
            z = self.zsets.get(args[1], {})
            items = sorted(z.items(), key=lambda kv: -kv[1])
            start, stop = int(args[2]), int(args[3])
            stop = len(items) if stop == -1 else stop + 1
            sel = items[start:stop]
            withscores = len(args) > 4 and args[4].upper() == b"WITHSCORES"
            if withscores:
                out = b"*%d\r\n" % (2 * len(sel))
                for m, s in sel:
                    out += self._bulk(m) + self._bulk(repr(s).encode())
            else:
                out = b"*%d\r\n" % len(sel)
                for m, _ in sel:
                    out += self._bulk(m)
            return out
        if cmd == b"ZCARD":
            return b":%d\r\n" % len(self.zsets.get(args[1], {}))
        if cmd == b"DBSIZE":
            return b":%d\r\n" % (len(self.kv) + len(self.hashes) + len(self.zsets))
        if cmd == b"FLUSHDB":
            self.kv.clear(); self.hashes.clear(); self.zsets.clear()
            return b"+OK\r\n"
        return b"-ERR unknown command\r\n"


@pytest.fixture(scope="module")
def fake_redis():
    srv = FakeRedis()
    srv.start()
    yield srv
    srv.stop()


# ---------------------------------------------------------------------------
# memory provider
# ---------------------------------------------------------------------------


def test_memory_put_get_delete():
    p = InMemoryStorageProvider()
    key = p.new_key()
    assert key.startswith("lcm:")
    p.put(key, b"abc", {"seed": "1"}, content_type="image/png")
    item = p.get(key)
    assert item.data == b"abc"
    assert item.metadata == {"seed": "1"}
    assert item.content_type == "image/png"
    assert p.delete(key)
    assert p.get(key) is None
    assert not p.delete(key)


def test_memory_ttl_expiry():
    p = InMemoryStorageProvider(default_ttl=0.05)
    p.put("k", b"v")
    assert p.get("k") is not None
    time.sleep(0.08)
    assert p.get("k") is None


def test_memory_drop_oldest():
    p = InMemoryStorageProvider(max_items=2, default_ttl=None)
    p.put("a", b"1"); time.sleep(0.01)
    p.put("b", b"2"); time.sleep(0.01)
    p.put("c", b"3")
    assert p.get("a") is None
    assert p.get("b") and p.get("c")


def test_memory_health():
    p = InMemoryStorageProvider()
    p.put("k", b"xyz")
    h = p.health()
    assert h["ok"] and h["entries"] == 1 and h["bytes"] == 3


# ---------------------------------------------------------------------------
# filesystem provider
# ---------------------------------------------------------------------------


def test_fs_roundtrip(tmp_path):
    p = FilesystemStorageProvider(str(tmp_path / "store"), cleanup_interval=3600)
    p.put("k1", b"data", {"a": "b"}, content_type="image/png")
    item = p.get("k1")
    assert item.data == b"data" and item.metadata == {"a": "b"}
    assert p.health()["entries"] == 1
    assert p.delete("k1")
    assert p.get("k1") is None
    p.close()


def test_fs_ttl_cleanup(tmp_path):
    p = FilesystemStorageProvider(
        str(tmp_path / "store"), default_ttl=0.01, cleanup_interval=3600
    )
    p.put("k", b"v")
    time.sleep(0.05)
    assert p.get("k") is None  # lazy expiry on read
    p.put("k2", b"v", ttl=0.01)
    time.sleep(0.05)
    assert p.cleanup_expired() >= 1
    p.close()


def test_env_factory(tmp_path, monkeypatch):
    monkeypatch.setenv("STORAGE_PROVIDER", "DISABLED")
    assert make_storage_provider_from_env() is None
    monkeypatch.setenv("STORAGE_PROVIDER", "MEMORY")
    assert isinstance(make_storage_provider_from_env(), InMemoryStorageProvider)
    monkeypatch.setenv("STORAGE_PROVIDER", "FILESYSTEM")
    monkeypatch.setenv("FS_STORAGE_ROOT", str(tmp_path / "fs"))
    prov = make_storage_provider_from_env()
    assert isinstance(prov, FilesystemStorageProvider)
    prov.close()


# ---------------------------------------------------------------------------
# RESP client + redis provider
# ---------------------------------------------------------------------------


def test_resp_client_basics(fake_redis):
    c = RespClient(port=fake_redis.port)
    assert c.ping()
    c.set("x", b"hello", ex=100)
    assert c.get("x") == b"hello"
    assert c.delete("x") == 1
    assert c.get("x") is None
    c.hset("h", {"f1": "v1", "f2": "v2"})
    assert c.hgetall("h") == {b"f1": b"v1", b"f2": b"v2"}
    c.zadd("z", {"a": 1.0, "b": 3.0, "c": 2.0})
    assert c.zrevrange("z", 0, -1) == [b"b", b"c", b"a"]
    top = c.zrevrange("z", 0, 0, withscores=True)
    assert top == [(b"b", 3.0)]
    assert c.zcard("z") == 3
    c.close()


def test_redis_provider_roundtrip(fake_redis):
    p = RedisStorageProvider(port=fake_redis.port)
    p.put("img:1", b"\x89PNG", {"seed": "7"}, content_type="image/png", ttl=60)
    item = p.get("img:1")
    assert item.data == b"\x89PNG"
    assert item.metadata == {"seed": "7"}
    assert item.content_type == "image/png"
    assert p.health()["ok"]
    assert p.delete("img:1")
    assert p.get("img:1") is None
    p.close()


def test_redis_provider_fails_fast_when_down():
    with pytest.raises(OSError):
        RedisStorageProvider(port=1)  # nothing listens there
