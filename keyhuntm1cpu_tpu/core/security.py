"""Security utilities: rate limiting, constant-time compare, secure wipe.

Working counterpart of the reference's include/keyhunt/core/security.h
(RateLimiter, secure_compare, secure_wipe — declared there but consumed
by nothing in the reference; here the rate limiter is wired into the
bsgsd network service). Input VALIDATION lives where the inputs are
parsed (utils/targets.py, ref/ecref.parse_pubkey, server request
parsing) rather than in a separate validator class.
"""

from __future__ import annotations

import hmac
import threading
import time
from collections import defaultdict
from typing import Dict, Tuple


class RateLimiter:
    """Token-bucket limiter keyed by client id (e.g. source IP).

    allow(key) consumes one token; buckets refill at `rate` tokens/s up
    to `burst`. Thread-safe; stale buckets are pruned so a scanner cannot
    grow memory unboundedly.
    """

    def __init__(self, rate: float = 5.0, burst: int = 10,
                 max_clients: int = 4096):
        self.rate = float(rate)
        self.burst = float(burst)
        self.max_clients = max_clients
        self._lock = threading.Lock()
        self._buckets: Dict[str, Tuple[float, float]] = {}  # key -> (tokens, t)

    def allow(self, key: str) -> bool:
        now = time.monotonic()
        with self._lock:
            tokens, t = self._buckets.get(key, (self.burst, now))
            tokens = min(self.burst, tokens + (now - t) * self.rate)
            ok = tokens >= 1.0
            if ok:
                tokens -= 1.0
            self._buckets[key] = (tokens, now)
            if len(self._buckets) > self.max_clients:
                # drop the stalest half
                items = sorted(self._buckets.items(), key=lambda kv: kv[1][1])
                for k, _ in items[: len(items) // 2]:
                    del self._buckets[k]
            return ok


def secure_compare(a: bytes, b: bytes) -> bool:
    """Constant-time equality (reference security.h secure_compare)."""
    return hmac.compare_digest(a, b)


class SecureBuffer:
    """Page-locked, wiped-on-close buffer for private-key material.

    Working counterpart of the reference's SecureAllocator/secure pool
    scaffolding (include/keyhunt/core/memory.h:37-474 — declared there,
    consumed by nothing): the backing pages are anonymous mmap, locked
    out of swap with mlock(2) (best-effort: RLIMIT_MEMLOCK may deny it
    in containers — `locked` records the outcome), excluded from core
    dumps via MADV_DONTDUMP where available, and zeroed with a ctypes
    memset (which the interpreter cannot elide, unlike a Python loop a
    JIT could in principle skip) before the pages are unlocked and
    released.

    Python-level copies of data placed here (str/int/bytes objects) are
    NOT covered — same honest caveat as secure_wipe below. The buffer
    guards the one staging area the framework controls: serialized
    found-key lines between formatting and the file write
    (engine/common.py write_found_key).
    """

    def __init__(self, size: int):
        import ctypes
        import mmap as _mmap

        if size <= 0:
            raise ValueError("size must be positive")
        self._size = size
        self._mm = _mmap.mmap(-1, size)
        self._ctypes = ctypes
        self._addr = ctypes.addressof(ctypes.c_char.from_buffer(self._mm))
        self.locked = False
        try:
            libc = ctypes.CDLL(None, use_errno=True)
            self.locked = libc.mlock(
                ctypes.c_void_p(self._addr), ctypes.c_size_t(size)
            ) == 0
            self._libc = libc
        except OSError:
            self._libc = None
        try:  # keep key material out of core dumps
            self._mm.madvise(_mmap.MADV_DONTDUMP)
        except (AttributeError, OSError):
            pass

    def __len__(self) -> int:
        return self._size

    def view(self) -> memoryview:
        return memoryview(self._mm)

    def write(self, data: bytes, offset: int = 0) -> None:
        if offset + len(data) > self._size:
            raise ValueError("write past end of SecureBuffer")
        self._mm[offset : offset + len(data)] = data

    def wipe(self) -> None:
        self._ctypes.memset(self._addr, 0, self._size)

    def close(self) -> None:
        if self._mm.closed:
            return
        self.wipe()
        if self.locked and self._libc is not None:
            self._libc.munlock(
                self._ctypes.c_void_p(self._addr),
                self._ctypes.c_size_t(self._size),
            )
        # release the exported buffer before closing the mmap
        del self._addr
        self._mm.close()

    def __enter__(self) -> "SecureBuffer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def secure_wipe(buf: bytearray) -> None:
    """Overwrite a mutable buffer in place (reference secure_wipe).

    Python cannot guarantee no other copies exist (immutable bytes/ints
    are interned and copied freely), so this only covers the caller's
    bytearray — document-level parity with the reference, which likewise
    only wipes the one buffer it is handed.
    """
    for i in range(len(buf)):
        buf[i] = 0
