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


def secure_wipe(buf: bytearray) -> None:
    """Overwrite a mutable buffer in place (reference secure_wipe).

    Python cannot guarantee no other copies exist (immutable bytes/ints
    are interned and copied freely), so this only covers the caller's
    bytearray — document-level parity with the reference, which likewise
    only wipes the one buffer it is handed.
    """
    for i in range(len(buf)):
        buf[i] = 0
