"""Shared engine machinery: found keys, verification, stats, persistence.

Found keys are appended to KEYFOUNDKEYFOUND.txt (reference writekey,
keyhunt.cpp:5989-6021) and every device candidate is re-verified with the
exact python-int golden reference before being reported (the role GMP
verification plays in the reference's bsgs_thirdcheck, keyhunt.cpp:4330-4363).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional, Tuple

from ..ref import ecref, hashref


@dataclass(frozen=True)
class FoundKey:
    private_key: int
    pubkey: Tuple[int, int]
    compressed: bool = True
    target: str = ""

    def to_lines(self) -> str:
        pk = self.private_key
        pub = hashref.ecref.serialize_pubkey(self.pubkey, self.compressed).hex()
        addr = hashref.pubkey_to_address(self.pubkey, self.compressed)
        return (
            f"Private key: {pk:064x}\n"
            f"Pubkey: {pub}\n"
            f"Address: {addr}\n"
            f"Target: {self.target}\n"
        )


def write_found_key(found: FoundKey, path: str = "KEYFOUNDKEYFOUND.txt") -> None:
    """Append a found key, staging the serialized secret through a
    page-locked SecureBuffer (core/security.py) so the formatted key
    lines never sit in swappable/dumpable pages between formatting and
    the write. The destination file is plaintext by design — reference
    parity (keyhunt.cpp writekey appends to KEYFOUNDKEYFOUND.txt)."""
    import os

    from ..core.security import SecureBuffer

    data = found.to_lines().encode()
    with SecureBuffer(len(data)) as sb:
        sb.write(data)
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o600)
        try:
            os.write(fd, sb.view())
        finally:
            os.close(fd)


class Deadline:
    """Wall-clock bound shared by every search loop.

    Built from ``max_seconds`` (None = unbounded); ``expired()`` gates
    dispatch so the loop stops at the next chunk boundary past the
    deadline while in-flight pipelined work drains (stats stay exact).
    ``max_seconds=0`` expires immediately — nothing dispatches.

    Also honors the process-wide ``request_stop()`` flag (set by the
    CLI's SIGTERM/SIGINT handler): a preempted run stops at its next
    chunk boundary and force-saves its checkpoint — in-process graceful
    shutdown where the reference relied on an ops script scraping logs
    for the last position (vastai_deploy.sh:88-106).
    """

    __slots__ = ("_t",)
    _stop = False  # process-wide, set by request_stop()

    def __init__(self, max_seconds: Optional[float]):
        self._t = None if max_seconds is None else time.time() + max_seconds

    def expired(self) -> bool:
        if Deadline._stop:
            return True
        return self._t is not None and time.time() >= self._t


def request_stop() -> None:
    """Ask every running search loop to stop at its next chunk boundary
    (checkpoints force-save exactly as on a deadline cut)."""
    Deadline._stop = True


def clear_stop() -> None:
    Deadline._stop = False


def stop_requested() -> bool:
    """True once request_stop() fired (a search that returned early did
    so with PARTIAL coverage — callers owning work units must requeue)."""
    return Deadline._stop


def install_stop_handlers(log=None) -> None:
    """Graceful preemption for any entry point: the first SIGTERM/SIGINT
    asks every search loop to stop at its next chunk boundary
    (checkpoints force-save, coverage stays exact); a second signal of
    EITHER type falls through to the previous handler (immediate exit).
    In-process replacement for the reference's ops-script trap + log
    scraping (vastai_deploy.sh:88-106). Main-thread only (signal module
    rule); embeddings calling from other threads are skipped."""
    import signal
    import threading

    if threading.current_thread() is not threading.main_thread():
        return
    if log is None:
        from ..core.log import get_logger

        log = get_logger()
    clear_stop()  # a prior stopped run in this process must not leak

    def handler(signum, frame):
        request_stop()
        log.warn(
            "stop requested (signal %d): finishing current chunk, "
            "saving checkpoint; signal again to force quit" % signum
        )
        # restore BOTH signals: "signal again" must force-quit even if
        # the second signal is the other type (SIGTERM then Ctrl-C)
        for s, h in prev.items():
            signal.signal(s, h)

    prev = {}
    for s in (signal.SIGTERM, signal.SIGINT):
        prev[s] = signal.signal(s, handler)


def verify_candidate_scalar(k: int, target_pubkey: Tuple[int, int]) -> Optional[int]:
    """Exact check: does k*G == target (or -k, matching X-only symmetry)?

    Returns the canonical private key in [1, n) or None.
    """
    k_mod = k % ecref.N
    if k_mod == 0:
        return None
    pt = ecref.scalar_mult(k_mod)
    if pt == target_pubkey:
        return k_mod
    if pt is not None and (pt[0], (-pt[1]) % ecref.P) == target_pubkey:
        return ecref.N - k_mod
    return None


@dataclass
class SearchStats:
    """Throughput accounting (reference stats loop, keyhunt.cpp:2145-2252).

    keys_covered uses the reference's convention: each giant step covers
    its full stride of candidate keys (keyhunt.cpp:2175 steps*N);
    multiplier covers the x2 compressed / x3 endo-xpoint / x6 endo-hash
    accounting (:2175-2187).
    """

    keys_covered: int = 0
    device_ops: int = 0
    multiplier: int = 1
    started_at: float = field(default_factory=time.time)

    def add(self, keys: int, ops: int = 0) -> None:
        self.keys_covered += keys
        self.device_ops += ops
        # feed the process-global metrics registry (core/metrics.py) so the
        # dashboard/metrics endpoint reflects live engine progress
        from ..core.metrics import get_metrics

        m = get_metrics()
        m.inc("keys_covered", keys * self.multiplier)
        m.set_gauge("keys_per_sec_engine", self.keys_per_sec)

    @property
    def elapsed(self) -> float:
        return max(time.time() - self.started_at, 1e-9)

    @property
    def keys_per_sec(self) -> float:
        return self.keys_covered * self.multiplier / self.elapsed

    def human(self) -> str:
        rate = self.keys_per_sec
        for unit in ("", "K", "M", "G", "T", "P", "E", "Z"):
            if rate < 1000:
                return f"{rate:.2f} {unit}keys/s"
            rate /= 1000
        return f"{rate:.2f} Ykeys/s"
