"""Target sets: parse files of addresses / hash160s / ETH / xpoints / pubkeys
and pack them into device-searchable sorted tables.

Reference parity: forceReadFileAddress (keyhunt.cpp:6301-6372), ETH reader
(:6374-6450), xpoint reader (:6454-6557), BSGS pubkey reader (:961-1044).

Packing convention (must match the device hash/curve kernels):
- 20-byte digests (hash160 / ETH): key64 = first 8 digest bytes,
  lo = bytes[0:4] LE, hi = bytes[4:8] LE — the same layout the device
  ripemd160/keccak kernels emit as words 0 and 1.
- X points: key64 = low 64 bits of X (limbs 0, 1), matching
  filter.sorted_table.trunc64_from_limbs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..filter import sorted_table as st
from ..ref import ecref, hashref


@dataclass
class TargetSet:
    kind: str  # 'hash160' | 'eth' | 'xpoint' | 'pubkey'
    raw: List[bytes]  # 20-byte digests or 32-byte X (for exact host compare)
    labels: List[str]  # original text form for reporting
    pubkeys: List[Tuple[int, int]] = field(default_factory=list)  # pubkey kind
    _built: dict = field(default_factory=dict, repr=False, compare=False)

    def build_bitmap(self, bits_log2: Optional[int] = None):
        """Device bitmap over the 64-bit target keys (filter/bitmap.py) —
        the brute engines' level-1 membership probe. Memoized per
        instance: fleet workers construct a fresh engine per leased
        range over the SAME target set (dist/worker.brute_search_fn)."""
        key = ("bitmap", bits_log2)
        if key not in self._built:
            from ..filter import bitmap as bmp

            t = self.build_table()
            self._built[key] = bmp.build_bitmap(
                np.asarray(t.hi), np.asarray(t.lo), bits_log2
            )
        return self._built[key]

    def target_words(self) -> Tuple[np.ndarray, np.ndarray]:
        """(lo, hi) uint32 arrays of the 64-bit truncated target keys,
        UNSORTED (row i = raw[i]) — the in-kernel compare membership form
        (curve/pbrute.py). Packing matches the device hash kernels:
        hash160 bytes 0..3 / 4..7 LE; xpoint low 64 bits of X."""
        his, los = [], []
        for b in self.raw:
            if self.kind == "xpoint":
                x = int.from_bytes(b, "big")
                los.append(x & 0xFFFFFFFF)
                his.append((x >> 32) & 0xFFFFFFFF)
            else:
                los.append(int.from_bytes(b[0:4], "little"))
                his.append(int.from_bytes(b[4:8], "little"))
        return (
            np.asarray(los, dtype=np.uint32),
            np.asarray(his, dtype=np.uint32),
        )

    def build_table(self) -> st.SortedXTable:
        if "table" not in self._built:
            lo, hi = self.target_words()
            idx = np.arange(len(self.raw), dtype=np.uint32)
            self._built["table"] = st.build_sorted_table(hi, lo, idx)
        return self._built["table"]

    def __len__(self) -> int:
        return len(self.raw)


def _parse_line_address(line: str) -> Optional[bytes]:
    line = line.strip()
    if not line:
        return None
    if len(line) == 40:
        try:
            return bytes.fromhex(line)
        except ValueError:
            pass
    return hashref.b58check_decode(line)[1:]


def parse_target_file(path: str, kind: str) -> TargetSet:
    """Parse a text file of targets. kind in
    {'address', 'rmd160', 'eth', 'xpoint', 'pubkey'}."""
    raw: List[bytes] = []
    labels: List[str] = []
    pubkeys: List[Tuple[int, int]] = []
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    native_h160: dict = {}
    if kind in ("address", "rmd160") and len(lines) > 10000:
        # bulk-parse big address files through the native runtime
        # (reference forceReadFileAddress is a C loop, keyhunt.cpp:6301;
        # per-line python base58 is ~10k lines/s — native is ~100x)
        from .. import native

        if native.available():
            toks = [ln.split()[0] for ln in lines]
            b58 = [t for t in toks if len(t) != 40]
            decoded = native.parse_addresses(
                ("\n".join(b58)).encode(), len(b58)
            )
            for t, row in zip(b58, decoded):
                if row.any():  # zeros = bad line -> python path raises
                    native_h160[t] = row.tobytes()
    for ln in lines:
        tok = ln.split()[0]
        if kind in ("address", "rmd160"):
            h = native_h160.get(tok) or _parse_line_address(tok)
            if h is None or len(h) != 20:
                raise ValueError(f"bad address/rmd160 target: {ln!r}")
            raw.append(h)
            labels.append(tok)
        elif kind == "eth":
            t = tok[2:] if tok.lower().startswith("0x") else tok
            if len(t) != 40:
                raise ValueError(f"bad eth target: {ln!r}")
            raw.append(bytes.fromhex(t.lower()))
            labels.append(tok)
        elif kind == "xpoint":
            t = tok
            if len(t) in (66, 130):  # full pubkey given: take X
                pt = ecref.parse_pubkey(t)
                raw.append(pt[0].to_bytes(32, "big"))
            elif len(t) == 64:
                raw.append(bytes.fromhex(t))
            else:
                raise ValueError(f"bad xpoint target: {ln!r}")
            labels.append(tok)
        elif kind == "pubkey":
            pt = ecref.parse_pubkey(tok)
            pubkeys.append(pt)
            raw.append(pt[0].to_bytes(32, "big"))
            labels.append(tok)
        else:
            raise ValueError(f"unknown target kind {kind}")
    return TargetSet(
        kind="xpoint" if kind == "xpoint" else ("hash160" if kind in ("address", "rmd160") else kind),
        raw=raw,
        labels=labels,
        pubkeys=pubkeys,
    )


def targets_from_ints(kind: str, values: "Sequence[bytes | int]",
                      labels=None) -> TargetSet:
    """TargetSet from raw digests. Ints are converted big-endian at the
    kind's digest width (hash160/eth: 20 bytes, xpoint/pubkey: 32)."""
    widths = {"hash160": 20, "address": 20, "rmd160": 20, "eth": 20,
              "xpoint": 32, "pubkey": 32}
    if kind not in widths:
        raise ValueError(f"unknown target kind {kind!r}")
    width = widths[kind]
    raw = [v if isinstance(v, bytes) else int(v).to_bytes(width, "big")
           for v in values]
    return TargetSet(kind=kind, raw=raw,
                     labels=labels or [v.hex() for v in raw])


# ---------------------------------------------------------------------------
# Parsed-target cache (reference data_<sha>.dat, keyhunt.cpp:6578-6678):
# large target files are parsed once; reloads keyed by the file's content
# hash skip base58/hex decoding entirely. Versioned npz + sha256 checksum
# instead of the reference's raw-struct dump (SURVEY.md §7.4).
# ---------------------------------------------------------------------------

_CACHE_VERSION = 1


def _file_digest(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def cache_path_for(path: str, kind: str) -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.abspath(path)) or ".",
        f"data_{_file_digest(path)[:8]}_{kind}.npz",
    )


def _reference_dat_targets(path: str, kind: str) -> Optional[TargetSet]:
    """Load targets from a reference-written `data_<8-hex>.dat` binary
    cache if one sits next to the target file or in the cwd
    (keyhunt.cpp:6131-6279; the reference writes it to the cwd). Only
    20-byte-value kinds (address/rmd160 hash160s) map onto the
    reference's `struct address_value` table."""
    import os

    if kind not in ("address", "rmd160"):
        return None
    from . import legacy

    dirs = [os.path.dirname(os.path.abspath(path)) or ".", "."]
    for d in dict.fromkeys(os.path.abspath(x) for x in dirs):
        dat = legacy.dat_cache_path(path, d)
        if not os.path.exists(dat):
            continue
        try:
            _, values = legacy.read_dat(dat)
        except (OSError, ValueError):
            continue  # corrupt/foreign file: fall back to text parse
        raw = [v.tobytes() for v in values]
        return TargetSet("hash160", raw, [b.hex() for b in raw])
    return None


def write_reference_dat(path: str, ts: TargetSet, dirpath: str = ".") -> str:
    """Write the reference-loadable `data_<8-hex>.dat` companion for a
    target file (the reference's -S address-mode cache,
    keyhunt.cpp:6578-6678) so a reference deployment can reuse this
    framework's parse — and vice versa."""
    from . import legacy

    assert ts.kind == "hash160" and all(len(b) == 20 for b in ts.raw)
    dat = legacy.dat_cache_path(path, dirpath)
    values = np.frombuffer(b"".join(ts.raw), dtype=np.uint8).reshape(-1, 20)
    legacy.write_dat(dat, values)
    return dat


def parse_target_file_cached(path: str, kind: str,
                             reference_dat: bool = True) -> TargetSet:
    """parse_target_file with a content-addressed on-disk cache (and a
    read-through of the reference's binary `data_<8-hex>.dat` when one
    is present — interop with reference -S deployments)."""
    import hashlib

    import numpy as np

    if reference_dat:
        ts = _reference_dat_targets(path, kind)
        if ts is not None:
            return ts
    cpath = cache_path_for(path, kind)
    try:
        with np.load(cpath, allow_pickle=False) as z:
            if int(z["version"]) == _CACHE_VERSION:
                raw_arr = z["raw"]
                digest = hashlib.sha256(raw_arr.tobytes()).hexdigest()
                if digest == str(z["checksum"]):
                    raw = [bytes(r) for r in raw_arr]
                    labels = [str(s) for s in z["labels"]]
                    pubs = z["pubkeys"]
                    pubkeys = [
                        (
                            int.from_bytes(bytes(p[:32]), "big"),
                            int.from_bytes(bytes(p[32:]), "big"),
                        )
                        for p in pubs
                    ] if len(pubs) else []
                    return TargetSet(str(z["kind"]), raw, labels, pubkeys)
    except (OSError, KeyError, ValueError):
        pass
    ts = parse_target_file(path, kind)
    width = len(ts.raw[0]) if ts.raw else 20
    raw_arr = np.frombuffer(b"".join(ts.raw), dtype=np.uint8).reshape(-1, width)
    pub_arr = np.frombuffer(
        b"".join(
            x.to_bytes(32, "big") + y.to_bytes(32, "big") for x, y in ts.pubkeys
        ),
        dtype=np.uint8,
    ).reshape(-1, 64) if ts.pubkeys else np.zeros((0, 64), dtype=np.uint8)
    import hashlib as _hl

    np.savez(
        cpath,
        version=np.int64(_CACHE_VERSION),
        kind=ts.kind,
        raw=raw_arr,
        labels=np.asarray(ts.labels),
        pubkeys=pub_arr,
        checksum=_hl.sha256(raw_arr.tobytes()).hexdigest(),
    )
    return ts
