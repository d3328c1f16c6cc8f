"""Casascius minikey search engine.

Reference capability: keyhunt -m minikeys (keyhunt.cpp:2338-2509,
5619-5739): a minikey is 'S' + 21 base58 chars; it is *valid* iff
sha256(minikey + '?')[0] == 0x00, and its private key is sha256(minikey).

TPU pipeline per chunk (all batched):
  1. host: materialize B candidate minikeys from a base-58 suffix counter
     (vectorized numpy divmods) and pack the 22- and 23-byte messages into
     SHA-256 block words,
  2. device: sha256(mk||'?') -> validity lane mask; sha256(mk) -> scalar;
     GTable batched scalar-mult -> pubkey; parity-correct hash160;
     sorted-table target lookup,
  3. host: exact golden-reference re-verification of flagged lanes.

The suffix counter spans the last SUFFIX_LEN chars (58^10 ≈ 4.3e17 fits
uint64 lanes); the prefix is random or user-provided, mirroring the
reference's random-base + increment_minikey_N scan (keyhunt.cpp:897-917).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import points, tables
from ..filter import sorted_table as st
from ..hash.hash160 import hash160_from_x_parity, hash160_from_xy
from ..hash.sha256 import sha256_block_words
from ..ref import ecref, hashref
from ..utils.targets import TargetSet
from .common import FoundKey, SearchStats

_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
SUFFIX_LEN = 10


@dataclass(frozen=True)
class MinikeyParams:
    batch: int = 1024  # minikeys per device chunk
    chain_len: int = 32


class MinikeyEngine:
    def __init__(
        self,
        targets: TargetSet,
        prefix: Optional[str] = None,
        params: MinikeyParams = MinikeyParams(),
    ):
        self.targets = targets
        self.table = targets.build_table()
        self.p = params
        self.stats = SearchStats()
        if prefix is None:
            prefix = "S" + "".join(
                secrets.choice(_B58) for _ in range(21 - SUFFIX_LEN)
            )
        if not prefix.startswith("S") or len(prefix) != 22 - SUFFIX_LEN:
            raise ValueError(
                f"prefix must be 'S' + {21 - SUFFIX_LEN} base58 chars"
            )
        self.prefix = prefix
        self.counter = 0  # suffix counter in [0, 58^SUFFIX_LEN)
        gx, gy = tables.gtable_np()
        self._gx = jnp.asarray(gx)
        self._gy = jnp.asarray(gy)
        self._chunk_fn = self._make_chunk_fn()

    # ------------------------------------------------------------------

    def _minikey_bytes(self, start: int, count: int) -> np.ndarray:
        """(count, 22) uint8 minikey strings for suffix counter range."""
        alpha = np.frombuffer(_B58.encode(), dtype=np.uint8)
        vals = start + np.arange(count, dtype=np.uint64)
        out = np.empty((count, 22), dtype=np.uint8)
        out[:, : 22 - SUFFIX_LEN] = np.frombuffer(
            self.prefix.encode(), dtype=np.uint8
        )
        for pos in range(SUFFIX_LEN - 1, -1, -1):
            vals, digit = np.divmod(vals, np.uint64(58))
            out[:, 22 - SUFFIX_LEN + pos] = alpha[digit.astype(np.int64)]
        return out

    @staticmethod
    def _pack_block_words(msgs: np.ndarray, msg_len: int) -> np.ndarray:
        """(B, L) bytes -> (B, 16) uint32 BE words of the padded block."""
        b = msgs.shape[0]
        block = np.zeros((b, 64), dtype=np.uint8)
        block[:, :msg_len] = msgs[:, :msg_len]
        block[:, msg_len] = 0x80
        bitlen = msg_len * 8
        block[:, 62] = (bitlen >> 8) & 0xFF
        block[:, 63] = bitlen & 0xFF
        return block.reshape(b, 16, 4).astype(np.uint32) @ np.array(
            [1 << 24, 1 << 16, 1 << 8, 1], dtype=np.uint32
        )

    def _make_chunk_fn(self):
        table = self.table
        gx, gy = self._gx, self._gy
        chain = self.p.chain_len

        @jax.jit
        def chunk(w22, w23):
            """w22/w23: (B, 16) uint32 block words. Returns hit/valid masks."""
            wv = [w23[:, i] for i in range(16)]
            valid = (sha256_block_words(wv)[0] >> jnp.uint32(24)) == 0
            wk = [w22[:, i] for i in range(16)]
            kw = sha256_block_words(wk)  # 8 BE words = privkey
            k_limbs = jnp.stack([kw[7 - i] for i in range(8)], axis=-1)
            pub = points.scalar_mult_batch(k_limbs, gx, gy, chain_len=chain)
            odd = (pub.y[..., 0] & jnp.uint32(1)) == 1
            # Casascius minikeys historically map to UNCOMPRESSED addresses;
            # check both forms (like the reference's -l both capability)
            wc = hash160_from_x_parity(pub.x, odd)
            wu = hash160_from_xy(pub.x, pub.y)
            lc = st.lookup(table, wc[1], wc[0])
            lu = st.lookup(table, wu[1], wu[0])
            hit = (lc.found | lc.found2 | lu.found | lu.found2) & valid & ~pub.inf
            return hit, valid, lc.idx

        return chunk

    # ------------------------------------------------------------------

    def search(
        self,
        max_chunks: int = 1 << 30,
        stop_on_first: bool = True,
        progress_every: int = 0,
    ) -> List[FoundKey]:
        found: List[FoundKey] = []
        b = self.p.batch
        for ci in range(max_chunks):
            msgs = self._minikey_bytes(self.counter, b)
            w22 = jnp.asarray(self._pack_block_words(msgs, 22))
            msgs23 = np.concatenate(
                [msgs, np.full((b, 1), ord("?"), dtype=np.uint8)], axis=1
            )
            w23 = jnp.asarray(self._pack_block_words(msgs23, 23))
            hit, valid, _ = self._chunk_fn(w22, w23)
            hit_np = np.asarray(hit)
            if hit_np.any():
                for i in np.nonzero(hit_np)[0]:
                    mk = msgs[i].tobytes().decode()
                    fk = self._verify_minikey(mk)
                    if fk is not None:
                        found.append(fk)
                        if stop_on_first:
                            return found
            self.stats.add(b)
            self.counter += b
            if progress_every and ci % progress_every == 0:
                print(
                    f"[minikeys] {self.counter} scanned, "
                    f"{int(np.asarray(valid).sum())}/{b} valid last chunk, "
                    f"{self.stats.human()}"
                )
        return found

    def _verify_minikey(self, mk: str) -> Optional[FoundKey]:
        if hashref.sha256((mk + "?").encode())[0] != 0:
            return None
        k = int.from_bytes(hashref.sha256(mk.encode()), "big")
        if not (1 <= k < ecref.N):
            return None
        pt = ecref.scalar_mult(k)
        for compressed in (False, True):
            h = hashref.pubkey_to_hash160(pt, compressed=compressed)
            if h in self.targets.raw:
                label = self.targets.labels[self.targets.raw.index(h)]
                return FoundKey(
                    private_key=k,
                    pubkey=pt,
                    compressed=compressed,
                    target=f"{label} (minikey {mk})",
                )
        return None
