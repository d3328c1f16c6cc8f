"""Batch-vectorized hash primitives for the address pipelines.

All kernels operate on uint32 lane arrays shaped (B,) per word — pure VPU
bit ops (shifts/ors/xors/adds), branch-free, fixed message sizes:

- ``sha256``: FIPS 180-4 compression specialized for the 33-byte
  (compressed pubkey) and 65-byte (uncompressed) messages — the capability
  of reference hash/sha256.cpp:449-487 (sha256_33/sha256_65) and the
  pack-from-limbs trick of SECP256K1.cpp:513-580, done limb-native.
- ``ripemd160``: single-block RIPEMD-160 of a 32-byte sha256 digest
  (reference hash/ripemd160.cpp, ripemd160_32).
- ``hash160``: fused sha256 -> ripemd160 (reference GetHash160_fromX,
  SECP256K1.cpp:746-790) producing both even/odd-parity digests from
  X-only points.
- ``keccak``: Keccak-256 (0x01 padding) of the 64-byte x||y pubkey for ETH
  addresses (reference sha3/, keyhunt.cpp:4767-4791), with 64-bit lanes
  emulated as uint32 (hi, lo) pairs.
"""

from .sha256 import sha256_33_from_x, sha256_65_from_xy  # noqa: F401
from .ripemd160 import ripemd160_32  # noqa: F401
from .hash160 import hash160_from_x_both_parities, hash160_from_xy  # noqa: F401
from .keccak import keccak256_pubkey64  # noqa: F401
