"""Pure-Python golden reference layer.

Exact (python-int) secp256k1 arithmetic and hash primitives, written from
the public specifications. Used by the test-suite as ground truth for the
vectorized device kernels, and by the engines for exact host-side
verification of device candidate hits (the role GMP plays in the reference,
gmp256k1/).
"""

from . import ecref, hashref  # noqa: F401
