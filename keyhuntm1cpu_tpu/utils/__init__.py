"""Utilities: target-file parsing and range helpers.

Capability of the reference's target readers (keyhunt.cpp:6088-6678:
address/rmd160/eth/xpoint/pubkey file loaders) with a versioned,
checksum-friendly in-memory form instead of raw-struct caches.
"""

from .targets import TargetSet, parse_target_file  # noqa: F401
