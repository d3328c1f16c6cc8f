"""Error hierarchy by category (capability of reference
include/keyhunt/core/error.h:26-296 — Exception classes per ErrorCategory
plus a Result<T,E> type; in Python the idiomatic carrier is exceptions,
so Result is not reproduced).
"""

from __future__ import annotations


class KeyhuntError(Exception):
    """Base class for all framework errors."""

    category = "general"


class ConfigError(KeyhuntError):
    """Bad flag / config-file / parameter combination
    (reference: constraint checks like endomorphism x BSGS forbidden,
    keyhunt.cpp:780-789)."""

    category = "config"


class ValidationError(KeyhuntError):
    """Bad user input: malformed address / hex / range / path
    (reference security.h:30-402 input validation)."""

    category = "validation"


class TargetParseError(ValidationError):
    """Target file could not be parsed (reference readers,
    keyhunt.cpp:6088-6678)."""

    category = "targets"


class EngineError(KeyhuntError):
    """Engine invariant violation (bad table, bad shard layout, ...)."""

    category = "engine"


class CheckpointError(KeyhuntError):
    """Corrupt / mismatched checkpoint or table file
    (reference checksum failures, keyhunt.cpp:1373-1612)."""

    category = "checkpoint"
