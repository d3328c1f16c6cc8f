"""Search engines (reference keyhunt.cpp thread_process* capabilities).

- ``bsgs``: Baby-Step Giant-Step over pubkey targets — the flagship
  (reference thread_process_bsgs, keyhunt.cpp:3778-4009).
- ``brute``: sequential/random brute-force scanning for address / rmd160 /
  xpoint / eth targets (reference thread_process, keyhunt.cpp:2511-3099).
- ``common``: found-key records, exact host verification, stats.
"""

from .common import FoundKey, SearchStats, write_found_key  # noqa: F401
from .bsgs import BSGSEngine, BSGSParams  # noqa: F401
