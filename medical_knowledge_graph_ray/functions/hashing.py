"""Stable, content-derived hashing primitives.

The reference assigns ids by enumeration order (global sentence counter
``ind``, ``generation.py:293-294``; ``entity_ind = range(len(df))``,
``clean_and_save.py:1079-1080``; ``head_id`` by group enumeration,
``clean_and_save.py:1174-1180``).  Enumeration ids are order-dependent and
break under parallel / streaming execution, so this engine derives every id
from content via md5 (stable across processes, platforms, and parallelism
levels — unlike Python's salted ``hash()``).
"""

from __future__ import annotations

import hashlib

__all__ = [
    "md5_int",
    "md5_hex",
    "stable_id",
    "stable_unit",
    "stable_bucket",
]


def md5_hex(s: str) -> str:
    """Full 32-char md5 hex digest of a UTF-8 string."""
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_int(s: str, bits: int = 64) -> int:
    """First ``bits`` bits of md5(s) as a non-negative int."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[: bits // 4], 16)


def stable_id(*parts: object, prefix: str = "") -> str:
    """Deterministic 16-hex-char id from the given key parts.

    Replacement for the reference's enumeration ids: two runs at different
    parallelism produce identical ids for identical content.
    """
    key = "\x1f".join(str(p) for p in parts)
    h = hashlib.md5(key.encode("utf-8")).hexdigest()[:16]
    return f"{prefix}{h}" if prefix else h


def stable_unit(*parts: object) -> float:
    """Deterministic float in [0, 1) from the key parts (seeded 'randomness'
    for synthetic model scorers; never ``random`` in distributed stages)."""
    return md5_int("\x1f".join(str(p) for p in parts), bits=52) / float(1 << 52)


def stable_bucket(s: str, n: int) -> int:
    """Deterministic bucket assignment in [0, n) — used for hash partitioning
    and salting hot keys."""
    return md5_int(s, bits=32) % n
