"""Sidecar applied-key ledger shared by the stored-index appends.

Both stored artifacts (the IVF-PQ vector index and the gram inverted
index) need at-least-once redo protection for appends: a batch key that
was already applied must make the append a no-op. Round 5 kept those
ledgers inside the artifact's own metadata (the vector index REWROTE its
``meta`` dir per append; the gram index grew a ``\\x1f``-joined
TBLPROPERTIES string) — both judged defective: the meta rewrite has a
crash window that bricks the whole index (Spark deletes the directory
before writing the replacement), and the property ledger grows without
bound and is one unescaped character away from corrupting the ALTER
statement.

This module is the fix, mirroring the warehouse's commit-marker (K4)
protocol: applied keys live in a sidecar marker directory next to the
artifact — ONE small write-once file per key, committed by an atomic
``os.replace`` rename. Nothing live is ever rewritten; the geometry /
centroid / bucket files stay write-once; a crash before the rename simply
re-applies on retry (the same documented crash-window contract as the
warehouse compact/forget paths); the ledger is O(#batches) tiny files,
never a single unbounded value.

Keys are restricted to ``[A-Za-z0-9._-]`` (≤ 200 chars) so the key IS
the file name — no escaping layer to get wrong in either the filesystem
or any SQL literal that might carry it.
"""

from __future__ import annotations

import os
import re

_KEY_RE = re.compile(r"[A-Za-z0-9._-]{1,200}")
_SUFFIX = ".key"


def check_applied_key(key: str) -> str:
    """Validate a batch key: filesystem/SQL-safe charset, bounded length."""
    if not _KEY_RE.fullmatch(key):
        raise ValueError(
            f"invalid applied_key {key!r}: use 1-200 chars of [A-Za-z0-9._-]"
        )
    return key


def applied_keys(ledger_dir: str) -> set[str]:
    """The set of committed batch keys (empty for a fresh artifact)."""
    if not os.path.isdir(ledger_dir):
        return set()
    return {
        fn[: -len(_SUFFIX)]
        for fn in os.listdir(ledger_dir)
        if fn.endswith(_SUFFIX)
    }


def record_applied_key(ledger_dir: str, key: str) -> None:
    """Commit a batch key: tmp write + atomic rename (idempotent)."""
    check_applied_key(key)
    os.makedirs(ledger_dir, exist_ok=True)
    final = os.path.join(ledger_dir, key + _SUFFIX)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        f.write(key)
    os.replace(tmp, final)
