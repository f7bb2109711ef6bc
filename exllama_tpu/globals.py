"""Process-level runtime knobs.

Parity with the reference's globals.py (CPU-affinity pinning via
os.sched_setaffinity) plus TPU-relevant process setup: on TPU the host CPU
mostly runs tokenization and dispatch, so affinity matters less, but the
hook is kept for pinning the dispatch thread on busy hosts.
"""

from __future__ import annotations

import os

affinity_mask: set[int] | None = None


def set_affinity_mask(mask: "set[int] | None" = None):
    global affinity_mask
    affinity_mask = set(mask) if mask else None
    if affinity_mask and hasattr(os, "sched_setaffinity"):
        os.sched_setaffinity(0, affinity_mask)


def set_affinity_str(affinity_str: "str | None"):
    """Comma-separated core list, e.g. '0,1,2,3' (reference globals.py)."""
    if not affinity_str:
        return
    set_affinity_mask({int(x) for x in affinity_str.split(",")})
