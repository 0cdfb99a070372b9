"""Shared integer-interval algebra: merge + bounded compaction.

One implementation for both consumers — the commit manifest's applied
event-id ranges (`operators/merge.py`) and GTID transaction-id sets
(`gtid.py`).  Deliberately dependency-free (no pyspark import) so the GTID
value types stay usable off-cluster.
"""

from __future__ import annotations


def merge_intervals(ranges, max_intervals: int | None = None) -> list[list[int]]:
    """Merge overlapping/adjacent [lo, hi] intervals into a minimal sorted
    set, then (optionally) compact to ``max_intervals`` by bridging the
    smallest gaps first.

    Bridging a gap claims its (never-delivered) ids as covered — safe under
    an ordered commit discipline: an interval only commits after everything
    below it, so an id strictly between two committed intervals corresponds
    to no event (e.g. the odd-id gaps between even-id data chunks, or the
    gap-free per-uuid txid sequences of a GTID set)."""
    out: list[list[int]] = []
    for lo, hi in sorted(ranges):
        if out and lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    if max_intervals is not None and len(out) > max_intervals:
        gaps = sorted(range(len(out) - 1), key=lambda i: out[i + 1][0] - out[i][1])
        bridge = set(gaps[: len(out) - max_intervals])
        compacted = [out[0]]
        for i in range(1, len(out)):
            if (i - 1) in bridge:
                compacted[-1][1] = out[i][1]
            else:
                compacted.append(out[i])
        out = compacted
    return out
