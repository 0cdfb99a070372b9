"""GTID set semantics — parse / merge / contains for resume fidelity.

Re-expresses the reference's GTID handling
(/root/reference/Bristol/mysql/mysql_gtid.go — MySQL ``uuid:1-5:7-9,...``
sets with interval normalization; /root/reference/Bristol/mysql/
mariadb_gtid.go — MariaDB ``domain-server-seq`` lists merged per domain)
as a driver-side value type.  Positions are pure control-plane state — a
handful of strings per stream — so this is deliberately plain Python,
never on the row path.

Engine wiring: ``TargetTable.merge/apply_ops`` accept an optional
``gtid_set`` that unions into the manifest's ``gtid_executed`` on commit,
giving MySQL-ecosystem tooling a resume position (``SET GTID_PURGED`` /
``START SLAVE`` interop).  The event_id interval manifest remains the
exactly-once authority; ``gtid_executed`` is the exported view of it.
"""

from __future__ import annotations

from bifrost_spark.intervals import merge_intervals as _merge_intervals


class GtidSet:
    """MySQL-style GTID set: ``uuid:ival[:ival...][,uuid:...]`` with
    ``ival = n`` or ``n-m``.  Always kept normalized (sorted, merged)."""

    def __init__(self, sets: dict[str, list[list[int]]] | None = None):
        self.sets: dict[str, list[list[int]]] = {
            u: _merge_intervals(iv) for u, iv in (sets or {}).items()
        }

    # -- parse / format ----------------------------------------------------
    @classmethod
    def parse(cls, text: str | None) -> "GtidSet":
        out: dict[str, list[list[int]]] = {}
        for part in (text or "").replace("\n", "").split(","):
            part = part.strip()
            if not part:
                continue
            fields = part.split(":")
            if len(fields) < 2:
                raise ValueError(f"malformed GTID set element: {part!r}")
            uuid = fields[0]
            for ival in fields[1:]:
                if "-" in ival:
                    lo, hi = ival.split("-", 1)
                    lo_i, hi_i = int(lo), int(hi)
                else:
                    lo_i = hi_i = int(ival)
                if hi_i < lo_i:
                    raise ValueError(f"descending GTID interval: {ival!r}")
                out.setdefault(uuid, []).append([lo_i, hi_i])
        return cls(out)

    def __str__(self) -> str:
        parts = []
        for uuid in sorted(self.sets):
            ivs = ":".join(f"{lo}-{hi}" if hi > lo else str(lo) for lo, hi in self.sets[uuid])
            parts.append(f"{uuid}:{ivs}")
        return ",".join(parts)

    def __repr__(self) -> str:  # pragma: no cover
        return f"GtidSet({str(self)!r})"

    def __eq__(self, other) -> bool:
        return isinstance(other, GtidSet) and self.sets == other.sets

    # -- set algebra ---------------------------------------------------------
    def union(self, other: "GtidSet | str") -> "GtidSet":
        if isinstance(other, str):
            other = GtidSet.parse(other)
        merged = {u: [list(i) for i in iv] for u, iv in self.sets.items()}
        for u, iv in other.sets.items():
            merged.setdefault(u, []).extend([list(i) for i in iv])
        return GtidSet(merged)

    def add(self, gtid: str) -> "GtidSet":
        """Add one transaction ``uuid:txid`` (the per-event form the binlog
        envelope carries)."""
        uuid, txid = gtid.rsplit(":", 1)
        return self.union(GtidSet({uuid: [[int(txid), int(txid)]]}))

    def contains(self, other: "GtidSet | str") -> bool:
        if isinstance(other, str):
            other = GtidSet.parse(other)
        for u, ivs in other.sets.items():
            mine = self.sets.get(u)
            if mine is None:
                return False
            for lo, hi in ivs:
                if not any(mlo <= lo and hi <= mhi for mlo, mhi in mine):
                    return False
        return True

    def compact(self, max_intervals_per_uuid: int = 128) -> "GtidSet":
        """Bound the per-uuid interval count by bridging the smallest gaps
        first.  Safe under ordered commit (an interval commits only after
        everything below it, so a txid strictly between two committed
        intervals was never produced — e.g. the synthetic stream's odd-id
        gaps); real MySQL txid sequences are contiguous per uuid and never
        fragment in the first place."""
        return GtidSet({
            u: _merge_intervals(ivs, max_intervals=max_intervals_per_uuid)
            for u, ivs in self.sets.items()
        })

    def subtract(self, other: "GtidSet | str") -> "GtidSet":
        """Set difference — what still needs replaying to reach ``self``
        from ``other`` (the reference computes the resume start this way)."""
        if isinstance(other, str):
            other = GtidSet.parse(other)
        out: dict[str, list[list[int]]] = {}
        for u, ivs in self.sets.items():
            cut = other.sets.get(u, [])
            rest: list[list[int]] = [list(i) for i in ivs]
            for clo, chi in cut:
                nxt: list[list[int]] = []
                for lo, hi in rest:
                    if chi < lo or clo > hi:
                        nxt.append([lo, hi])
                        continue
                    if lo < clo:
                        nxt.append([lo, clo - 1])
                    if hi > chi:
                        nxt.append([chi + 1, hi])
                rest = nxt
            if rest:
                out[u] = rest
        return GtidSet(out)


class MariadbGtidSet:
    """MariaDB GTID list: ``domain-server-seq[,domain-server-seq...]`` —
    one position per replication domain, merged by MAX sequence (the
    semantics mariadb_gtid.go implements for resume)."""

    def __init__(self, doms: dict[int, tuple[int, int]] | None = None):
        self.doms = dict(doms or {})  # domain -> (server_id, seq)

    @classmethod
    def parse(cls, text: str | None) -> "MariadbGtidSet":
        out: dict[int, tuple[int, int]] = {}
        for part in (text or "").split(","):
            part = part.strip()
            if not part:
                continue
            dom_s, srv_s, seq_s = part.split("-", 2)
            dom, srv, seq = int(dom_s), int(srv_s), int(seq_s)
            if dom not in out or seq > out[dom][1]:
                out[dom] = (srv, seq)
        return cls(out)

    def __str__(self) -> str:
        return ",".join(f"{d}-{s}-{q}" for d, (s, q) in sorted(self.doms.items()))

    def __eq__(self, other) -> bool:
        return isinstance(other, MariadbGtidSet) and self.doms == other.doms

    def union(self, other: "MariadbGtidSet | str") -> "MariadbGtidSet":
        if isinstance(other, str):
            other = MariadbGtidSet.parse(other)
        out = dict(self.doms)
        for d, (s, q) in other.doms.items():
            if d not in out or q > out[d][1]:
                out[d] = (s, q)
        return MariadbGtidSet(out)

    def contains(self, gtid: str) -> bool:
        d, _s, q = (int(x) for x in gtid.split("-", 2))
        return d in self.doms and q <= self.doms[d][1]
