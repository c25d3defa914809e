"""Pluggable compaction policies — the reference's CompactionPolicy
extension point (/root/reference/internal/engine/policy.go:25-230:
Pick(segments) → *CompactionTask; tiered / bounded size-tiered / leveled
implementations, driven by the background loop engine.go:2329-2394).

A policy inspects manifest metadata only (O(#segments), never rows) and
returns the segment subset to merge; VectorTable.maybe_compact executes
the task as a partial rewrite that preserves per-row LSNs so global
upsert/tombstone visibility is unchanged."""

from __future__ import annotations

from dataclasses import dataclass

from vecgo_spark.plans.manifest import SegmentMeta


@dataclass
class CompactionTask:
    """Segments to merge into one (policy.go CompactionTask)."""

    segments: list[SegmentMeta]


class CompactionPolicy:
    """Interface: return a task or None (nothing worth compacting)."""

    def pick(self, segments: list[SegmentMeta]) -> CompactionTask | None:
        raise NotImplementedError


class TieredPolicy(CompactionPolicy):
    """Merge the N smallest segments once the count passes a threshold
    (the reference's default tiered behavior: many small L0 flushes →
    one bigger segment)."""

    def __init__(self, min_segments: int = 4, max_merge: int = 8):
        self.min_segments = min_segments
        self.max_merge = max_merge

    def pick(self, segments: list[SegmentMeta]) -> CompactionTask | None:
        if len(segments) < self.min_segments:
            return None
        smallest = sorted(segments, key=lambda s: (s.bytes, s.lsn))[: self.max_merge]
        return CompactionTask(segments=smallest) if len(smallest) >= 2 else None


class SizeTieredPolicy(CompactionPolicy):
    """Bounded size-tiered (policy.go bounded variant): segments bucket by
    log4(bytes); a bucket holding >= min_tier segments merges. Bounds
    write amplification — a segment is rewritten O(log N) times total."""

    def __init__(self, min_tier: int = 4, base_bytes: int = 1 << 20):
        self.min_tier = min_tier
        self.base_bytes = base_bytes

    def _tier(self, s: SegmentMeta) -> int:
        t, size = 0, max(s.bytes, 1)
        while size > self.base_bytes:
            size //= 4
            t += 1
        return t

    def pick(self, segments: list[SegmentMeta]) -> CompactionTask | None:
        buckets: dict[int, list[SegmentMeta]] = {}
        for s in segments:
            buckets.setdefault(self._tier(s), []).append(s)
        for _, members in sorted(buckets.items()):
            if len(members) >= self.min_tier:
                return CompactionTask(segments=sorted(members, key=lambda s: s.lsn))
        return None
