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
    """Segments to merge into one (policy.go CompactionTask). The merged
    segment is stamped with `target_level` (policy.go:20-23) — 0 for
    level-agnostic policies, the destination level for LeveledPolicy."""

    segments: list[SegmentMeta]
    target_level: int = 0


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


class LeveledPolicy(CompactionPolicy):
    """Level-based compaction (LeveledCompactionPolicy,
    /root/reference/internal/engine/policy.go:114-221 + defaults
    NewLeveledCompactionPolicy:132-139):

      * L0 holds freshly-committed (possibly overlapping) segments; once
        it accumulates `l0_threshold` of them, ALL of L0 merges into one
        L1 segment (oldest-first order — the reference sorts by segment
        id, the age proxy; ours is the commit lsn).
      * L1..N-2 have size budgets Target(L1)=base_bytes,
        Target(L_i)=Target(L_{i-1})·level_ratio. The first over-budget
        level promotes its OLDEST segment to the next level (the
        reference's approximation of classic LCS victim selection,
        policy.go:196-215 — no key-range overlap info in SegmentStats).
      * Levels >= max_levels clamp to max_levels-1 (policy.go:145-151);
        the top level never promotes.

    Write amplification is bounded per level (each row is rewritten at
    most once per level it passes through), which is why leveled is the
    read-optimized choice for serving-heavy tables: fewer, larger,
    per-level segments keep the manifest and the per-query file list
    short at 100 TB."""

    def __init__(self, l0_threshold: int = 4, level_ratio: int = 10,
                 base_bytes: int = 100 * 1024 * 1024, max_levels: int = 7):
        self.l0_threshold = l0_threshold
        self.level_ratio = level_ratio
        self.base_bytes = base_bytes
        self.max_levels = max_levels

    def pick(self, segments: list[SegmentMeta]) -> CompactionTask | None:
        levels: list[list[SegmentMeta]] = [[] for _ in range(self.max_levels)]
        for s in segments:
            lvl = getattr(s, "level", 0) or 0
            levels[min(lvl, self.max_levels - 1)].append(s)
        if len(levels[0]) >= self.l0_threshold:
            return CompactionTask(
                segments=sorted(levels[0], key=lambda s: (s.lsn, s.path)),
                target_level=1)
        target = self.base_bytes
        for lvl in range(1, self.max_levels - 1):
            if sum(s.bytes for s in levels[lvl]) > target:
                victim = min(levels[lvl], key=lambda s: (s.lsn, s.path))
                return CompactionTask(segments=[victim],
                                      target_level=lvl + 1)
            target *= self.level_ratio
        return None
