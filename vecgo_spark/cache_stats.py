"""Engine cache statistics — the Spark analog of the reference's
``Engine.CacheStats() (hits, misses int64)``
(/root/reference/internal/engine/engine.go:2210-2223: the combined
hit/miss counters of the engine's read-path caches, blockCache +
diskCache).

This engine's read-path caches are keyed artifact registries rather
than block caches (Spark owns page/block caching inside the JVM), but
the accounting question CacheStats answers — "is the serving session
re-paying work the cache should amortize?" — is the same:

- ``pk_index``      — the loaded PK-index frames (plans/table.py
                      ``_VIS_CACHE``): per-snapshot winning-LSN maps
                      consulted by every churned subset read, the
                      analog of the reference's in-memory PK index
                      (internal/pk/mvcc.go:125).
- ``ivf_model``     — trained IVF centroids (operators/ivf.py
                      ``_MODEL_CACHE``), amortizing per-corpus training.
- ``pq_codebooks``  — trained PQ/OPQ codebooks (quantization/pq.py
                      ``_PQ_CACHE``).

Counting stance (same as the reference's sharded LRU,
internal/cache/sharded_lru.go): a lookup that finds its key is a hit, a
lookup that must build/insert is a miss; paths that BYPASS a cache (e.g.
an id-restricted one-off visibility build, or training without a
cache_key) count neither. Counters are process-global like the module
registries they instrument; ``reset()`` zeroes them (tests, epoch
boundaries).
"""

from __future__ import annotations

from threading import Lock

_LOCK = Lock()
_STATS: dict[str, list[int]] = {}  # name -> [hits, misses]


def record(name: str, hit: bool) -> None:
    """Count one lookup against the named cache."""
    with _LOCK:
        s = _STATS.setdefault(name, [0, 0])
        s[0 if hit else 1] += 1


def cache_stats() -> tuple[int, int]:
    """Combined (hits, misses) over every engine cache — the reference's
    ``CacheStats`` signature (engine.go:2211)."""
    with _LOCK:
        return (sum(s[0] for s in _STATS.values()),
                sum(s[1] for s in _STATS.values()))


def cache_stats_detail() -> dict[str, dict[str, int]]:
    """Per-cache breakdown (the reference's per-shard ``ShardStats``
    debugging view, sharded_lru.go:112)."""
    with _LOCK:
        return {k: {"hits": s[0], "misses": s[1]}
                for k, s in sorted(_STATS.items())}


def reset() -> None:
    with _LOCK:
        _STATS.clear()
