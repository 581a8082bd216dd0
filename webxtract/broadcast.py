"""Broadcast-object helper for task-pool stages.

Actor pools reserve their minimum actors for the whole pipeline; a chain
of small broadcast-lookup stages expressed as actor pools can demand
more minimum CPUs than the cluster has and wedge the streaming executor
(observed with 3 stacked pools on a 4-CPU session). Lookup stages are
therefore plain functions (task pool, elastic) and fetch their broadcast
object through this per-worker cache: ``ray.get`` of a small dict is
shared-memory local, and the cache avoids re-deserializing it on every
batch within a reused worker process.
"""

from __future__ import annotations

_CACHE: dict[str, object] = {}
_DERIVED: dict[tuple[str, str], object] = {}


def get_broadcast(ref):
    """ray.get(ref) with a process-level cache (workers are reused)."""
    if isinstance(ref, (dict, tuple, list, set)):
        return ref  # already a local object (single-process/test path)
    key = ref.hex()
    if key not in _CACHE:
        import ray

        _CACHE[key] = ray.get(ref)
    return _CACHE[key]


def get_broadcast_derived(ref, tag: str, builder):
    """``builder(get_broadcast(ref))`` computed once per worker process.

    Lets probe stages keep a vectorization-friendly view of a broadcast
    object (e.g. an Arrow value-set array built from a key set) without
    rebuilding it on every batch. ``tag`` namespaces multiple derived
    views of the same ref."""
    if isinstance(ref, (dict, tuple, list, set)):
        return builder(ref)  # local/test path: no stable cache key
    key = (ref.hex(), tag)
    if key not in _DERIVED:
        _DERIVED[key] = builder(get_broadcast(ref))
    return _DERIVED[key]
