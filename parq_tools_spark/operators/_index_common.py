"""Helpers shared by the persisted-index families (BM25
``operators/search.py``, vector-ANN ``operators/ann_index.py``,
MinHash ``operators/dedup.py``) so the pieces of the on-disk protocol
that must stay in lockstep have ONE definition. The per-index
manifest/sweep/compact logic intentionally stays in each module —
those differ in real ways (terms snapshots, tombstones, the model
file) — but generation tags and the id-type round-trip are protocol,
not policy."""

from __future__ import annotations

__all__ = ["tag", "seg_version", "id_field_json", "id_field"]


def seg_version(name: str) -> int:
    """The committing version baked into a segment/tombstone name by
    :func:`tag` (``<prefix>-<version>-<random>``) — what the
    version-scoped tombstone visibility rule compares against."""
    return int(name.split("-")[1])


def tag(n: int, prefix: str) -> str:
    """A collision-free name for one generation's immutable artifact:
    ``<prefix>-<version>-<random>``. The version prefix makes ``ls``
    forensics readable; the uuid suffix means a retried operation
    never collides with its crashed predecessor's orphan."""
    import uuid

    return f"{prefix}-{n:06d}-{uuid.uuid4().hex[:8]}"


def id_field_json(df, col: str) -> str:
    """The id column's (name, type) serialized for the manifest — so
    every query path, including over an EMPTY index, reproduces the
    indexed schema exactly (no type flips between index states)."""
    from pyspark.sql import types as T

    return T.StructType([df.schema[col]]).json()


def id_field(m: dict):
    """The indexed id column's StructField recovered from a manifest
    written by :func:`id_field_json`."""
    import json

    from pyspark.sql import types as T

    return T.StructType.fromJson(json.loads(m["id_type"])).fields[0]
