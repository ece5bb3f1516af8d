"""Metastore: split metadata, atomic publish, checkpoints, lineage.

The Spark-native analogue of the reference's metastore + checkpoint
machinery (quickwit-metastore/src/split_metadata.rs:56-138,
checkpoint.rs:33-211, publisher.rs:87-111):

- a JSON manifest beside the index data holds the split list with
  per-split metadata (``num_docs``, ``total_tokens``, ``time_range``,
  ``tags``, ``state``, per-partition lineage + metrics);
- split states follow ``Staged → Published → MarkedForDeletion``;
- publish is ATOMIC: manifest written to a temp file then
  ``os.replace``d (POSIX rename atomicity) together with the
  checkpoint delta, mirroring the reference's atomic
  ``publish_splits(index, source, split_ids, checkpoint_delta)``;
- the source checkpoint maps partition-id → position and REJECTS
  non-contiguous/overlapping deltas like checkpoint.rs:160-178, which
  is what makes builds resumable: a re-run skips partitions whose
  positions are already recorded.

Data layout under ``index_dir``::

    manifest.json                  # split list + config + checkpoints
    postings/split_id=<sid>/*.parquet
    docmap/split_id=<sid>/*.parquet
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Any

from quickwit_spark.plans.config import IndexConfig

STAGED = "Staged"
PUBLISHED = "Published"
MARKED_FOR_DELETION = "MarkedForDeletion"


class CheckpointError(ValueError):
    """Incompatible checkpoint delta (overlap / gap)."""


@dataclass
class SplitMetadata:
    split_id: str
    state: str = STAGED
    num_docs: int = 0
    total_tokens: dict[str, int] = field(default_factory=dict)  # per field
    time_range: tuple[int, int] | None = None  # [min,max] epoch micros
    tags: dict[str, list[str]] = field(default_factory=dict)
    create_timestamp: float = 0.0
    update_timestamp: float = 0.0
    merge_ops: int = 0
    lineage: dict[str, Any] = field(default_factory=dict)  # build metrics

    def to_dict(self) -> dict:
        d = asdict(self)
        if self.time_range is not None:
            d["time_range"] = list(self.time_range)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "SplitMetadata":
        d = dict(d)
        tr = d.get("time_range")
        d["time_range"] = tuple(tr) if tr is not None else None
        return cls(**d)


class Metastore:
    """File-backed metastore for one index (single-writer)."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.manifest_path = os.path.join(index_dir, "manifest.json")

    # -- creation / load ------------------------------------------------
    def create(self, config: IndexConfig) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        if os.path.exists(self.manifest_path):
            raise FileExistsError(self.manifest_path)
        self._write(
            {
                "version": 1,
                "config": config.to_dict(),
                "splits": [],
                "checkpoints": {},  # source_id -> {partition -> position}
            }
        )

    def exists(self) -> bool:
        return os.path.exists(self.manifest_path)

    def state_token(self):
        """Changes whenever any split mutation lands (every mutation
        rewrites the manifest atomically) — Searcher cache key."""
        try:
            st = os.stat(self.manifest_path)
        except OSError:
            return None
        return (st.st_mtime_ns, st.st_size)

    def _read(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write(self, manifest: dict) -> None:
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.manifest_path)  # atomic publish

    # -- views ----------------------------------------------------------
    def config(self) -> IndexConfig:
        return IndexConfig.from_dict(self._read()["config"])

    def splits(self, states: tuple[str, ...] | None = None) -> list[SplitMetadata]:
        out = [SplitMetadata.from_dict(s) for s in self._read()["splits"]]
        if states is not None:
            out = [s for s in out if s.state in states]
        return out

    def list_published(self) -> list[SplitMetadata]:
        return self.splits((PUBLISHED,))

    def checkpoint(self, source_id: str) -> dict[str, str]:
        return dict(self._read()["checkpoints"].get(source_id, {}))

    # -- mutations (single-writer, atomic via rename) -------------------
    def allocate_split_ids(self, n: int) -> list[str]:
        """Reserve ``n`` contiguous split ids. Allocation is a
        metastore mutation (not a read-compute-use on the split list)
        so concurrent writers can never hand out the same id — ids of
        runs that crash before staging are simply burnt. The reserved
        counter rides the manifest as ``next_split_id``."""
        if n <= 0:
            raise ValueError("n must be positive")
        m = self._read()
        base = max(
            int(m.get("next_split_id", 0)),
            max((int(s["split_id"]) for s in m["splits"]), default=-1) + 1,
        )
        m["next_split_id"] = base + n
        self._write(m)
        return [str(base + i) for i in range(n)]

    def stage_splits(self, metas: list[SplitMetadata]) -> None:
        """Stage new splits. A leftover ``Staged`` entry with the same id
        (from a build that crashed before publish) is superseded — split
        data writes are idempotent per split (dynamic partition
        overwrite), so re-staging + rebuild is the resume path. Colliding
        with a ``Published``/``MarkedForDeletion`` split is a real
        conflict and still raises."""
        m = self._read()
        by_id = {s["split_id"]: s for s in m["splits"]}
        now = time.time()
        for meta in metas:
            prev = by_id.get(meta.split_id)
            if prev is not None and prev["state"] != STAGED:
                raise ValueError(
                    f"split {meta.split_id} already exists in state "
                    f"{prev['state']}"
                )
            meta.state = STAGED
            meta.create_timestamp = meta.create_timestamp or now
            meta.update_timestamp = now
            if prev is not None:
                m["splits"] = [
                    s for s in m["splits"] if s["split_id"] != meta.split_id
                ]
            m["splits"].append(meta.to_dict())
            by_id[meta.split_id] = meta.to_dict()
        self._write(m)

    def publish_splits(
        self,
        split_ids: list[str],
        source_id: str | None = None,
        checkpoint_delta: dict[str, str] | None = None,
        replaced_split_ids: list[str] | None = None,
    ) -> None:
        """Atomically publish splits + advance the source checkpoint,
        optionally replacing (retiring) merged-away splits.

        Mirrors publisher.rs:87-111 / metastore replace semantics.
        """
        m = self._read()
        by_id = {s["split_id"]: s for s in m["splits"]}
        for sid in split_ids:
            if sid not in by_id:
                raise KeyError(f"unknown split {sid}")
        if checkpoint_delta:
            cp = m["checkpoints"].setdefault(source_id or "default", {})
            for part, pos in checkpoint_delta.items():
                prev = cp.get(part)
                if prev is not None and str(pos) <= str(prev):
                    raise CheckpointError(
                        f"partition {part}: position {pos!r} does not advance {prev!r}"
                    )
            for part, pos in checkpoint_delta.items():
                cp[part] = str(pos)
        now = time.time()
        for sid in split_ids:
            by_id[sid]["state"] = PUBLISHED
            by_id[sid]["update_timestamp"] = now
        for sid in replaced_split_ids or []:
            if sid in by_id:
                by_id[sid]["state"] = MARKED_FOR_DELETION
                by_id[sid]["update_timestamp"] = now
        self._write(m)

    def mark_for_deletion(self, split_ids: list[str]) -> None:
        m = self._read()
        now = time.time()
        for s in m["splits"]:
            if s["split_id"] in split_ids:
                s["state"] = MARKED_FOR_DELETION
                s["update_timestamp"] = now
        self._write(m)

    def delete_splits(self, split_ids: list[str]) -> None:
        m = self._read()
        keep = []
        for s in m["splits"]:
            if s["split_id"] in split_ids:
                if s["state"] != MARKED_FOR_DELETION:
                    raise ValueError(
                        f"split {s['split_id']} not MarkedForDeletion"
                    )
            else:
                keep.append(s)
        m["splits"] = keep
        self._write(m)

    # -- data paths -----------------------------------------------------
    def postings_dir(self) -> str:
        return os.path.join(self.index_dir, "postings")

    def docmap_dir(self) -> str:
        return os.path.join(self.index_dir, "docmap")

    def split_postings_dir(self, split_id: str) -> str:
        return os.path.join(self.postings_dir(), f"split_id={split_id}")

    def split_docmap_dir(self, split_id: str) -> str:
        return os.path.join(self.docmap_dir(), f"split_id={split_id}")


def open_metastore(index_dir: str, config: IndexConfig | None = None):
    """Resolve the metastore backend for ``index_dir``.

    Existing indexes are detected by layout (``metastore/_log`` →
    table-backed commit log, ``manifest.json`` → file-backed). For an
    index that does not exist yet, ``config.metastore_backend`` picks
    the backend that a subsequent ``create()`` will lay down
    (file-backed default — single-writer JSON manifest; ``"table"`` —
    the multi-writer commit log in
    :mod:`quickwit_spark.plans.table_metastore`, the reference's
    PostgreSQL-metastore analogue).
    """
    from quickwit_spark.plans.table_metastore import TableMetastore

    table = TableMetastore(index_dir)
    if table.exists():
        return table
    file_ms = Metastore(index_dir)
    if file_ms.exists():
        return file_ms
    backend = getattr(config, "metastore_backend", "file") if config else "file"
    if backend == "table":
        return table
    if backend != "file":
        raise ValueError(f"unknown metastore_backend {backend!r}")
    return file_ms
