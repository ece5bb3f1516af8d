"""Table-backed metastore: an action-delta commit log with optimistic
concurrency and a Spark-readable ``splits`` table.

The reference ships a second metastore implementation next to the
file-backed one — PostgreSQL, where every mutation is a transactional
row update and concurrent indexers/mergers/GC coordinate through the
database (quickwit-metastore/src/metastore/postgresql_metastore.rs).
The Spark-native equivalent of "a table multiple writers can safely
mutate" is a Delta-protocol-style commit log (the public Delta Lake
PROTOCOL.md design): numbered JSON commits holding ACTION DELTAS,
created with put-if-absent, plus periodic checkpoints so readers don't
replay history.

Why this shape for the 100 TB design point: the file-backed
``manifest.json`` is rewritten WHOLE on every publish — at ~1e5 splits
with concurrent build/merge/GC writers that blob is the contention
point, and ``os.replace`` atomicity does not exist on object storage.
Here every mutation appends one SMALL commit file whose creation is a
compare-and-swap on the version number:

- locally: ``open(..., O_CREAT | O_EXCL)`` — atomic put-if-absent on
  any POSIX filesystem;
- on S3/GCS at scale: the same protocol maps to conditional PUT
  (``If-None-Match: *``), which is how Delta commits work there.

A writer that loses the race re-reads state, RE-VALIDATES its mutation
against the winner's changes, and retries at the next version —
optimistic concurrency, same guarantee as the reference's PostgreSQL
transactions. Checkpoint deltas that no longer advance after the
re-read fail with ``CheckpointError`` exactly as a serialized
transaction would.

Layout under ``index_dir/metastore``::

    _log/00000000000000000000.json     # commit 0 = create (config)
    _log/00000000000000000001.json     # one file per mutation
    _checkpoints/<v>.state.json        # fold snapshot at version v
    _checkpoints/<v>.splits.parquet    # Spark-readable splits table
    _last_checkpoint                   # {"version": v}

The parquet checkpoint doubles as the ``splits`` TABLE: it is plain
parquet, so ``spark.read.parquet`` (or DuckDB) can query split
metadata at scale — the SURVEY §1.4 "splits table" plan.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Callable

import pyarrow as pa
import pyarrow.parquet as pq

from quickwit_spark.plans.config import IndexConfig
from quickwit_spark.plans.metastore import (
    MARKED_FOR_DELETION,
    PUBLISHED,
    STAGED,
    CheckpointError,
    SplitMetadata,
)

_PAD = 20  # zero-padded version width, sorts lexicographically


class CommitConflict(RuntimeError):
    """Another writer committed this version first (internal; retried)."""


def _empty_state() -> dict:
    return {"version": -1, "config": None, "splits": [], "checkpoints": {}}


def _next_id(state: dict) -> int:
    """First unreserved split id: past both the reserved counter and
    any directly-staged ids (pure function of state — replay-safe)."""
    return max(
        int(state.get("next_split_id", 0)),
        max((int(s["split_id"]) for s in state["splits"]), default=-1) + 1,
    )


def _apply(state: dict, actions: list[dict]) -> None:
    """Fold one commit's actions into ``state`` (mutates in place).

    Action vocabulary (one key per action):
      configure: full config dict            (commit 0 only)
      stage:     full split-metadata dict    (upserts a Staged split)
      publish:   split_id -> Published
      replace:   split_id -> MarkedForDeletion (merged-away input)
      mark:      split_id -> MarkedForDeletion
      remove:    split_id dropped from the table
      checkpoint: {source_id, partition, position}
      alloc:     reserve N contiguous split ids (advances next_split_id)
    """
    by_id = {s["split_id"]: s for s in state["splits"]}
    for a in actions:
        if "configure" in a:
            state["config"] = a["configure"]
        elif "stage" in a:
            meta = a["stage"]
            sid = meta["split_id"]
            if sid in by_id:
                state["splits"] = [
                    s for s in state["splits"] if s["split_id"] != sid
                ]
            state["splits"].append(meta)
            by_id[sid] = meta
        elif "publish" in a:
            by_id[a["publish"]]["state"] = PUBLISHED
            by_id[a["publish"]]["update_timestamp"] = a.get("ts", 0.0)
        elif "replace" in a:
            if a["replace"] in by_id:
                by_id[a["replace"]]["state"] = MARKED_FOR_DELETION
                by_id[a["replace"]]["update_timestamp"] = a.get("ts", 0.0)
        elif "mark" in a:
            if a["mark"] in by_id:
                by_id[a["mark"]]["state"] = MARKED_FOR_DELETION
                by_id[a["mark"]]["update_timestamp"] = a.get("ts", 0.0)
        elif "remove" in a:
            state["splits"] = [
                s for s in state["splits"] if s["split_id"] != a["remove"]
            ]
            by_id.pop(a["remove"], None)
        elif "checkpoint" in a:
            c = a["checkpoint"]
            state["checkpoints"].setdefault(c["source_id"], {})[
                c["partition"]
            ] = str(c["position"])
        elif "alloc" in a:
            state["next_split_id"] = _next_id(state) + int(a["alloc"])
        else:  # unknown action from a future version: fail loudly
            raise ValueError(f"unknown metastore action: {sorted(a)}")


# Spark-readable splits-table schema. Nested dicts ride as JSON
# strings so the parquet stays flat & queryable (from_json on read).
_SPLITS_SCHEMA = pa.schema(
    [
        ("split_id", pa.string()),
        ("state", pa.string()),
        ("num_docs", pa.int64()),
        ("total_tokens", pa.string()),
        ("time_range_min", pa.int64()),
        ("time_range_max", pa.int64()),
        ("tags", pa.string()),
        ("create_timestamp", pa.float64()),
        ("update_timestamp", pa.float64()),
        ("merge_ops", pa.int64()),
        ("lineage", pa.string()),
    ]
)


def _splits_arrow(splits: list[dict]) -> pa.Table:
    cols: dict[str, list] = {name: [] for name in _SPLITS_SCHEMA.names}
    for s in splits:
        tr = s.get("time_range")
        cols["split_id"].append(s["split_id"])
        cols["state"].append(s["state"])
        cols["num_docs"].append(int(s.get("num_docs", 0)))
        cols["total_tokens"].append(json.dumps(s.get("total_tokens", {})))
        cols["time_range_min"].append(None if tr is None else int(tr[0]))
        cols["time_range_max"].append(None if tr is None else int(tr[1]))
        cols["tags"].append(json.dumps(s.get("tags", {})))
        cols["create_timestamp"].append(float(s.get("create_timestamp", 0)))
        cols["update_timestamp"].append(float(s.get("update_timestamp", 0)))
        cols["merge_ops"].append(int(s.get("merge_ops", 0)))
        cols["lineage"].append(json.dumps(s.get("lineage", {})))
    return pa.table(cols, schema=_SPLITS_SCHEMA)


class TableMetastore:
    """Commit-log metastore for one index (multi-writer safe).

    Same contract as :class:`quickwit_spark.plans.metastore.Metastore`
    (the ``metastore_test_suite!`` analogue in tests/test_metastore.py
    runs against both), plus optimistic concurrency: concurrent
    stage/publish/mark/delete from independent processes serialize
    through version CAS instead of corrupting each other.
    """

    CHECKPOINT_INTERVAL = 16  # fold snapshot every N commits
    MUTATION_RETRIES = 32

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.meta_dir = os.path.join(index_dir, "metastore")
        self.log_dir = os.path.join(self.meta_dir, "_log")
        self.ckpt_dir = os.path.join(self.meta_dir, "_checkpoints")
        self.last_ckpt_path = os.path.join(self.meta_dir, "_last_checkpoint")

    # -- commit-log primitives -------------------------------------------
    def _commit_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:0{_PAD}d}.json")

    def _latest_version(self) -> int:
        try:
            names = os.listdir(self.log_dir)
        except FileNotFoundError:
            return -1
        best = -1
        for n in names:
            if n.endswith(".json"):
                try:
                    best = max(best, int(n[: -len(".json")]))
                except ValueError:
                    continue
        return best

    def _put_if_absent(self, path: str, payload: dict) -> None:
        """Atomic put-if-absent WITH full content: write + fsync a
        temp file, then ``os.link`` it to the final name — link fails
        if the name exists (the CAS) and never exposes a partial or
        empty commit to readers, even if this process dies mid-write
        (a bare ``O_CREAT|O_EXCL`` open would publish an empty file
        before the payload lands). On object storage the equivalent is
        a conditional PUT (``If-None-Match: *``), which is also
        all-or-nothing. Raises CommitConflict if the version was taken
        by another writer."""
        data = json.dumps(payload, indent=0).encode()
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            written = 0
            while written < len(data):
                written += os.write(fd, data[written:])
            os.fsync(fd)
        finally:
            os.close(fd)
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise CommitConflict(path)
        finally:
            os.unlink(tmp)

    def _load_state(self) -> dict:
        """Snapshot (if any) + replay of newer commits."""
        state = _empty_state()
        # retry: between reading the pointer and opening the snapshot,
        # a newer checkpoint may have pruned the referenced snapshot —
        # the fresh pointer then names a live one. Never fall through
        # to replay-from-scratch (commit 0 may be pruned).
        for attempt in range(4):
            try:
                with open(self.last_ckpt_path) as f:
                    ckpt_v = json.load(f)["version"]
            except FileNotFoundError:
                break  # no checkpoint yet: full log is retained
            try:
                with open(
                    os.path.join(
                        self.ckpt_dir, f"{ckpt_v:0{_PAD}d}.state.json"
                    )
                ) as f:
                    state = json.load(f)
                break
            except FileNotFoundError:
                if attempt == 3:
                    raise
                continue
        v = state["version"]
        while True:
            v += 1
            try:
                with open(self._commit_path(v)) as f:
                    commit = json.load(f)
            except FileNotFoundError:
                break
            _apply(state, commit["actions"])
            state["version"] = v
        return state

    def _maybe_checkpoint(self, state: dict) -> None:
        v = state["version"]
        if v <= 0 or v % self.CHECKPOINT_INTERVAL != 0:
            return
        os.makedirs(self.ckpt_dir, exist_ok=True)
        base = os.path.join(self.ckpt_dir, f"{v:0{_PAD}d}")
        try:
            prev = -1
            try:
                with open(self.last_ckpt_path) as f:
                    prev = json.load(f)["version"]
            except (FileNotFoundError, ValueError, KeyError):
                pass
            # snapshot is derived data: last-writer-wins tmp+rename is
            # fine (every version-v snapshot has identical content)
            tmp = base + ".state.json.tmp"
            with open(tmp, "w") as f:
                json.dump(state, f)
            os.replace(tmp, base + ".state.json")
            pq.write_table(_splits_arrow(state["splits"]), base + ".splits.parquet")
            tmp = self.last_ckpt_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"version": v}, f)
            os.replace(tmp, self.last_ckpt_path)
            self._prune_log(prev)
        except OSError:
            pass  # checkpoint is an optimization; log remains authoritative

    def _prune_log(self, upto: int) -> None:
        """Retire commits (and snapshots) ≤ the PREVIOUS checkpoint
        version — one-interval retention grace, like Delta's bounded
        log retention: any reader that loaded `_last_checkpoint`
        before this checkpoint landed replays from the previous
        snapshot, whose trailing commits are exactly the retained
        window. Keeps the log listing (and thus ``state_token()`` /
        ``_latest_version()`` on the search hot path) O(interval)
        instead of O(total mutations ever)."""
        if upto < 0:
            return
        for n in os.listdir(self.log_dir):
            if not n.endswith(".json"):
                continue
            try:
                ver = int(n[: -len(".json")])
            except ValueError:
                continue
            if ver <= upto:
                try:
                    os.unlink(os.path.join(self.log_dir, n))
                except OSError:
                    pass
        try:
            names = os.listdir(self.ckpt_dir)
        except FileNotFoundError:
            return
        for n in names:
            stem = n.split(".", 1)[0]
            try:
                ver = int(stem)
            except ValueError:
                continue
            if ver < upto:  # keep previous + current snapshots
                try:
                    os.unlink(os.path.join(self.ckpt_dir, n))
                except OSError:
                    pass

    def _mutate(self, prepare: Callable[[dict], list[dict]]) -> None:
        """Optimistic-concurrency loop: load fresh state, validate and
        build the action delta against it, CAS-commit at version+1;
        on conflict, reload and re-validate. ``prepare`` must raise if
        the mutation is no longer valid against the fresh state."""
        for _ in range(self.MUTATION_RETRIES):
            state = self._load_state()
            if state["version"] < 0:
                raise FileNotFoundError(
                    f"no metastore at {self.meta_dir} (create() first)"
                )
            actions = prepare(state)
            if not actions:  # validated no-op: don't burn a version
                return
            v = state["version"] + 1
            try:
                self._put_if_absent(
                    self._commit_path(v),
                    {"version": v, "ts": time.time(), "actions": actions},
                )
            except CommitConflict:
                continue
            _apply(state, actions)
            state["version"] = v
            self._maybe_checkpoint(state)
            return
        raise RuntimeError(
            f"metastore commit contention: {self.MUTATION_RETRIES} CAS "
            f"retries exhausted at {self.log_dir}"
        )

    # -- creation / load ---------------------------------------------------
    def create(self, config: IndexConfig) -> None:
        if self.exists():  # commit 0 may have been pruned — check state
            raise FileExistsError(self.meta_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        try:
            self._put_if_absent(
                self._commit_path(0),
                {
                    "version": 0,
                    "ts": time.time(),
                    "actions": [{"configure": config.to_dict()}],
                },
            )
        except CommitConflict:
            raise FileExistsError(self._commit_path(0))

    def exists(self) -> bool:
        # any retained commit or a checkpoint pointer means the index
        # exists (commit 0 itself may have been pruned past retention)
        return (
            os.path.exists(self.last_ckpt_path)
            or self._latest_version() >= 0
        )

    def state_token(self) -> Any:
        """Changes whenever any split mutation lands (Searcher cache
        invalidation). The latest commit version IS the token."""
        return self._latest_version()

    # -- views ---------------------------------------------------------
    def config(self) -> IndexConfig:
        return IndexConfig.from_dict(self._load_state()["config"])

    def splits(
        self, states: tuple[str, ...] | None = None
    ) -> list[SplitMetadata]:
        out = [
            SplitMetadata.from_dict(s) for s in self._load_state()["splits"]
        ]
        if states is not None:
            out = [s for s in out if s.state in states]
        return out

    def list_published(self) -> list[SplitMetadata]:
        return self.splits((PUBLISHED,))

    def checkpoint(self, source_id: str) -> dict[str, str]:
        return dict(self._load_state()["checkpoints"].get(source_id, {}))

    def splits_table_path(self) -> str | None:
        """Path of the latest Spark-readable splits parquet, if a
        checkpoint has been cut yet."""
        try:
            with open(self.last_ckpt_path) as f:
                v = json.load(f)["version"]
        except FileNotFoundError:
            return None
        return os.path.join(self.ckpt_dir, f"{v:0{_PAD}d}.splits.parquet")

    # -- mutations (optimistic concurrency via version CAS) -------------
    def allocate_split_ids(self, n: int) -> list[str]:
        """Reserve ``n`` contiguous split ids through the commit CAS —
        concurrent build/merge/demux writers each get a disjoint id
        block (the serialization PostgreSQL transactions give the
        reference); ids of runs that crash before staging are burnt."""
        if n <= 0:
            raise ValueError("n must be positive")
        got: dict[str, int] = {}

        def prepare(state: dict) -> list[dict]:
            got["base"] = _next_id(state)  # re-computed on CAS retry
            return [{"alloc": n}]

        self._mutate(prepare)
        return [str(got["base"] + i) for i in range(n)]

    def stage_splits(self, metas: list[SplitMetadata]) -> None:
        """Same semantics as the file-backed metastore: re-staging a
        leftover Staged split supersedes it (crash-resume path);
        colliding with Published/MarkedForDeletion raises."""

        def prepare(state: dict) -> list[dict]:
            by_id = {s["split_id"]: s for s in state["splits"]}
            now = time.time()
            actions = []
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
                actions.append({"stage": meta.to_dict()})
            return actions

        self._mutate(prepare)

    def publish_splits(
        self,
        split_ids: list[str],
        source_id: str | None = None,
        checkpoint_delta: dict[str, str] | None = None,
        replaced_split_ids: list[str] | None = None,
    ) -> None:
        def prepare(state: dict) -> list[dict]:
            by_id = {s["split_id"]: s for s in state["splits"]}
            for sid in split_ids:
                if sid not in by_id:
                    raise KeyError(f"unknown split {sid}")
            now = time.time()
            actions: list[dict] = []
            if checkpoint_delta:
                src = source_id or "default"
                cp = state["checkpoints"].get(src, {})
                for part, pos in checkpoint_delta.items():
                    prev = cp.get(part)
                    if prev is not None and str(pos) <= str(prev):
                        raise CheckpointError(
                            f"partition {part}: position {pos!r} does not "
                            f"advance {prev!r}"
                        )
                    actions.append(
                        {
                            "checkpoint": {
                                "source_id": src,
                                "partition": part,
                                "position": str(pos),
                            }
                        }
                    )
            actions += [{"publish": sid, "ts": now} for sid in split_ids]
            actions += [
                {"replace": sid, "ts": now}
                for sid in (replaced_split_ids or [])
            ]
            return actions

        self._mutate(prepare)

    def mark_for_deletion(self, split_ids: list[str]) -> None:
        def prepare(state: dict) -> list[dict]:
            now = time.time()
            present = {s["split_id"] for s in state["splits"]}
            return [
                {"mark": sid, "ts": now}
                for sid in split_ids
                if sid in present
            ]

        self._mutate(prepare)

    def delete_splits(self, split_ids: list[str]) -> None:
        def prepare(state: dict) -> list[dict]:
            by_id = {s["split_id"]: s for s in state["splits"]}
            for sid in split_ids:
                s = by_id.get(sid)
                if s is not None and s["state"] != MARKED_FOR_DELETION:
                    raise ValueError(
                        f"split {sid} not MarkedForDeletion"
                    )
            return [{"remove": sid} for sid in split_ids if sid in by_id]

        self._mutate(prepare)

    # -- data paths (same layout as the file-backed metastore) ----------
    def postings_dir(self) -> str:
        return os.path.join(self.index_dir, "postings")

    def docmap_dir(self) -> str:
        return os.path.join(self.index_dir, "docmap")

    def split_postings_dir(self, split_id: str) -> str:
        return os.path.join(self.postings_dir(), f"split_id={split_id}")

    def split_docmap_dir(self, split_id: str) -> str:
        return os.path.join(self.docmap_dir(), f"split_id={split_id}")
