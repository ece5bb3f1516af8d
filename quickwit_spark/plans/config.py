"""Index configuration — the engine's analogue of the reference's
DocMapper + IndexConfig.

Mirrors the declared-schema model (SURVEY.md §1.1): a fixed set of
field mappings with per-field ``tokenizer`` ∈ {raw, default, stem_en}
and ``record`` ∈ {basic, freq, position}
(reference: quickwit-doc-mapper field_mapping_entry.rs:476-494,
docs/reference/index-config.md:118-141), ``default_search_fields``,
a timestamp field used for split pruning
(default_mapper.rs:206-243), and tag fields for tag pruning
(packager.rs:200-247). Engineering defaults follow the reference:
``split_num_docs_target`` 10M docs (index_config.rs:161-163), merge
factor 10 (index_config.rs:99-110).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

FIELD_NAME_RE = re.compile(r"^[_a-zA-Z][_\.\-a-zA-Z0-9]{0,254}$")

RECORD_BASIC = "basic"
RECORD_FREQ = "freq"
RECORD_POSITION = "position"


@dataclass(frozen=True)
class FieldConfig:
    """One indexed text field."""

    name: str
    tokenizer: str = "default"  # raw | default | stem_en
    record: str = RECORD_FREQ  # basic | freq | position
    indexed: bool = True

    def __post_init__(self) -> None:
        if not FIELD_NAME_RE.match(self.name):
            raise ValueError(f"invalid field name {self.name!r}")
        if self.tokenizer not in ("raw", "default", "stem_en"):
            raise ValueError(f"unknown tokenizer {self.tokenizer!r}")
        if self.record not in (RECORD_BASIC, RECORD_FREQ, RECORD_POSITION):
            raise ValueError(f"unknown record option {self.record!r}")


@dataclass(frozen=True)
class IndexConfig:
    """Schema + behavior of one index."""

    fields: tuple[FieldConfig, ...]
    key_field: str = "url"  # unique doc key (doc-id assignment order)
    default_search_fields: tuple[str, ...] = ()
    timestamp_field: str | None = None  # split time_range pruning
    tag_fields: tuple[str, ...] = ()  # split tag pruning
    fast_fields: tuple[str, ...] = ()  # columnar doc values
    # index sorting (IndexSettings.sort_by_field, indexer.rs:99-103):
    # doc ids within a split follow (sort_by_field, key) order, so
    # e.g. a time-sorted index gets row-group min/max pruning on the
    # docmap and a monotone ts fast-field blob
    sort_by_field: str | None = None
    # opt-in stored original document (default_mapper.rs:47,162-167
    # `store_source`): the raw JSON line (doc_from_json sources) or a
    # canonical JSON of the input row (table sources) rides the docmap
    # as a `_source` column and is returned by fetch_docs / CLI search
    store_source: bool = False
    # metastore backend laid down at create(): "file" — single-writer
    # JSON manifest (default); "table" — multi-writer commit log with
    # optimistic concurrency + Spark-readable splits table, the
    # reference's PostgreSQL-metastore analogue
    # (quickwit-metastore/src/metastore/postgresql_metastore.rs)
    metastore_backend: str = "file"
    split_num_docs_target: int = 10_000_000
    merge_factor: int = 10
    max_merge_factor: int = 12
    min_level_num_docs: int = 100_000
    tag_cardinality_limit: int = 1000  # packager.rs:36-40

    def field(self, name: str) -> FieldConfig:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(f"field {name!r} not declared")

    @property
    def indexed_fields(self) -> tuple[FieldConfig, ...]:
        return tuple(f for f in self.fields if f.indexed)

    def to_dict(self) -> dict:
        return {
            "fields": [vars(f).copy() for f in self.fields],
            "key_field": self.key_field,
            "default_search_fields": list(self.default_search_fields),
            "timestamp_field": self.timestamp_field,
            "tag_fields": list(self.tag_fields),
            "fast_fields": list(self.fast_fields),
            "sort_by_field": self.sort_by_field,
            "store_source": self.store_source,
            "metastore_backend": self.metastore_backend,
            "split_num_docs_target": self.split_num_docs_target,
            "merge_factor": self.merge_factor,
            "max_merge_factor": self.max_merge_factor,
            "min_level_num_docs": self.min_level_num_docs,
            "tag_cardinality_limit": self.tag_cardinality_limit,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "IndexConfig":
        return cls(
            fields=tuple(FieldConfig(**f) for f in d["fields"]),
            key_field=d["key_field"],
            default_search_fields=tuple(d["default_search_fields"]),
            timestamp_field=d.get("timestamp_field"),
            tag_fields=tuple(d.get("tag_fields", ())),
            fast_fields=tuple(d.get("fast_fields", ())),
            sort_by_field=d.get("sort_by_field"),
            store_source=d.get("store_source", False),
            metastore_backend=d.get("metastore_backend", "file"),
            split_num_docs_target=d.get("split_num_docs_target", 10_000_000),
            merge_factor=d.get("merge_factor", 10),
            max_merge_factor=d.get("max_merge_factor", 12),
            min_level_num_docs=d.get("min_level_num_docs", 100_000),
            tag_cardinality_limit=d.get("tag_cardinality_limit", 1000),
        )


def webpages_config(**overrides) -> IndexConfig:
    """Config for the mandated web-page input table."""
    defaults = dict(
        fields=(
            FieldConfig("text", tokenizer="default", record=RECORD_POSITION),
            FieldConfig("lang", tokenizer="raw", record=RECORD_BASIC),
            FieldConfig("url", tokenizer="raw", record=RECORD_BASIC),
        ),
        key_field="url",
        default_search_fields=("text",),
        timestamp_field="warc_ts",
        tag_fields=("lang",),
        fast_fields=("warc_ts", "lang"),
    )
    defaults.update(overrides)
    return IndexConfig(**defaults)
