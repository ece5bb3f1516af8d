"""doc_from_json — the DocMapper's parse stage as DataFrame ops.

Reference semantics (quickwit-doc-mapper/src/default_doc_mapper/
default_mapper.rs:405-432; indexer counters indexer.rs:142-175:
``parse_errors`` / ``missing_fields`` / ``valid``; SURVEY.md §2.2):

- a document is one JSON object per line; undeclared fields are
  IGNORED; ``null``/missing values are silently dropped
  (docs/reference/index-config.md:238-244) — except declared
  REQUIRED fields (our analogue of required fast fields,
  default_mapper.rs:370-384) whose absence rejects the doc;
- unparseable JSON rejects the doc (counted, not fatal);
- nested objects are addressed by '.'-joined paths and flattened to
  one column per leaf (field_mapping_entry.rs:440-469 — tantivy has
  no dots in names, we keep the flat ``a.b`` column name);
- per-type coercions follow field_mapping_entry.rs:124-437: strict
  RFC-3339 → timestamp for ``date``, base64 → binary for ``bytes``,
  numeric guards for i64/u64/f64.

Spark shape: ``from_json`` with a struct schema built from the
declared mapping (undeclared fields drop for free — schema
projection), then per-type casts; counters come from ONE aggregation
over the parse-status column, not accumulators (deterministic under
retries, which accumulators are not).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# Quickwit field types (field_mapping_type.rs:27-42) → Spark types
_TYPE_MAP = {
    "text": T.StringType(),
    "i64": T.LongType(),
    "u64": T.LongType(),  # guard >= 0 applied post-parse
    "f64": T.DoubleType(),
    "date": T.StringType(),  # strict RFC-3339, parsed post-hoc
    "bytes": T.StringType(),  # base64, decoded post-hoc
}


@dataclass(frozen=True)
class JsonField:
    """One declared mapping entry. ``path`` uses '.' for nesting."""

    path: str
    type: str = "text"
    required: bool = False
    multi: bool = False  # array<T> (Cardinality::MultiValues)

    def __post_init__(self) -> None:
        if self.type not in _TYPE_MAP:
            raise ValueError(f"unknown field type {self.type!r}")


@dataclass
class ParseCounters:
    valid: int = 0
    parse_errors: int = 0
    missing_required: int = 0


def _nest_schema(fields: list[JsonField]) -> T.StructType:
    """Build the (possibly nested) struct schema from dotted paths."""
    tree: dict = {}
    for f in fields:
        node = tree
        parts = f.path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = _TYPE_MAP[f.type]
        node[parts[-1]] = T.ArrayType(leaf) if f.multi else leaf

    def build(node: dict) -> T.StructType:
        out = []
        for name, v in node.items():
            if isinstance(v, dict):
                out.append(T.StructField(name, build(v), True))
            else:
                out.append(T.StructField(name, v, True))
        return T.StructType(out)

    return build(tree)


def _coerced_col(f: JsonField):
    """Leaf accessor (struct traversal) + per-type coercion — the
    value AFTER type rules applied (used both for output columns and
    the required-field validity check, so a declared-required field
    whose value fails coercion rejects the doc like the reference's
    typed-value parse errors, field_mapping_entry.rs:124-437)."""
    col = F.col("__doc")
    for p in f.path.split("."):
        col = col.getField(p)
    if f.type == "date":
        # strict RFC-3339 → UTC (field_mapping_entry.rs:319-361)
        coerce = lambda c: F.to_timestamp(  # noqa: E731
            F.regexp_replace(c, r"Z$", "+00:00"),
            "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX",
        )
    elif f.type == "bytes":
        coerce = F.unbase64  # field_mapping_entry.rs:363-403
    elif f.type == "u64":
        coerce = lambda c: F.when(c >= 0, c)  # noqa: E731  (reject <0 → null)
    else:
        coerce = lambda c: c  # noqa: E731
    if f.multi:
        return F.transform(col, coerce)
    return coerce(col)


def _flat_col(f: JsonField):
    """Coerced leaf aliased to the flattened '.'-joined name."""
    return _coerced_col(f).alias(f.path)


def doc_from_json(
    lines: DataFrame,
    fields: list[JsonField],
    json_col: str = "value",
    keep_source: bool = False,
) -> tuple[DataFrame, ParseCounters]:
    """Parse a DataFrame of JSON lines into typed, flattened columns.

    Returns ``(docs, counters)`` where ``docs`` has one column per
    declared field (named by its dotted path) and only VALID rows,
    and ``counters`` mirrors the reference indexer's counts.

    ``keep_source=True`` additionally carries the ORIGINAL json line
    verbatim as a ``_source`` column — the DocMapper's
    ``store_source`` (default_mapper.rs:47,162-167). ``build_index``
    stores it in the docmap when the index config opts in.
    """
    schema = _nest_schema(fields).add("_corrupt", T.StringType())
    parsed = lines.select(
        F.col(json_col).alias("__raw"),
        F.from_json(
            F.col(json_col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("__doc"),
    )
    required = [f for f in fields if f.required]
    is_parse_error = F.col("__doc").isNull() | F.col("__doc").getField(
        "_corrupt"
    ).isNotNull()
    # coercions apply BEFORE the required check: a required field
    # whose raw value is present but fails its type rule (negative
    # u64, non-RFC-3339 date, bad base64) rejects the doc (ADVICE r1)
    missing_req = F.lit(False)
    for f in required:
        missing_req = missing_req | _coerced_col(f).isNull()
    status = (
        F.when(is_parse_error, F.lit("parse_error"))
        .when(F.col("__doc").isNotNull() & missing_req, F.lit("missing_required"))
        .otherwise(F.lit("valid"))
    )
    with_status = parsed.withColumn("__status", status)
    counts = {
        r["__status"]: r["n"]
        for r in with_status.groupBy("__status").agg(F.count("*").alias("n")).collect()
    }
    counters = ParseCounters(
        valid=counts.get("valid", 0),
        parse_errors=counts.get("parse_error", 0),
        missing_required=counts.get("missing_required", 0),
    )
    out_cols = [_flat_col(f) for f in fields]
    if keep_source:
        out_cols.append(F.col("__raw").alias("_source"))
    docs = (
        with_status.filter(F.col("__status") == "valid")
        .select(*out_cols)
    )
    return docs, counters
