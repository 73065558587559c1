"""Wire-record normalization ops (reference T1–T5, SURVEY.md §2.2) —
the per-record transforms the reference applies between fetch and store,
vectorized over Arrow batches.

Reference semantics mirrored exactly:
  * ID backfill: ``if ID == "" then ID = UUID``
    (kafka/fetch_messages.go:71-73) → vectorized if_else.
  * Empty-text admission: reject ``Text == ""``
    (http/client.go:90-97) → batch filter.
  * Typed payload projection: pick configured fields, cast
    string→{string,int,float,bool} with typed ZERO VALUES for
    missing/empty ("", 0, 0.0, false — qdrant/client.go:17-22,
    store.go:53-89); unknown payload keys are dropped (projection =
    declared field list only).
  * Point assembly with DETERMINISTIC ids (fixes non-idempotent
    uuid.New() per point, store.go:32 / TODO store.go:45).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import rules

# the reference's four supported leaf types (qdrant/client.go:10-15)
ZERO_VALUES = {"string": "", "int": 0, "float": 0.0, "bool": False}
_ARROW_TYPES = {
    "string": pa.string(),
    "int": pa.int64(),
    "float": pa.float64(),
    "bool": pa.bool_(),
}


def backfill_id(batch: pa.Table, id_col: str = "id",
                uuid_col: str = "uuid") -> pa.Table:
    """T3: empty/null id ← uuid."""
    idv = pc.fill_null(batch[id_col], "")
    out = pc.if_else(pc.equal(idv, ""), batch[uuid_col], idv)
    return batch.set_column(batch.schema.get_field_index(id_col), id_col, out)


def filter_nonempty(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """T2: the HTTP-source admission rule."""
    t = pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], ""))
    return batch.filter(pc.not_equal(t, ""))


def typed_projection(batch: pa.Table, fields: dict[str, str]) -> pa.Table:
    """T4: project + cast the declared fields; absent/empty → typed zero.

    ``fields``: column → one of string|int|float|bool (the storage-side
    schema the reference declares in config, kafka_config.yaml:39-43).
    Unknown batch columns are dropped; declared-but-missing columns are
    materialized as all-zero columns (the reference's per-record default).
    """
    cols: dict[str, pa.Array] = {}
    n = batch.num_rows
    for name, kind in fields.items():
        if kind not in ZERO_VALUES:
            raise ValueError(f"unsupported field type {kind!r} for {name!r} "
                             f"(have {sorted(ZERO_VALUES)})")
        typ = _ARROW_TYPES[kind]
        zero = ZERO_VALUES[kind]
        if name not in batch.schema.names:
            cols[name] = pa.nulls(n, typ).fill_null(zero)
            continue
        raw = pc.fill_null(pc.cast(batch[name], pa.string()), "")
        empty = pc.equal(pc.utf8_trim_whitespace(raw), "")
        if kind == "string":
            cols[name] = pc.if_else(empty, "", raw).combine_chunks()
        else:
            # strconv-style parse; unparseable values error loudly (the
            # reference returns an error per record, store.go:70-84) —
            # here the whole batch fails fast, surfacing bad data early.
            safe = pc.if_else(empty, None, raw)
            parsed = pc.cast(
                pc.cast(safe, pa.float64()) if kind == "float" else safe, typ
            )
            cols[name] = pc.fill_null(parsed, zero).combine_chunks()
    return pa.table(cols)


def assemble_points(batch: pa.Table, id_cols: tuple[str, ...] = ("id",),
                    out: str = "point_id") -> pa.Table:
    """T5: deterministic point id from the business key(s) — idempotent
    re-writes (answers reference TODO store.go:45)."""
    parts = [batch[c].to_pylist() for c in id_cols]
    ids = [rules.stable_id("pt", *vals) for vals in zip(*parts)]
    return batch.append_column(out, pa.array(ids, pa.string()))
