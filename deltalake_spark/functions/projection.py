"""Mongo-style projections → DataFrame ``select`` / ``drop``.

Parity target: ``applyProjection`` in the reference
(/root/reference/src/query/index.ts:768-930): list form ``['a','b']``,
inclusion ``{a:1}``, exclusion ``{pwd:0}``, nested dot paths. The
reference clones documents and deletes keys row-by-row; we emit a single
``select``/``drop`` so Catalyst prunes columns all the way into the
Parquet scan (``ReadSchema``) — the reference tracked projection columns
for pruning but never wired them in (src/query/index.ts:939-960).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from deltalake_spark.errors import InvalidProjectionError


def _normalize(projection: Any) -> tuple[list[str], list[str]]:
    """Return (include_paths, exclude_paths). Exactly one list is non-empty.

    Mirrors normalizeProjection (src/query/index.ts:728-750): a list means
    inclusion; a mapping must be all-truthy (inclusion) or all-falsy
    (exclusion) — mixing raises.
    """
    if isinstance(projection, (list, tuple)):
        return [str(p) for p in projection], []
    if isinstance(projection, Mapping):
        includes = [k for k, v in projection.items() if v]
        excludes = [k for k, v in projection.items() if not v]
        if includes and excludes:
            raise InvalidProjectionError(
                "Cannot mix inclusion and exclusion in one projection"
            )
        return includes, excludes
    raise InvalidProjectionError(
        f"Projection must be a list or mapping, got {type(projection)}"
    )


def apply_projection(df: DataFrame, projection: Any | None) -> DataFrame:
    """Apply an inclusion/exclusion projection to a DataFrame."""
    if projection is None:
        return df
    includes, excludes = _normalize(projection)

    if includes:
        cols: list[Column] = []
        for path in includes:
            if "." in path:
                # nested inclusion: keep the leaf under its dotted alias,
                # matching the reference's nested-path reconstruction
                cols.append(F.col(path).alias(path))
            else:
                cols.append(F.col(path))
        return df.select(*cols)

    if excludes:
        top = [p for p in excludes if "." not in p]
        nested = [p for p in excludes if "." in p]
        # a path under an excluded ancestor is already gone — deleting it
        # again would reference a missing field (reference deleteNested is
        # a no-op for absent parents, src/query/index.ts:856-884)
        ancestors = set(excludes)
        nested = [
            p for p in nested
            if not any(p != q and p.startswith(q + ".") for q in ancestors)
        ]
        out = df.drop(*top) if top else df
        by_root: dict[str, list[str]] = {}
        for path in nested:
            root, rest = path.split(".", 1)
            by_root.setdefault(root, []).append(rest)
        schema = {f.name: f.dataType for f in out.schema.fields}
        for root, rests in by_root.items():
            dtype = schema.get(root)
            if not isinstance(dtype, StructType):
                # missing column or path into a scalar: reference
                # deleteNested no-ops (src/query/index.ts:856-884)
                continue
            out = out.withColumn(
                root, _rebuild_excluding(F.col(root), dtype, _path_tree(rests))
            )
        return out

    return df


def _path_tree(paths: Sequence[str]) -> dict[str, Any]:
    """Dotted paths → nested dict; a ``None`` leaf means "remove field"."""
    tree: dict[str, Any] = {}
    for p in paths:
        segs = p.split(".")
        cur = tree
        dead = False
        for s in segs[:-1]:
            if s in cur and cur[s] is None:  # ancestor already fully excluded
                dead = True
                break
            cur = cur.setdefault(s, {})
        if not dead:
            cur[segs[-1]] = None
    return tree


def _rebuild_excluding(col: Column, dtype: StructType,
                       tree: Mapping[str, Any]) -> Column:
    """Rebuild a struct column minus the excluded paths.

    Unlike chained ``dropFields`` this survives exclusions that cover every
    field of a struct: the reference's row-wise delete leaves an empty
    object (src/query/index.ts:856-884), so we emit a zero-field struct
    rather than tripping Spark's CANNOT_DROP_ALL_FIELDS. Null structs stay
    null (the reference's deleteNested no-ops on absent parents).
    """
    fields: list[Column] = []
    for f in dtype.fields:
        if f.name in tree:
            sub = tree[f.name]
            if sub is None:
                continue  # fully excluded
            if isinstance(f.dataType, StructType):
                fields.append(
                    _rebuild_excluding(col.getField(f.name), f.dataType, sub)
                    .alias(f.name)
                )
            else:
                # exclusion descends into a scalar: no-op, keep the field
                fields.append(col.getField(f.name).alias(f.name))
        else:
            fields.append(col.getField(f.name).alias(f.name))
    rebuilt = F.struct(*fields) if fields else F.struct()
    return F.when(col.isNotNull(), rebuilt)


def projection_columns(projection: Any | None) -> list[str] | None:
    """Top-level column names an inclusion projection touches (for tests;
    Catalyst performs the actual pruning). Mirrors getProjectionColumns
    (src/query/index.ts:939-960)."""
    if projection is None:
        return None
    includes, _ = _normalize(projection)
    if not includes:
        return None
    return sorted({p.split(".", 1)[0] for p in includes})
