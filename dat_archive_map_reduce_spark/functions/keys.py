"""Typed compound-key encoding and range predicates.

The reference stores keys as ``JSON.stringify(key)`` bytes in LevelDB, so
range scans order compound keys as *text* — numbers inside compound keys
sort lexicographically ("100" < "2"), a quirk its own tests avoid
asserting (/root/reference/test/compound-keys.js:117,130-137; key encoding
at lib/view.js:37, scan at lib/util-level.js:76-84).

This engine deliberately uses **typed multi-column ordering** instead
(documented deviation, SURVEY.md §1.2): a key is a Spark struct
``key: struct<k0, k1, ...>`` whose fields carry real types, so
``ORDER BY key`` is component-wise typed comparison — what the
reference's README timestamp-range examples actually intend, and what an
ANSI-SQL oracle computes. A canonical ``key_json`` string is kept
alongside for point-lookup equality and multimap grouping.

Struct comparison in Spark is lexicographic by field order, so the
range bounds gt/gte/lt/lte of the reference's ``list()``
(/root/reference/index.js:122-125) translate directly to
``col("key") > struct(lit(v0), lit(v1), ...)`` — one predicate that
Catalyst can push into the scan on the leading field.
"""

from __future__ import annotations

import json
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Key components may be strings, numbers, or booleans (JSON scalars);
# the reference's README uses strings and epoch-millis numbers.
_PY_TO_SPARK = {
    str: T.StringType(),
    int: T.LongType(),
    float: T.DoubleType(),
    bool: T.BooleanType(),
}


def normalize_key(key: Any) -> tuple:
    """A user key (scalar or list) -> tuple of components."""
    if isinstance(key, (list, tuple)):
        return tuple(key)
    return (key,)


def key_json(key: Any) -> str:
    """Canonical JSON for a key — compact separators, preserved order.

    Scalar keys serialize as the bare scalar (like JSON.stringify),
    compound keys as a JSON array.
    """
    if isinstance(key, tuple):
        key = list(key)
    return json.dumps(key, separators=(",", ":"), ensure_ascii=False)


def key_field_type(example: Any) -> T.DataType:
    t = _PY_TO_SPARK.get(type(example))
    if t is None:
        raise TypeError(f"unsupported key component type: {type(example).__name__}")
    return t


def key_struct_type(n_components: int, types: Sequence[T.DataType] | None = None) -> T.StructType:
    """Struct type for an n-component key. Defaults every field to string."""
    fields = []
    for i in range(n_components):
        dt = types[i] if types is not None else T.StringType()
        fields.append(T.StructField(f"k{i}", dt, True))
    return T.StructType(fields)


def key_bound_expr(key_col: Column, bound: Any, types: Sequence[T.DataType]) -> Column:
    """Literal struct for comparing against the key column.

    Partial bounds (fewer components than the key) are allowed, matching
    level-style prefix ranges: we compare only the leading components.
    """
    comps = normalize_key(bound)
    lits = [F.lit(c).cast(types[i]) for i, c in enumerate(comps)]
    return F.struct(*[l.alias(f"k{i}") for i, l in enumerate(lits)])


def prefix_key_col(key_col_name: str, n: int) -> Column:
    """First n components of the key as a struct, for prefix-bound compares."""
    return F.struct(*[F.col(f"{key_col_name}.k{i}").alias(f"k{i}") for i in range(n)])


def range_predicate(
    key_col_name: str,
    types: Sequence[T.DataType],
    gt: Any = None,
    gte: Any = None,
    lt: Any = None,
    lte: Any = None,
) -> Column | None:
    """Translate the reference's {gt,gte,lt,lte} list() options into one
    Column predicate over the typed key struct
    (reference semantics: /root/reference/lib/util-level.js:76-84)."""
    import operator as _op

    ops = ((gt, _op.gt), (gte, _op.ge), (lt, _op.lt), (lte, _op.le))
    preds: list[Column] = []
    for bound, fn in ops:
        if bound is None:
            continue
        comps = normalize_key(bound)
        cmp_col = prefix_key_col(key_col_name, len(comps))
        lit_struct = key_bound_expr(F.col(key_col_name), bound, types)
        preds.append(fn(cmp_col, lit_struct))
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out
