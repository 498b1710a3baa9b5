"""Typed conversion with error capture (the importConversion analog).

Real binlog/WAL payloads arrive as strings/JSON; this layer turns a
declarative field list into typed columns with per-field failure
policy, entirely inside whole-stage codegen (no Python):

- every field becomes one ``try_cast`` / ``try_to_timestamp`` Column
  (ANSI-safe: null on failure instead of a task abort),
- the failure predicate is "source non-null AND cast null",
- a field with a declared ``default`` absorbs failures silently
  (string2int-with-default semantics),
- a field without a default contributes ``cast:<field>`` to the
  ``_errors`` array column, which the CDC quarantine routes on
  (exportException semantics).

Reference behavior studied (not ported): giraffe-etl
ProcessingNetworkGenerator.java:539-573 (generated typed casts,
conversion failure -> error record), DefaultConversions.java:35-112
(string2int with default, string2date with explicit pattern),
ConversionManager.java:316-335 (plan-time failure for unknown
conversions).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

# the (src, dst) pairs the layer knows how to build — the @Conversion
# registry analog; asking for anything else fails at PLAN time, like
# ConversionManager's unknown-conversion error
_CASTABLE = {
    "tinyint", "smallint", "int", "bigint", "long", "float", "double",
    "decimal", "boolean", "string", "binary", "date", "timestamp",
}


@dataclass(frozen=True)
class FieldSpec:
    """One declared output field of the conversion layer.

    ``name``: output column; ``dtype``: spark SQL type; ``source``:
    input column (defaults to ``name``); ``default``: value absorbed on
    conversion failure (None = failures are captured as errors);
    ``fmt``: explicit datetime pattern for date/timestamp fields.
    """

    name: str
    dtype: str
    source: str | None = None
    default: object = None
    fmt: str | None = None


def _converted(src: Column, spec: FieldSpec) -> Column:
    base = spec.dtype.split("(")[0].lower()
    if base not in _CASTABLE:
        raise ValueError(f"no conversion to type {spec.dtype!r} (field {spec.name})")
    if base in ("timestamp", "date") and spec.fmt:
        c = F.try_to_timestamp(src, F.lit(spec.fmt))
        return c.cast("date") if base == "date" else c
    return src.try_cast(spec.dtype)


def convert_typed(
    df: DataFrame, specs: list[FieldSpec], keep: tuple[str, ...] = ()
) -> DataFrame:
    """Apply the declared conversions; returns typed columns + ``_errors``.

    ``keep``: passthrough columns copied as-is in front of the typed
    fields.  ``_errors`` is an (possibly empty) array of
    ``cast:<field>`` markers in spec order.
    """
    cols, errs = [], []
    for spec in specs:
        src = F.col(spec.source or spec.name)
        c = _converted(src, spec)
        failed = src.isNotNull() & c.isNull()
        if spec.default is not None:
            c = F.when(failed, F.lit(spec.default).cast(spec.dtype)).otherwise(c)
        else:
            errs.append(F.when(failed, F.lit(f"cast:{spec.name}")))
        cols.append(c.alias(spec.name))
    err_arr = (
        F.array_compact(F.array(*errs))
        if errs
        else F.array().cast("array<string>")
    )
    return df.select(
        *[F.col(k) for k in keep], *cols, err_arr.alias("_errors")
    )


def split_conversion_errors(converted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route rows with any conversion error to the dead-letter side."""
    ok = converted.filter(F.size("_errors") == 0).drop("_errors")
    bad = converted.filter(F.size("_errors") > 0)
    return ok, bad
