"""Schema-evolution policies: strict / add_new_columns / coerce / type_widen (+ rescue).

Parity: ``SchemaEvolution`` / ``apply_schema`` / widening lattice
(reference: src/polars_incremental/schema.py:13-551).  Spark is always lazy,
so one implementation covers both of the reference's eager and lazy paths
(schema.py:286-495).  Schemas persist as ``StructType.json()`` strings in
checkpoint metadata — no hand-rolled dtype-string parser is needed
(reference schema.py:24-151 exists only because Polars lacks one).

Non-strict casting uses ``try_cast`` (failed casts → null, matching Polars
``cast(strict=False)``) and stays entirely inside Catalyst/codegen — the
whole transform is column expressions, no Python in the row path.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .errors import SchemaEvolutionError

MODES = ("strict", "add_new_columns", "coerce", "type_widen")
RESCUE_MODES = ("none", "column")

_INT_ORDER = {T.ByteType(): 0, T.ShortType(): 1, T.IntegerType(): 2, T.LongType(): 3}
_FLOAT_ORDER = {T.FloatType(): 0, T.DoubleType(): 1}
_STRINGABLE = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.BooleanType,
    T.StringType,
    T.DecimalType,
)


def widen_types(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least-upper-bound of two Spark types under the reference's lattice.

    Mirrors reference schema.py:154-243: ints widen to the wider int, floats
    to the wider float, int×float → Double, bool×int → that int, bool×float →
    Double, and anything stringable × String → String.  Unrelated types raise.
    """
    if a == b:
        return a
    a_int, b_int = a in _INT_ORDER, b in _INT_ORDER
    a_float, b_float = a in _FLOAT_ORDER, b in _FLOAT_ORDER
    a_bool, b_bool = isinstance(a, T.BooleanType), isinstance(b, T.BooleanType)
    a_str, b_str = isinstance(a, T.StringType), isinstance(b, T.StringType)
    if a_int and b_int:
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    if a_float and b_float:
        return a if _FLOAT_ORDER[a] >= _FLOAT_ORDER[b] else b
    if (a_int and b_float) or (a_float and b_int):
        return T.DoubleType()
    if a_bool and (b_int or b_float):
        return b
    if b_bool and (a_int or a_float):
        return a
    if (a_str and isinstance(b, _STRINGABLE)) or (b_str and isinstance(a, _STRINGABLE)):
        return T.StringType()
    raise SchemaEvolutionError(f"cannot widen {a.simpleString()} × {b.simpleString()}")


def schema_to_json(schema: T.StructType) -> str:
    return schema.json()

def schema_from_json(payload: str) -> T.StructType:
    return T.StructType.fromJson(json.loads(payload))


@dataclass(frozen=True)
class SchemaEvolution:
    """Policy config; ``apply`` evolves one batch against the persisted schema."""

    mode: str = "add_new_columns"
    rescue_mode: str = "none"
    rescue_column: str = "_rescued"
    schema: T.StructType | str | None = None  # explicit schema wins over stored/inferred

    def __post_init__(self) -> None:
        if self.mode not in MODES:
            raise SchemaEvolutionError(f"unknown mode {self.mode!r}; expected one of {MODES}")
        if self.rescue_mode not in RESCUE_MODES:
            raise SchemaEvolutionError(
                f"unknown rescue_mode {self.rescue_mode!r}; expected one of {RESCUE_MODES}"
            )

    @classmethod
    def from_options(cls, options: dict) -> "SchemaEvolution":
        return cls(
            mode=options.get("mode", "add_new_columns"),
            rescue_mode=options.get("rescue_mode", "none"),
            rescue_column=options.get("rescue_column", "_rescued"),
            schema=options.get("schema"),
        )

    def explicit_schema(self) -> T.StructType | None:
        if self.schema is None:
            return None
        if isinstance(self.schema, T.StructType):
            return self.schema
        return T.StructType.fromDDL(self.schema)

    # -------------------------------------------------------------- apply
    def apply(self, df: DataFrame, checkpoint=None) -> DataFrame:
        """Evolve ``df`` to the target schema; persist schema changes if given a checkpoint.

        Precedence: explicit schema > checkpoint-stored schema > batch schema
        (reference schema.py:286-298).
        """
        target = self.explicit_schema()
        stored_json = checkpoint.get_schema() if checkpoint is not None else None
        if target is None and stored_json:
            target = schema_from_json(stored_json)
        if target is None:
            # first batch defines the schema
            if checkpoint is not None:
                checkpoint.set_schema(schema_to_json(df.schema))
            return df

        result, final_schema = apply_schema(
            df,
            target,
            mode=self.mode,
            rescue_mode=self.rescue_mode,
            rescue_column=self.rescue_column,
        )
        if checkpoint is not None and self.schema is None:
            new_json = schema_to_json(final_schema)
            if new_json != stored_json:
                checkpoint.set_schema(new_json)
        return result


def apply_schema(
    df: DataFrame,
    target: T.StructType,
    *,
    mode: str = "add_new_columns",
    rescue_mode: str = "none",
    rescue_column: str = "_rescued",
) -> tuple[DataFrame, T.StructType]:
    """Core evolution transform; returns (evolved df, possibly-widened schema)."""
    batch_fields = {f.name: f for f in df.schema.fields}
    target_fields = {f.name: f for f in target.fields}

    new_cols = [n for n in batch_fields if n not in target_fields]
    if new_cols and mode == "strict":
        raise SchemaEvolutionError(f"strict mode rejects new columns: {sorted(new_cols)}")
    if mode == "strict":
        missing = [f.name for f in target.fields if f.name not in batch_fields]
        if missing:
            raise SchemaEvolutionError(
                f"strict mode rejects missing columns: {sorted(missing)}"
            )

    # resolve the output schema field list (target order, then appended new cols)
    out_fields: list[T.StructField] = []
    for f in target.fields:
        if mode == "type_widen" and f.name in batch_fields:
            widened = widen_types(f.dataType, batch_fields[f.name].dataType)
            out_fields.append(T.StructField(f.name, widened, True))
        else:
            out_fields.append(T.StructField(f.name, f.dataType, True))
    if mode in ("add_new_columns", "coerce", "type_widen"):
        for name in new_cols:
            out_fields.append(T.StructField(name, batch_fields[name].dataType, True))
    final_schema = T.StructType(out_fields)

    exprs = []
    rescued_entries = []
    for f in final_schema.fields:
        if f.name not in batch_fields:
            exprs.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        src_type = batch_fields[f.name].dataType
        if src_type == f.dataType:
            exprs.append(F.col(f.name))
            continue
        if mode in ("strict", "add_new_columns"):
            # only coerce may lossy-cast; type_widen got here with a widened
            # (lossless) target.  Silently try_cast-ing in the default mode
            # turns unparseable values into NULLs (reference schema.py:354-357
            # raises for every mode except coerce).
            raise SchemaEvolutionError(
                f"{mode} mode rejects type change on {f.name!r}: "
                f"{f.dataType.simpleString()} -> {src_type.simpleString()}"
            )
        casted = F.col(f.name).try_cast(f.dataType)
        exprs.append(casted.alias(f.name))
        if rescue_mode == "column":
            rescued_entries.append(
                F.when(
                    F.col(f.name).isNotNull() & casted.isNull(),
                    F.col(f.name).cast("string"),
                ).alias(f.name)
            )

    # the rescue struct must be built in the SAME projection so its
    # expressions still see the ORIGINAL (pre-cast) column values
    if rescue_mode == "column" and rescued_entries:
        exprs.append(F.struct(*rescued_entries).alias(rescue_column))
    out = df.select(*exprs)
    return out, final_schema
