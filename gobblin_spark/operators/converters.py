"""Converter registry: named, config-selected, chained transforms.

The reference's converter contract is 1→0/1/many record transforms chained
lazily (gobblin-api/src/main/java/gobblin/converter/Converter.java:40,67,86;
chaining in gobblin-runtime/src/main/java/gobblin/runtime/MultiConverter.java:63-93).
Custom logic enters the reference ONLY via converter class names in job
config (e.g. `converter.classes` in
gobblin-example/src/main/resources/wikipedia.pull) — the Spark equivalent is
this registry: converter name + params → a DataFrame transform.

Design rule: every converter is expressed DECLARATIVELY (select / filter /
explode / from_json ...) so Catalyst sees through it — pushdown, pruning and
whole-stage codegen apply across the whole chain. Only genuinely opaque
logic (the Arrow schema rewriter, which must handle per-batch dynamic
schemas) uses mapInArrow, and it is Arrow-vectorized per the input_hint (no
per-row Python anywhere).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DataType,
    StringType,
    StructField,
    StructType,
    _parse_datatype_string,
)


class Converter:
    """Base contract (≙ gobblin.converter.Converter): a DataFrame→DataFrame
    transform. 1→0 (filter), 1→1 (map) and 1→many (explode) are all legal."""

    def convert(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


class ConversionFailureExceeded(RuntimeError):
    """Corrupt-row ratio crossed the converter's allowance — abort the task
    (≙ JsonIntermediateToAvroConverter.java:106-119 failing the job once
    failed conversions exceed CONVERTER_AVRO_MAX_CONVERSION_FAILURES)."""


# ----------------------------------------------------------- basic converters
@dataclass
class ProjectionConverter(Converter):
    """Keep or drop fields (≙ AvroProjectionConverter.java:86 /
    AvroSchemaFieldRemover nested removal)."""

    keep: list[str] | None = None
    drop: list[str] | None = None

    def convert(self, df: DataFrame) -> DataFrame:
        if self.keep:
            df = df.select(*self.keep)
        if self.drop:
            df = df.drop(*self.drop)
        return df


@dataclass
class FilterConverter(Converter):
    """Keep rows where field == expected (≙ AvroFilterConverter.java)."""

    field: str = ""
    value: Any = None

    def convert(self, df: DataFrame) -> DataFrame:
        return df.filter(F.col(self.field) == F.lit(self.value))


@dataclass
class RegexFilterConverter(Converter):
    """Keep rows whose field matches a regex (≙ StringFilterConverter.java)."""

    field: str = ""
    pattern: str = ".*"

    def convert(self, df: DataFrame) -> DataFrame:
        return df.filter(F.col(self.field).rlike(self.pattern))


@dataclass
class FieldRetrieverConverter(Converter):
    """Extract one (possibly nested) field as the record
    (≙ AvroFieldRetrieverConverter.java)."""

    field: str = ""
    alias: str | None = None

    def convert(self, df: DataFrame) -> DataFrame:
        return df.select(F.col(self.field).alias(self.alias or
                                                 self.field.split(".")[-1]))


@dataclass
class ToJsonConverter(Converter):
    """Whole record → one JSON string column (≙ AvroToJsonConverter.java)."""

    out_col: str = "json"

    def convert(self, df: DataFrame) -> DataFrame:
        return df.select(F.to_json(F.struct(*df.columns)).alias(self.out_col))


@dataclass
class FromJsonConverter(Converter):
    """JSON string column → typed columns, permissive with a max-failure
    threshold (≙ JsonIntermediateToAvroConverter.java:94-119: nullify missing
    fields + CONVERTER_AVRO_MAX_CONVERSION_FAILURES — the reference FAILS
    the task once failed conversions exceed the allowance).

    max_failures_ratio: None = permissive (silently drop corrupt rows, never
    count). A float r enforces the reference's abort semantics: one counting
    aggregate over the batch; if corrupt/total > r the convert raises
    ConversionFailureExceeded, else corrupt rows are dropped as before.
    """

    field: str = "json"
    schema_ddl: str = ""
    max_failures_ratio: float | None = None
    _corrupt: str = "__corrupt"

    def convert(self, df: DataFrame) -> DataFrame:
        schema = _parse_datatype_string(self.schema_ddl)
        assert isinstance(schema, StructType)
        schema = StructType(schema.fields + [StructField(self._corrupt, StringType())])
        parsed = df.withColumn(
            "__parsed",
            F.from_json(
                F.col(self.field),
                schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": self._corrupt},
            ),
        )
        corrupt_pred = F.col(f"__parsed.{self._corrupt}").isNotNull()
        if self.max_failures_ratio is not None:
            agg = parsed.agg(
                F.sum(corrupt_pred.cast("long")).alias("bad"),
                F.count(F.lit(1)).alias("total"),
            ).collect()[0]
            bad, total = int(agg["bad"] or 0), int(agg["total"])
            if total > 0 and bad / total > self.max_failures_ratio:
                raise ConversionFailureExceeded(
                    f"{bad}/{total} rows failed JSON conversion "
                    f"(> max_failures_ratio={self.max_failures_ratio})"
                )
        out_cols = [
            F.col(f"__parsed.{f.name}").alias(f.name)
            for f in schema.fields
            if f.name != self._corrupt
        ]
        return parsed.filter(~corrupt_pred).select(*out_cols)


@dataclass
class CsvToColumnsConverter(Converter):
    """Delimited string field → typed columns by header position
    (≙ CsvToJsonConverter, gobblin-core/.../csv/CsvToJsonConverter.java —
    the JSON hop is unnecessary in Spark: split straight into columns)."""

    field: str = "line"
    headers: list[str] | None = None
    delimiter: str = ","
    drop_source: bool = True

    def convert(self, df: DataFrame) -> DataFrame:
        parts = F.split(F.col(self.field), self.delimiter)
        cols = [
            F.element_at(parts, i + 1).alias(h)
            for i, h in enumerate(self.headers or [])
        ]
        keep = [c for c in df.columns if c != self.field or not self.drop_source]
        return df.select(*keep, *cols)


@dataclass
class StringSplitterConverter(Converter):
    """Split one string field into N records — 1→many
    (≙ StringSplitterConverter.java)."""

    field: str = ""
    delimiter: str = "\n"
    out_col: str | None = None

    def convert(self, df: DataFrame) -> DataFrame:
        out = self.out_col or self.field
        others = [c for c in df.columns if c != self.field]
        return df.select(
            *others,
            F.explode(F.split(F.col(self.field), self.delimiter)).alias(out),
        )


@dataclass
class FlattenConverter(Converter):
    """Flatten an array-of-structs column into N top-level records with
    fields renamed ``{array}_{field}``; base fields copied onto every row.
    (≙ fork-added FlattenConverter,
    gobblin-core/.../stunlock/schemaflattening/FlattenConverter.java:35-168 +
    SchemaFlattener.java:15-113 — re-expressed as one explode + renames.)"""

    array_field: str = ""

    def convert(self, df: DataFrame) -> DataFrame:
        arr = self.array_field
        others = [c for c in df.columns if c != arr]
        inner: DataType = df.schema[arr].dataType
        assert isinstance(inner, ArrayType) and isinstance(
            inner.elementType, StructType
        ), f"{arr} must be array<struct>"
        exploded = df.select(*others, F.explode(F.col(arr)).alias("__x"))
        flat_cols = [
            F.col(f"__x.{f.name}").alias(f"{arr}_{f.name}")
            for f in inner.elementType.fields
        ]
        return exploded.select(*others, *flat_cols)


@dataclass
class SchemaFieldRemoverConverter(Converter):
    """Recursive removal of (possibly nested) fields by dotted path
    (≙ AvroSchemaFieldRemover,
    gobblin-core/src/main/java/gobblin/converter/filter/AvroSchemaFieldRemover.java
    — removes fields at any depth from the record schema). Handles
    top-level columns, struct members via Column.dropFields, and structs
    inside top-level arrays via transform."""

    fields: list[str] | None = None

    def convert(self, df: DataFrame) -> DataFrame:
        out = df
        for path in self.fields or []:
            out = self._remove(out, path)
        return out

    @staticmethod
    def _remove(df: DataFrame, path: str) -> DataFrame:
        head, _, rest = path.partition(".")
        if head not in df.columns:
            return df  # absent fields are a no-op, like the reference
        if not rest:
            return df.drop(head)
        dt = df.schema[head].dataType
        if isinstance(dt, StructType):
            return df.withColumn(head, F.col(head).dropFields(rest))
        if isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType):
            return df.withColumn(
                head, F.transform(F.col(head), lambda x: x.dropFields(rest))
            )
        return df


@dataclass
class CastConverter(Converter):
    """Cast columns to target types (≙ JsonElementConversionFactory type
    lattice, gobblin-core/.../avro/JsonElementConversionFactory.java:51-135)."""

    casts: dict[str, str] | None = None

    def convert(self, df: DataFrame) -> DataFrame:
        out = df
        for col, typ in (self.casts or {}).items():
            out = out.withColumn(col, F.col(col).cast(typ))
        return out


@dataclass
class IdentityConverter(Converter):
    """No-op (≙ IdentityConverter.java:20)."""

    def convert(self, df: DataFrame) -> DataFrame:
        return df


# ------------------------------------------------------------ schema registry
class SchemaRegistry:
    """Versioned schema registry with evolution ops
    (≙ ConfluentSchemaRegistry, gobblin-core/.../stunlock/ConfluentSchemaRegistry.java:15,53
    — reduced to its essence: version → schema + the op log between versions).

    Ops: {"op":"add","col":..,"type":..} | {"op":"widen","col":..,"type":..}
       | {"op":"rename","old":..,"new":..}
    """

    def __init__(self, path: str | None = None):
        self.path = path
        self.versions: dict[int, dict[str, Any]] = {}
        if path and os.path.exists(path):
            with open(path) as fh:
                doc = json.load(fh)
            self.versions = {int(k): v for k, v in doc.items()}

    def register(self, version: int, schema: StructType,
                 ops_from_prev: list[dict[str, Any]] | None = None) -> None:
        self.versions[version] = {
            "schema": schema.jsonValue(),
            "ops": ops_from_prev or [],
        }
        if self.path:
            tmp = self.path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(self.versions, fh)
            os.replace(tmp, self.path)

    def schema(self, version: int) -> StructType:
        return StructType.fromJson(self.versions[version]["schema"])

    def latest_version(self) -> int:
        return max(self.versions) if self.versions else 0

    def ops_between(self, from_v: int, to_v: int) -> list[dict[str, Any]]:
        ops: list[dict[str, Any]] = []
        for v in range(from_v + 1, to_v + 1):
            ops.extend(self.versions.get(v, {}).get("ops", []))
        return ops

    def conform_exprs(self, from_v: int, to_v: int,
                      available_cols: list[str]) -> list:
        """SELECT expressions rewriting a frame written at from_v to the
        to_v schema (add → null, widen → cast, rename → alias) —
        ≙ AvroUtils.convertRecordSchema resolution
        (gobblin-utility/src/main/java/gobblin/util/AvroUtils.java:158)."""
        target = self.schema(to_v)

        def rename_lineage(lo: int) -> dict[str, str]:
            m: dict[str, str] = {}
            for op in self.ops_between(lo, to_v):
                if op["op"] == "rename":
                    hist = m.get(op["old"], op["old"])
                    m[op["new"]] = hist
                    m.pop(op["old"], None)
            return m

        renames = rename_lineage(from_v)
        # Transport fallback: rows may live in a file whose PHYSICAL layout
        # predates their logical version (a fixed-schema change-log table);
        # resolve through the full lineage when the direct name is absent.
        oldest = min(self.versions) if self.versions else from_v
        full_lineage = rename_lineage(oldest - 1 if oldest > 0 else 0)
        avail = set(available_cols)
        # SQL strings (selectExpr), not Columns: py4j round-trips per
        # operator are serial driver cost paid on every batch
        exprs = []
        for f_ in target.fields:
            candidates = [
                renames.get(f_.name, f_.name),
                f_.name,
                full_lineage.get(f_.name, f_.name),
            ]
            src = next((c for c in candidates if c in avail), None)
            typ = f_.dataType.simpleString()
            if src is None:
                exprs.append(f"CAST(NULL AS {typ}) AS `{f_.name}`")
            else:
                exprs.append(f"CAST(`{src}` AS {typ}) AS `{f_.name}`")
        return exprs


@dataclass
class SchemaEvolutionConverter(Converter):
    """Conform a mixed-version batch to the registry's target schema.

    The batch carries ``version_col``; each distinct version present is
    rewritten with add/widen/rename resolution and the results unioned —
    the per-record writer-schema → latest-schema conversion of
    KafkaAvroExtractor.decodeRecord (KafkaAvroExtractor.java:104-117) done
    set-at-a-time instead of record-at-a-time.
    """

    registry: SchemaRegistry = None  # type: ignore[assignment]
    version_col: str = "schema_version"
    target_version: int | None = None
    passthrough: list[str] | None = None  # system cols kept as-is
    versions: list[int] | None = None  # known distinct versions (skips a scan)

    def convert(self, df: DataFrame) -> DataFrame:
        to_v = self.target_version or self.registry.latest_version()
        versions = self.versions
        if versions is None:
            versions = [
                r[0] for r in df.select(self.version_col).distinct().collect()
            ]
        passthrough = [
            c for c in (self.passthrough or []) if c in df.columns
        ]
        parts = []
        for v in sorted(versions):
            sub = df.filter(F.expr(f"`{self.version_col}` = {int(v)}"))
            exprs = self.registry.conform_exprs(int(v), to_v, df.columns)
            parts.append(sub.selectExpr(
                *[f"`{c}`" for c in passthrough], *exprs
            ))
        if not parts:
            target = self.registry.schema(to_v)
            exprs = [f"CAST(NULL AS {f.dataType.simpleString()})"
                     f" AS `{f.name}`" for f in target.fields]
            return df.selectExpr(
                *[f"`{c}`" for c in passthrough], *exprs).limit(0)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


# ------------------------------------------------------- arrow-batch converter
@dataclass
class ArrowBatchConverter(Converter):
    """Escape hatch for genuinely non-declarative logic: a named function
    ``pa.RecordBatch → pa.RecordBatch`` applied via mapInArrow (Arrow-
    vectorized — the input_hint's mandated UDF shape; never per-row Python).
    ≙ a custom Converter subclass in the reference."""

    fn: Callable = None  # type: ignore[assignment]
    out_schema_ddl: str = ""

    def convert(self, df: DataFrame) -> DataFrame:
        fn = self.fn

        def run(batches):
            for b in batches:
                yield fn(b)

        return df.mapInArrow(run, self.out_schema_ddl)


# --------------------------------------------------------------------- chain
class ConverterChain(Converter):
    """Ordered composition (≙ MultiConverter.java:63-93)."""

    def __init__(self, converters: list[Converter]):
        self.converters = converters

    def convert(self, df: DataFrame) -> DataFrame:
        for c in self.converters:
            df = c.convert(df)
        return df


CONVERTER_REGISTRY: dict[str, type] = {
    "projection": ProjectionConverter,
    "filter": FilterConverter,
    "regex_filter": RegexFilterConverter,
    "field_retriever": FieldRetrieverConverter,
    "to_json": ToJsonConverter,
    "from_json": FromJsonConverter,
    "csv_to_columns": CsvToColumnsConverter,
    "string_splitter": StringSplitterConverter,
    "flatten": FlattenConverter,
    "cast": CastConverter,
    "schema_field_remover": SchemaFieldRemoverConverter,
    "identity": IdentityConverter,
    "schema_evolution": SchemaEvolutionConverter,
    "arrow_batch": ArrowBatchConverter,
}


def build_chain(specs: list[dict[str, Any]]) -> ConverterChain:
    """Config wiring: [{"name": "filter", "field": "op", "value": "U"}, ...]
    (≙ `converter.classes` comma list in job config)."""
    converters = []
    for spec in specs:
        spec = dict(spec)
        name = spec.pop("name")
        converters.append(CONVERTER_REGISTRY[name](**spec))
    return ConverterChain(converters)
