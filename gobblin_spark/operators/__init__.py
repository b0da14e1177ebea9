from gobblin_spark.operators.converters import (
    CONVERTER_REGISTRY,
    Converter,
    ConverterChain,
    SchemaRegistry,
    build_chain,
)
from gobblin_spark.operators.fork import fork
from gobblin_spark.operators.quality import (
    RowLevelPolicy,
    RowLevelPolicyChecker,
    RowCountPolicy,
    RowCountRangePolicy,
    SchemaCompatibilityPolicy,
)

__all__ = [
    "Converter",
    "ConverterChain",
    "SchemaRegistry",
    "CONVERTER_REGISTRY",
    "build_chain",
    "fork",
    "RowLevelPolicy",
    "RowLevelPolicyChecker",
    "RowCountPolicy",
    "RowCountRangePolicy",
    "SchemaCompatibilityPolicy",
]
