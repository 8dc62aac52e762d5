"""etielle_spark — a PySpark-native engine with the query and
data-processing capabilities of Promptly-Technologies-LLC/etielle.

The reference is a single-process Python interpreter over nested JSON
(etielle/executor.py); this engine compiles the same fluent API to Spark
DataFrame plans so Catalyst/Tungsten execute them distributed.  See
SURVEY.md for the full capability map.
"""

from .core import Field, TempField, Transform
from .models import (
    ConstructorBuilder,
    InstanceBuilder,
    PydanticBuilder,
    PydanticPartialBuilder,
    TypedDictBuilder,
    field_of,
)
from .fluent import (
    ErrorMode,
    FieldUnion,
    PipelineBuilder,
    PipelineResult,
    TableStats,
    compile_emission,
    etl,
)
from .corespec import (
    CoreField,
    MappingResult,
    FieldSpec,
    InstanceEmit,
    IterationLevel,
    MappingSpec,
    TableEmit,
    TraversalSpec,
    run_mapping,
)
from .relationships import (
    ManyToOneSpec,
    RelationshipIncompleteError,
    bind_many_to_one,
    compute_relationship_keys,
    validate_relationship_completeness,
)
from .streaming import (
    BufferedKeyFlushStrategy,
    CallableChunkSource,
    Chunk,
    ChunkSource,
    ExternalPartitionChunkSource,
    GroupByChunkSource,
    KeyCompleteFlushStrategy,
    OneRecordPerChunkSource,
    PreSegmentedChunkSource,
    UpsertFlushStrategy,
    partitioned_chunks,
    stream,
)
from .streaming.pipeline import FlushStrategy
from .telemetry import (
    FlushCompleted,
    FlushFailed,
    FlushStarted,
    MapCompleted,
    MapStarted,
    TelemetryCallback,
    TelemetryEvent,
    TelemetryEventTypes,
)
from .policies import (
    AddPolicy,
    AppendPolicy,
    ExtendPolicy,
    FirstNonNullPolicy,
    LastWriteWinsPolicy,
    MaxPolicy,
    MergePolicy,
    MinPolicy,
)
from .session import get_spark
from .caches import release_operator_caches, tracked_cache_count
from .transforms import (
    Context,
    apply,
    apply_ctx,
    coalesce,
    concat,
    format_id,
    get,
    get_from_parent,
    get_from_root,
    index,
    key,
    len_of,
    literal,
    lookup,
    map_column,
    node,
    parent_index,
    parent_key,
    transform,
)

__all__ = [
    "Field",
    "TempField",
    "Transform",
    "PipelineBuilder",
    "PipelineResult",
    "InstanceBuilder",
    "field_of",
    "compile_emission",
    "etl",
    "get_spark",
    "AddPolicy",
    "AppendPolicy",
    "ExtendPolicy",
    "FirstNonNullPolicy",
    "LastWriteWinsPolicy",
    "MaxPolicy",
    "MergePolicy",
    "MinPolicy",
    "apply",
    "coalesce",
    "concat",
    "format_id",
    "get",
    "get_from_parent",
    "get_from_root",
    "index",
    "key",
    "len_of",
    "literal",
    "lookup",
    "map_column",
    "node",
    "parent_index",
    "parent_key",
    "transform",
    "Context",
    "apply_ctx",
    # reference API parity: builders
    "ConstructorBuilder",
    "TypedDictBuilder",
    "PydanticBuilder",
    "PydanticPartialBuilder",
    # fluent-level aliases
    "ErrorMode",
    "FieldUnion",
    "TableStats",
    # core-API (plan-level) specs
    "CoreField",
    "FieldSpec",
    "InstanceEmit",
    "IterationLevel",
    "MappingSpec",
    "MappingResult",
    "TableEmit",
    "TraversalSpec",
    "run_mapping",
    # relationships
    "ManyToOneSpec",
    "RelationshipIncompleteError",
    "bind_many_to_one",
    "compute_relationship_keys",
    "validate_relationship_completeness",
    # streaming / chunking
    "stream",
    "Chunk",
    "ChunkSource",
    "OneRecordPerChunkSource",
    "CallableChunkSource",
    "GroupByChunkSource",
    "PreSegmentedChunkSource",
    "ExternalPartitionChunkSource",
    "partitioned_chunks",
    "FlushStrategy",
    "KeyCompleteFlushStrategy",
    "UpsertFlushStrategy",
    "BufferedKeyFlushStrategy",
    # telemetry
    "TelemetryEvent",
    "TelemetryEventTypes",
    "TelemetryCallback",
    "MapStarted",
    "MapCompleted",
    "FlushStarted",
    "FlushCompleted",
    "FlushFailed",
    # operator cache lifecycle
    "release_operator_caches",
    "tracked_cache_count",
]

__version__ = "0.1.0"
