"""etielle_spark — a PySpark-native engine with the query and
data-processing capabilities of Promptly-Technologies-LLC/etielle.

The reference is a single-process Python interpreter over nested JSON
(etielle/executor.py); this engine compiles the same fluent API to Spark
DataFrame plans so Catalyst/Tungsten execute them distributed.  See
SURVEY.md for the full capability map.
"""

from .core import Field, TempField, Transform
from .models import InstanceBuilder, field_of
from .fluent import PipelineBuilder, PipelineResult, compile_emission, etl
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
from .transforms import (
    apply,
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
]

__version__ = "0.1.0"
