"""Operator decorators: capture / log / describe matrices (SURVEY.md §2.1-2.3)."""

from .capture import (  # noqa: F401
    capture_udf,
    capture_map,
    capture_map_values,
    capture_map_values_with_key,
    capture_flat_map,
    capture_flat_map_values,
    capture_flat_map_values_with_key,
    capture_process,
    capture_process_values,
    values,
    errors,
    kv_struct_type,
)
from .describe import (  # noqa: F401
    describe_errors,
    describe_errors_with_key,
    describe_flat_map,
    describe_flat_map_values,
    describe_udf,
    describe_map,
    describe_map_values,
    describe_map_values_with_key,
    describe_process,
)
from .logging import (  # noqa: F401
    log_errors,
    log_map,
    log_map_values,
    log_map_values_with_key,
    log_flat_map,
    log_flat_map_values,
    log_flat_map_values_with_key,
    log_process,
    log_process_values,
    log_flat_transform_values,
    log_flat_transform_values_with_key,
)
