"""Error-logging decorators — log the failing record, drop it from the output.

Spark-native re-expression of the reference's ``logErrors`` family
(SURVEY.md §2.2; ``ErrorLoggingValueMapper.java:89-100``,
``ErrorLoggingKeyValueMapper.java:92-103``, ``ErrorLoggingProcessor.java:157-167``).

Shared semantics: success → record flows through; recoverable exception →
rethrow; other exception → ``log.error("Cannot process ('<k>', '<v>')", e)``
and the record vanishes from the output (no DLQ branch exists in this
family).

"Logged, not silently eaten": besides the executor-side ``logging`` call
emitted from inside the UDF (the direct analog of the reference's slf4j
``log.error``), every ``log_*`` transform attaches a named
``DataFrame.observe`` metric counting dropped records, so a
``QueryExecutionListener`` / ``StreamingQueryListener`` can surface drop
counts per batch without a second pass (SURVEY.md §3.2).

Deliberate divergence at scale: the reference logs EVERY dropped record
with a full stack trace (``ErrorLoggingValueMapper.java:98``).  At 100 TB
that is millions of multi-line tracebacks per job — it floods any log
aggregator and dominates runtime (measured: ~150 µs/record, 7× the cost
of the wrapped function).  Our transforms therefore log the first
``max_logs`` failures per Python worker (default 50) followed by one
suppression notice; the ``observe`` metric still counts every drop, so
nothing is silently eaten.  Pass ``max_logs=None`` for reference-faithful
log-everything behavior.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Iterable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType

from ..model import ErrorFilter, _render_for_message, is_recoverable
from . import capture as C

__all__ = [
    "log_errors",
    "log_map_values",
    "log_map_values_with_key",
    "log_map",
    "log_flat_map_values",
    "log_flat_map_values_with_key",
    "log_flat_map",
    "log_process",
    "log_process_values",
    "log_flat_transform_values",
    "log_flat_transform_values_with_key",
]

logger = logging.getLogger("kafka_error_handling_spark")

OBSERVATION_PREFIX = "keh_dropped"
_obs_counter = [0]


def log_errors(
    fn: Callable[..., Any],
    error_filter: Optional[ErrorFilter] = None,
    with_key: bool = False,
):
    """Wrap a plain callable with reference log-and-signal semantics.

    Returns a callable that re-raises recoverable errors and raises a
    sentinel-captured path otherwise; used internally by the ``log_*``
    DataFrame transforms (which capture, log, and filter).
    """
    flt = error_filter or is_recoverable

    def _wrapped(*args):
        try:
            return fn(*args)
        except Exception as exc:  # noqa: BLE001
            if flt(exc):
                raise
            if with_key and len(args) >= 2:
                # message contract: ``ErrorLoggingKeyValueMapper.java:100``
                logger.error(
                    "Cannot process ('%s', '%s')",
                    _render_for_message(args[0]),
                    _render_for_message(args[-1]),
                    exc_info=exc,
                )
            else:
                # ``ErrorLoggingValueMapper.java:98``
                logger.error(
                    "Cannot process %s", _render_for_message(args[-1]), exc_info=exc
                )
            raise

    return _wrapped


DEFAULT_MAX_LOGS = 50


def _should_log(state: dict, max_logs: Optional[int]) -> bool:
    """Per-worker rate limiter: True for the first ``max_logs`` failures;
    emits one suppression notice on the first skipped log.  The closure
    state lives in the pickled UDF, so the counter is per Python worker —
    a bounded number of processes, hence a bounded log volume at any SF."""
    state["n"] += 1
    if max_logs is None or state["n"] <= max_logs:
        return True
    if state["n"] == max_logs + 1:
        logger.error(
            "Suppressing further 'Cannot process' logs in this worker "
            "(max_logs=%d reached); dropped-record totals remain available "
            "via the observe metric",
            max_logs,
        )
    return False


def _logging_fn(
    fn, with_key: bool, flt: ErrorFilter, max_logs: Optional[int] = DEFAULT_MAX_LOGS
):
    """Capture-flavored fn that logs before letting capture swallow the row."""
    state = {"n": 0}

    def _inner(*args):
        try:
            return fn(*args)
        except Exception as exc:  # noqa: BLE001
            if not flt(exc) and _should_log(state, max_logs):
                if with_key and len(args) >= 2:
                    logger.error(
                        "Cannot process ('%s', '%s')",
                        _render_for_message(args[0]),
                        _render_for_message(args[-1]),
                        exc_info=exc,
                    )
                else:
                    logger.error(
                        "Cannot process %s", _render_for_message(args[-1]), exc_info=exc
                    )
            raise

    return _inner


def _drop_errors(processed: DataFrame, processed_col: str, observe: bool) -> DataFrame:
    if observe:
        processed = _observe_drops(
            processed, F.col(processed_col)[C.ERROR_COL].isNotNull()
        )
    return C.values(processed, processed_col)


def _observe_drops(df: DataFrame, is_error: Column) -> DataFrame:
    """Attach the named drop/total observe metric used by every ``log_*``
    transform — per-worker ``max_logs`` suppression never hides the count."""
    _obs_counter[0] += 1
    name = f"{OBSERVATION_PREFIX}_{_obs_counter[0]}"
    return df.observe(
        name,
        F.count(F.when(is_error, 1)).alias("dropped"),
        F.count(F.lit(1)).alias("total"),
    )


def log_map_values(
    df: DataFrame,
    fn: Callable[[Any], Any],
    result_type: DataType,
    value_col: str = "value",
    error_filter: Optional[ErrorFilter] = None,
    observe: bool = True,
    max_logs: Optional[int] = DEFAULT_MAX_LOGS,
) -> DataFrame:
    """``ErrorLoggingValueMapper.logErrors`` (``ErrorLoggingValueMapper.java:62,89-100``)."""
    flt = error_filter or is_recoverable
    p = C.capture_map_values(
        df, _logging_fn(fn, False, flt, max_logs), result_type, value_col, flt, full_payload=False
    )
    return _drop_errors(p, "r", observe)


def log_map_values_with_key(
    df: DataFrame,
    fn: Callable[[Any, Any], Any],
    result_type: DataType,
    key_col: str = "key",
    value_col: str = "value",
    error_filter: Optional[ErrorFilter] = None,
    observe: bool = True,
    max_logs: Optional[int] = DEFAULT_MAX_LOGS,
) -> DataFrame:
    """``ErrorLoggingValueMapperWithKey`` (``ErrorLoggingValueMapperWithKey.java:64,92-103``)."""
    flt = error_filter or is_recoverable
    p = C.capture_map_values_with_key(
        df, _logging_fn(fn, True, flt, max_logs), result_type, key_col, value_col, flt,
        full_payload=False,
    )
    return _drop_errors(p, "r", observe)


def log_map(
    df: DataFrame,
    fn: Callable[[Any, Any], Any],
    key_type: DataType,
    value_type: DataType,
    key_col: str = "key",
    value_col: str = "value",
    error_filter: Optional[ErrorFilter] = None,
    observe: bool = True,
    max_logs: Optional[int] = DEFAULT_MAX_LOGS,
) -> DataFrame:
    """``ErrorLoggingKeyValueMapper`` (``ErrorLoggingKeyValueMapper.java:64,92-103``)."""
    flt = error_filter or is_recoverable
    p = C.capture_map(
        df, _logging_fn(fn, True, flt, max_logs), key_type, value_type, key_col, value_col, flt,
        full_payload=False,
    )
    return _drop_errors(p, "r", observe)


def log_flat_map_values(
    df: DataFrame,
    fn: Callable[[Any], Iterable[Any]],
    element_type: DataType,
    value_col: str = "value",
    error_filter: Optional[ErrorFilter] = None,
    observe: bool = True,
    max_logs: Optional[int] = DEFAULT_MAX_LOGS,
) -> DataFrame:
    """``ErrorLoggingFlatValueMapper`` (``ErrorLoggingFlatValueMapper.java:61,88-98``)."""
    flt = error_filter or is_recoverable
    p = C.capture_flat_map_values(
        df, _logging_fn(fn, False, flt, max_logs), element_type, value_col, flt,
        full_payload=False,
    )
    return _drop_errors(p, "r", observe)


def log_flat_map_values_with_key(
    df: DataFrame,
    fn: Callable[[Any, Any], Iterable[Any]],
    element_type: DataType,
    key_col: str = "key",
    value_col: str = "value",
    error_filter: Optional[ErrorFilter] = None,
    observe: bool = True,
    max_logs: Optional[int] = DEFAULT_MAX_LOGS,
) -> DataFrame:
    """``ErrorLoggingFlatValueMapperWithKey`` (``...WithKey.java:63,91-101``)."""
    flt = error_filter or is_recoverable
    p = C.capture_flat_map_values_with_key(
        df, _logging_fn(fn, True, flt, max_logs), element_type, key_col, value_col, flt,
        full_payload=False,
    )
    return _drop_errors(p, "r", observe)


def log_flat_map(
    df: DataFrame,
    fn: Callable[[Any, Any], Iterable[Any]],
    key_type: DataType,
    value_type: DataType,
    key_col: str = "key",
    value_col: str = "value",
    error_filter: Optional[ErrorFilter] = None,
    observe: bool = True,
    max_logs: Optional[int] = DEFAULT_MAX_LOGS,
) -> DataFrame:
    """``ErrorLoggingFlatKeyValueMapper`` (``ErrorLoggingFlatKeyValueMapper.java:63,91-101``)."""
    flt = error_filter or is_recoverable
    p = C.capture_flat_map(
        df, _logging_fn(fn, True, flt, max_logs), key_type, value_type, key_col, value_col, flt,
        full_payload=False,
    )
    return _drop_errors(p, "r", observe)


def log_process(
    df: DataFrame,
    processor,
    result_type,
    error_filter: Optional[ErrorFilter] = None,
    pass_through=None,
    input_value_col=None,
    max_logs: Optional[int] = DEFAULT_MAX_LOGS,
) -> DataFrame:
    """``ErrorLoggingProcessor`` (``ErrorLoggingProcessor.java:68,157-167``):
    mapInPandas wrapper, exception → log + skip row.  Also covers the legacy
    ``ErrorLoggingFlatValueTransformer(WithKey)`` shapes
    (``ErrorLoggingFlatValueTransformer.java:65,148-158``) — same semantics,
    legacy API surface.
    """
    flt = error_filter or is_recoverable
    state = {"n": 0}

    def _proc(rec):
        try:
            return processor(rec)
        except Exception as exc:  # noqa: BLE001
            if not flt(exc) and _should_log(state, max_logs):
                logger.error("Cannot process %s", rec, exc_info=exc)
            raise

    p = C.capture_process(df, _proc, result_type, flt, pass_through, input_value_col)
    # processor shapes emit a top-level error column, so the drop metric is
    # the flat-column variant of _drop_errors (ADVICE r1: drops must stay
    # counted once per-worker max_logs suppression kicks in)
    p = _observe_drops(p, F.col(C.ERROR_COL).isNotNull())
    return p.filter(F.col(C.ERROR_COL).isNull()).drop(C.ERROR_COL)


def log_process_values(
    df: DataFrame,
    processor,
    result_type,
    error_filter: Optional[ErrorFilter] = None,
    pass_through=None,
    input_value_col=None,
    max_logs: Optional[int] = DEFAULT_MAX_LOGS,
) -> DataFrame:
    """``ErrorLoggingValueProcessor`` (``ErrorLoggingValueProcessor.java:66,152-162``)."""
    flt = error_filter or is_recoverable
    state = {"n": 0}

    def _proc(rec):
        try:
            return processor(rec)
        except Exception as exc:  # noqa: BLE001
            if not flt(exc) and _should_log(state, max_logs):
                logger.error("Cannot process %s", rec, exc_info=exc)
            raise

    p = C.capture_process_values(
        df, _proc, result_type, flt, pass_through, input_value_col
    )
    p = _observe_drops(p, F.col(C.ERROR_COL).isNotNull())
    return p.filter(F.col(C.ERROR_COL).isNull()).drop(C.ERROR_COL)


# ---------------------------------------------------------------------------
# Legacy transformer API surface (SURVEY.md §2.2 last rows): the reference
# keeps deprecated transformValues-shaped decorators whose semantics are
# identical to the processor shapes — expose the same names for API parity.
# ---------------------------------------------------------------------------

#: ``ErrorLoggingFlatValueTransformer`` (``ErrorLoggingFlatValueTransformer.java:65,148-158``)
log_flat_transform_values = log_process_values
#: ``ErrorLoggingFlatValueTransformerWithKey`` (``...WithKey.java:68,154-164``)
log_flat_transform_values_with_key = log_process_values
