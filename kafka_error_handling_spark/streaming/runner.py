"""Structured Streaming runtime: single-pass dual-sink capture runner and
the ``FilteringProcessingExceptionHandler`` analog (SURVEY.md §2.5, §3.3).

Why ``foreachBatch`` (SURVEY.md §4): two independent streaming sinks would
each recompute the capture UDF — the wrapped user function must run
**exactly once per record** like the reference's in-thread ``apply()``
(``ErrorCapturingKeyValueMapper.java:94-107``).  So: one query, one
``foreachBatch``, ``persist()`` the processed micro-batch, project success
and dead-letter branches from the cached frame, write both, unpersist.

Delivery contract: at-least-once per micro-batch with checkpointing —
identical to the reference's crash-and-retry (recoverable ⇒ rethrow ⇒
restart from committed offset, ``ErrorCapturingValueMapper.java:91-93``);
exactly-once end-to-end requires an idempotent/transactional sink, same as
Kafka Streams EOS (documented per sink).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from ..model import ErrorFilter
from ..operators import capture as C

logger = logging.getLogger("kafka_error_handling_spark.streaming")

__all__ = [
    "run_captured",
    "FilteringExceptionHandler",
    "NOTHING_IS_RECOVERABLE",
    "handler_from_config",
]


def run_captured(
    stream: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    write_values: Callable[[DataFrame, int], None],
    write_errors: Callable[[DataFrame, int], None],
    checkpoint: str,
    processed_col: str = "r",
    handler: Optional["FilteringExceptionHandler"] = None,
    trigger: Optional[dict] = None,
    query_name: str = "keh_captured",
) -> StreamingQuery:
    """Run ``transform`` (a capture pipeline) over a stream with one pass.

    ``transform`` maps the raw micro-batch DataFrame to a processed frame
    containing ``processed_col`` (from ``capture_*``).  ``write_values`` /
    ``write_errors`` receive (split DataFrame, batch_id) — e.g. kafka or
    parquet appends.  ``handler``, if given, is the engine-level safety net
    around the whole batch (§2.5).
    """

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        def _run() -> None:
            processed = transform(batch_df).persist()
            try:
                write_values(C.values(processed, processed_col), batch_id)
                write_errors(C.errors(processed, processed_col), batch_id)
            finally:
                processed.unpersist()

        if handler is None:
            _run()
        else:
            handler.run_batch(batch_df, batch_id, _run)

    writer: DataStreamWriter = (
        stream.writeStream.queryName(query_name)
        .foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


# ---------------------------------------------------------------------------
# FilteringProcessingExceptionHandler analog
# (FilteringProcessingExceptionHandler.java:48-80)
# ---------------------------------------------------------------------------

# default filter: NothingIsRecoverableErrorFilter.java:33-39 — everything
# goes to the DLQ, processing resumes
NOTHING_IS_RECOVERABLE: ErrorFilter = lambda exc: False  # noqa: E731

# header names added by the reference handler
# (FilteringProcessingExceptionHandler.java:49-50)
HEADER_PROCESSOR_NODE_ID = "__streams.errors.processor.node.id"
HEADER_TASK_ID = "__streams.errors.task.id"


class FilteringExceptionHandler:
    """Engine-level catch-all: any exception escaping the per-record capture
    layer during a micro-batch reaches :meth:`run_batch`.

    - filter says recoverable → **fail**: re-raise, the streaming query dies
      and restarts from the checkpoint (``Response.fail()`` semantics).
    - else → **resume**: route the batch's raw source rows to the DLQ sink
      (the analog of ``ExceptionHandlerUtils.buildDeadLetterQueueRecord``'s
      raw ``sourceRawKey/sourceRawValue`` bytes) with node/task context
      headers, and continue with the next batch
      (``Response.resume(List.of(dlqRecord))``).

    Config mirrors ``FilteringProcessingExceptionHandlerConfig.java:40-45``:
    ``error_filter`` defaults to nothing-is-recoverable.
    """

    def __init__(
        self,
        write_raw_dlq: Callable[[DataFrame, int, BaseException], None],
        error_filter: ErrorFilter = NOTHING_IS_RECOVERABLE,
        node_id: str = "foreachBatch",
    ) -> None:
        self._write_raw_dlq = write_raw_dlq
        self._error_filter = error_filter
        self._node_id = node_id
        self.handled: list[tuple[int, str]] = []

    def run_batch(
        self, raw_batch: DataFrame, batch_id: int, body: Callable[[], None]
    ) -> None:
        try:
            body()
        except Exception as exc:  # noqa: BLE001
            if self._error_filter(exc):
                logger.error("recoverable batch failure, failing query", exc_info=exc)
                raise  # Response.fail(): restart from checkpoint
            logger.error(
                "non-recoverable batch failure, routing batch %s to raw DLQ",
                batch_id,
                exc_info=exc,
            )
            self.handled.append((batch_id, type(exc).__name__))
            from pyspark.sql import functions as F

            tagged = raw_batch.withColumn(
                "headers",
                F.array(
                    F.struct(
                        F.lit(HEADER_PROCESSOR_NODE_ID).alias("key"),
                        F.encode(F.lit(self._node_id), "UTF-8").alias("value"),
                    ),
                    F.struct(
                        F.lit(HEADER_TASK_ID).alias("key"),
                        F.encode(F.lit(str(batch_id)), "UTF-8").alias("value"),
                    ),
                ),
            )
            self._write_raw_dlq(tagged, batch_id, exc)
            # Response.resume(): swallow, next batch proceeds


def handler_from_config(
    config: dict,
    write_raw_dlq: Callable[["DataFrame", int, BaseException], None],
) -> FilteringExceptionHandler:
    """Config-dict construction mirroring
    ``FilteringProcessingExceptionHandlerConfig.java:40-45,56-64``:

    - ``"error.handling.filter"``: dotted path ``pkg.module:callable`` to an
      ErrorFilter (default: nothing-is-recoverable, like the reference's
      ``NothingIsRecoverableErrorFilter``);
    - ``"errors.dead.letter.queue.node.id"``: node id stamped into the
      ``__streams.errors.processor.node.id`` header.
    """
    flt = NOTHING_IS_RECOVERABLE
    spec = config.get("error.handling.filter")
    if spec:
        import importlib

        mod_name, _, attr = spec.partition(":")
        flt = getattr(importlib.import_module(mod_name), attr or "error_filter")
    return FilteringExceptionHandler(
        write_raw_dlq=write_raw_dlq,
        error_filter=flt,
        node_id=config.get("errors.dead.letter.queue.node.id", "foreachBatch"),
    )
