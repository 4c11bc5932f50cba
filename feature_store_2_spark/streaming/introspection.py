"""Streaming introspection — the ``GET /queue-size`` analog (A19).

The reference exposes its queue depth over HTTP
(/root/reference/app.py:47-60). A Structured Streaming pipeline's
equivalents live on StreamingQuery progress: rows behind the source
(backlog), input/processed rates, batch durations, and state-store size.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.streaming import StreamingQuery


def query_metrics(query: StreamingQuery) -> dict[str, Any]:
    """Flatten the latest progress into the reference's health view."""
    p = query.lastProgress or {}
    sources = p.get("sources") or [{}]
    state = (p.get("stateOperators") or [{}])[0]
    return {
        "query_id": str(query.id),
        "is_active": query.isActive,
        "batch_id": p.get("batchId"),
        "num_input_rows": p.get("numInputRows"),          # ~ queue intake
        "input_rows_per_second": p.get("inputRowsPerSecond"),
        "processed_rows_per_second": p.get("processedRowsPerSecond"),
        "batch_duration_ms": p.get("batchDuration"),
        "source_description": sources[0].get("description"),
        "state_rows": state.get("numRowsTotal"),          # keyed-state size
        "state_memory_bytes": state.get("memoryUsedBytes"),
    }
