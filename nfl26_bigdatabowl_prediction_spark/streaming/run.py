"""Run-to-completion helper for streaming pipelines.

``Trigger.AvailableNow`` drains everything currently in the source
and stops — the mechanism that makes a streaming pipeline's output
comparable to its batch twin (and therefore DuckDB-oracle-checkable
under the driver contract).

The memory sink is test-scale only (rows land on the driver); a
production job swaps in a parquet/kafka sink with the same plan.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame


def run_available_now(
    sdf: DataFrame,
    output_mode: str = "append",
    timeout_sec: int = 300,
) -> DataFrame:
    """Execute a streaming DataFrame until the source is drained;
    return the accumulated result as a batch DataFrame.

    ``complete`` mode re-emits full aggregation state at the end —
    use it for windowed aggregations so windows still inside the
    watermark horizon at end-of-stream are not withheld (append mode
    only releases a window once the watermark passes it, and a
    drained finite source never advances the watermark further).
    """
    name = "s" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="spark_ckpt_")
    query = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_sec)
    if query.isActive:  # pragma: no cover - defensive
        query.stop()
        raise TimeoutError(f"streaming query {name} did not drain in {timeout_sec}s")
    return sdf.sparkSession.table(name)
