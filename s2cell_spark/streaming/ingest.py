"""Structured-Streaming page ingest (ENGINE stretch, SURVEY §2.2).

Incremental per-cell tile counts over a stream of pages: watermark on
``warc_ts`` bounds late data, tumbling windows aggregate per (window,
level-k cell token). The S2 pandas UDFs work unchanged in streaming —
Arrow batches are Arrow batches — and the groupBy key is the native parent
expr, so state is keyed on (window, cell) with partial aggregation.

At scale: source = Iceberg/Kafka ``readStream``; here tests drive it with
a file/memory source at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s2cell_spark import functions as S2F


def streaming_cell_counts(
    pages_stream: DataFrame,
    level: int = 6,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """windowed (window_start, cell_token, n_pages) stream."""
    with_cell = pages_stream.withColumn(
        "cell_id", S2F.lat_lon_to_cell_id(F.col("lat"), F.col("lon"), 30)
    )
    parent = S2F.cell_id_to_parent_cell_id(F.col("cell_id"), level)
    return (
        with_cell.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("win"),
            S2F.cell_id_to_token(parent).alias("cell_token"),
        )
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("win.start").alias("window_start"), "cell_token", "n_pages")
    )
