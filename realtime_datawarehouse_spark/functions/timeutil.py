"""Event-time helpers (SURVEY.md §2.8/§2.9).

The reference uses exactly one window shape in production — 10 s event-time
tumble (TUMBLE / TumblingEventTimeWindows, e.g.
rt/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:188) — with window bounds
re-emitted as formatted strings stt/edt (rt/util/DateFormatUtil.java:19-44).
Fixture event timestamps are sparse, so plans default to 10-minute tumbles;
the helper is width-parametric, mirroring ``window(col, "N seconds")``.

``fmt_ts`` renders timestamps as 'yyyy-MM-dd HH:mm:ss' strings at comparison
boundaries: string-typed time columns hash identically across Spark and the
DuckDB oracle regardless of timestamp physical precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def fmt_ts(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, TS_FMT)


def fmt_date(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def tumble(df: DataFrame, ts_col: str, width: str = "10 minutes") -> DataFrame:
    """Attach tumbling-window struct + formatted stt/edt bound columns.

    Batch analog of the reference's window+finisher pattern (window bounds
    stamped into the output row —
    rt/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:196-211).
    """
    return (
        df.withColumn("w", F.window(F.col(ts_col), width))
        .withColumn("stt", fmt_ts(F.col("w.start")))
        .withColumn("edt", fmt_ts(F.col("w.end")))
    )
