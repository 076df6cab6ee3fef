"""Structured Streaming layer.

The reference's streaming story is: nanosecond-stamped inserts append
to a store writer, a background sorter promotes files
(store/storewrk.c:33-160) — there are no watermarks, stream windows,
or late-data semantics (SURVEY §2.6). This layer is the designed
*extension*: the same contexts become streaming sources/sinks, with
watermarked tumbling/sliding/session windows and custom stateful
operators on top.
"""

from nowdb_spark.streaming.ingest import (  # noqa: F401
    session_window_agg,
    stream_from_context,
    stream_into_context,
    windowed_agg,
)
