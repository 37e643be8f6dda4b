from .convert_stream import stream_convert
from .dedup import dedup_stream
from .joins import purchases_with_recent_clicks
from .stateful import running_user_totals
from .windowed import windowed_event_counts

__all__ = [
    "dedup_stream",
    "purchases_with_recent_clicks",
    "running_user_totals",
    "stream_convert",
    "windowed_event_counts",
]
