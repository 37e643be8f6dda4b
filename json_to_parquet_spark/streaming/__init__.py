from .convert_stream import stream_convert
from .stateful import running_user_totals
from .windowed import windowed_event_counts

__all__ = ["running_user_totals", "stream_convert", "windowed_event_counts"]
