from .convert_stream import stream_convert

__all__ = ["stream_convert"]
