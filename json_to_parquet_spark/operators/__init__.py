from .convert import ConvertResult, convert, derive_output_name

__all__ = ["ConvertResult", "convert", "derive_output_name"]
