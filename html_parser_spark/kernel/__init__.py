"""Pure-Python HTML5 parse kernel (no Spark imports here).

High-level API:
  parse_document(raw_bytes_or_text, charset_hint=None) -> ParseResult
  parse_fragment(text, context_tag, encoding=..., confidence=...) -> ParseResult
"""

from .api import ParseResult, parse_document, parse_fragment  # noqa: F401
