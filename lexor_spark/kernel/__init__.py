"""Pure-Python-3 extraction kernel (no Spark imports).

This package is the per-document engine that the Spark job runs inside a
vectorized Arrow UDF, and — run serially on the driver — the byte-identity
oracle required by BASELINE.json (``north_rule``: "byte-identical extracted
text per url").

Modules
-------
dom         Node/Text/Element/... tree (reference: lexor/core/node.py,
            lexor/core/elements.py — semantics, not code).
htmlparser  Driver-loop HTML parser with open/close + W100/E100 recovery
            (reference: lexor/core/parser.py:385-410).
extractor   Converter rules: boilerplate strip + main-content selection
            (reference: lexor/core/converter.py:331-376).
textwriter  Serializer emitting text + source spans
            (reference: lexor/core/writer.py:482-516).
pipeline    Fused parse→convert→write entry point ``extract_document``.
"""

from lexor_spark.kernel.pipeline import ExtractResult, extract_document

__all__ = ["ExtractResult", "extract_document"]
