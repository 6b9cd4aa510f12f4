"""html_parser_spark — a PySpark-native WHATWG HTML5 extraction engine.

Reimplements the semantics of the reference C11 parser (paulboul1013/
html_parser) as a pure-Python kernel wrapped in vectorized Arrow UDFs,
plus the Spark-level pipeline (salted repartition, ordered output,
per-partition metrics, checkpoint/resume) mandated by the north rule.

Layout:
  kernel/  — pure-Python, Spark-free: encoding sniff, tokenizer,
             tree builder, dump/serialize, text extraction,
             boilerplate strip. Byte-equal to the reference on its
             conformance corpus (see tests/goldens).
  spark/   — DataFrame pipeline: transcripts source, parse kernel as
             mapInArrow, metrics, checkpoint manifest, training-data
             ops (dedup, text stats, similarity search).
"""

__version__ = "0.1.0"
