"""spark-docextract: PySpark-native main-content extraction engine.

From-scratch re-expression of Frosselet/pdf-ocr ("docpact") semantics on
idiomatic Spark (DataFrame + vectorized Arrow/pandas UDFs). See SURVEY.md.
"""

__version__ = "0.1.0"
