"""cms_topn_spark — PySpark-native mergeable sketches with count-min top-n
at the core. See README.md; operator inventory in COVERAGE.md."""

__version__ = "0.1.0"
