"""Import-time stand-in for pyspark.

There is no Spark in this engine (XLA replaces it — SURVEY §7); this package
exists so reference test modules that `import pyspark.sql` at module scope
collect cleanly. The spark-only tests themselves are skipped by the
reference conftest's backend markers, so nothing here ever executes a query.
"""

from . import sql  # noqa: F401
