"""PySpark-native analytics engine with the capabilities of
bowen-xu/eventstream_benchmark (reference at /root/reference, read-only).

Layer A: Spark-native re-creation of the reference's synthetic
event-stream generator (pattern sets, stochastic streams with jitter /
interval distributions / density modulation, config-hash caching,
CSV/array/iterator export).  See ``generator/``.

Layer B: the analytic operator surface an event-stream benchmark feeds
(scans, joins, aggregations, windows, event-stream analytics, dedup,
similarity search, text analysis), all idiomatic DataFrame/Catalyst.
See ``operators/``.
"""

from eventstream_benchmark_spark.session import get_spark  # noqa: F401
from eventstream_benchmark_spark.io import load_table, TABLES  # noqa: F401
