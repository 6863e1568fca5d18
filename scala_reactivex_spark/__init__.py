"""scala_reactivex_spark — a PySpark-native analytics engine.

A brand-new engine (not a port) providing the query and data-processing
capabilities of the reactive-streams operator library
``pietro909/scala-reactivex``, re-expressed Spark-first:

- the Rx operator surface (map/filter/flatMap, scan, distinct-until-changed,
  take families, count/time windows, debounce/throttle/sample, merge/concat/
  zip/combineLatest/withLatestFrom/takeUntil) as deterministic event-time
  computations over DataFrames (SURVEY.md §1.2, §2);
- a relational substrate (joins, rollup, ranking windows, set ops, scalar
  battery) the engine is built from (SURVEY.md §2.9);
- LLM-data-pipeline extensions: dedup (exact/MinHash-LSH/SimHash), embedding
  similarity search, multimodal columns, text analysis (SURVEY.md §2.10);
- Structured Streaming twins for the live push semantics (SURVEY.md §2.8).

Every operator is formulated partition-parallel (keyed windows, broadcastable
dims, no driver-side collects) so the same plan scales from local[*] fixtures
to a multi-executor cluster.
"""

__version__ = "0.1.0"

from scala_reactivex_spark.session import configure_session, get_spark  # noqa: F401
