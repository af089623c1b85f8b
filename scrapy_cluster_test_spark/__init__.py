"""scrapy_cluster_test_spark — a PySpark-native crawl-frontier + analytics engine.

A from-scratch re-expression of the capabilities of the reference system
(dtrendiuk/scrapy-cluster-test, a Scrapy/Kafka/Mongo crawl cluster) on top of
Apache Spark:

* ``operators.frontier``  — partitioned priority-queue URL frontier with
  per-domain politeness budgets (reference: Mongo todo collections popped on
  ``spider_idle``, scrapy_project/project/spiders/amazon_merchant_autonomous.py:60-154).
* ``operators.seen``      — URL-seen dedup: exact anti-join + sharded Bloom
  filter (reference: two-stage anti-join, scrapy_project/project/pipelines.py:457-530).
* ``plans.epoch``         — transactional epoch loop with snapshot resume
  (reference: pending-flag lifecycle, pipelines.py:429-455).
* ``sources.fetchsim``    — deterministic mapInPandas fetch simulator over
  image+caption payload rows (reference: proxied HTTP downloader,
  scrapy_project/project/utils.py:90-151).
* ``operators.query_api`` — the analytics read path (reference: FastAPI →
  Mongo aggregation compiler, api/app/main.py:97-657).
* ``operators.dedupe`` / ``operators.similarity`` / ``operators.textanalysis``
  — large-scale training-data pipeline operators (MinHash-LSH, SimHash,
  ANN search, language-ID, quality scoring).

Everything is DataFrame-first: Catalyst plans the physical execution; Python
touches data only through Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
