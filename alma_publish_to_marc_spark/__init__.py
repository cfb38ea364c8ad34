"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL system (yalelibrary/alma-publish-to-marc).

Not a port: the reference's callback pipeline is re-expressed as pure
functions from DataFrames to DataFrames, planned by Catalyst and executed
by Tungsten. See SURVEY.md for the operator inventory this package covers.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``tables``     : loaders for the driver-provided parquet star schema
- ``schemas``    : declared StructTypes (publish record, item JSON, warehouse)
- ``functions/`` : scalar column-expression library + the few pandas UDFs
- ``operators/`` : relational / dedup / similarity / upsert operators
- ``sources/``   : MARC codec, XML/TSV/JSONL/tar ingest
- ``plans/``     : composed end-to-end queries (item_info flagship, publish split)
- ``streaming/`` : Structured Streaming ingest & merge
- ``multimodal/``: binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.1.0"
