"""vector_db_service_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of sternbergm/vector-db-service.

NOT a port: the reference is a single-process FastAPI + NumPy vector
database (see /root/reference); this package re-expresses every operator
as declarative DataFrame/SQL plans so Catalyst + Tungsten pick the
physical strategy and the same code scales from local[32] to a
1000-executor cluster over 100 TB.

Layout
------
sources/     parquet table loaders, schema contracts
functions/   column-expression libraries (similarity kernels, text, hashing)
operators/   query operators (kNN, LSH, grid, catalog CRUD, dedup, ANN, text)
plans/       index lifecycle / registry orchestration
streaming/   Structured Streaming incremental index maintenance
"""

__version__ = "0.1.0"
