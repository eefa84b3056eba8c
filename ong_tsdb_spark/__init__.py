"""ong_tsdb_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference fixed-interval
time-series database (Oneirag/ong_tsdb), re-expressed Spark-first:
DataFrame/SQL plans, Parquet partition-per-chunk storage, Catalyst
pruning/pushdown instead of hand-rolled chunk iteration, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.
"""

from .catalog import Catalog, SensorConfig
from .engine import OngTsdbSpark
from .grid import CHUNK_ROWS, Grid, parse_freq

__all__ = [
    "Catalog",
    "SensorConfig",
    "OngTsdbSpark",
    "Grid",
    "parse_freq",
    "CHUNK_ROWS",
]

__version__ = "0.2.0"
