"""Native ``spark.read.format("alphavantage")`` via Spark 4's Python
DataSource API — the SURVEY §2.1-S1 mapping's first-class form.

The reference's ingest is a driver-side boto3/requests loop
(``dags/get_stock.py:53-115``); its landing zone is one JSON document
per symbol. This data source makes that landing zone a real Spark
source: one input partition per landed document (executor-parallel
parse), symbol normalization and the presence filter (reference
operators P11/P12) applied at the source, rows shaped exactly like the
bronze zone minus the load timestamp.

Usage::

    spark.dataSource.register(AlphaVantageDataSource)
    df = (spark.read.format("alphavantage")
          .option("path", landing_dir).load())
    # symbol STRING, data_json STRING, n_days INT

Network fetch stays OUT of the source (the 15 s/symbol rate limit makes
it driver-side and serial by nature, SURVEY §4.2-2); the source reads
what the fetcher landed. At 100 TB-scale landing zones the per-file
partitioning is what matters: each executor parses its own documents.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

ALPHAVANTAGE_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), True),
        T.StructField("data_json", T.StringType(), True),
        T.StructField("n_days", T.IntegerType(), True),
    ]
)

# the reference's normalization map (get_stock.py:30-32) — re-declared
# here because source instances are pickled to executors and must not
# drag the whole package graph along
_SYMBOL_NORMALIZATION = {"BRK.B": "BRK-B"}


@dataclass
class _DocPartition(InputPartition):
    path: str


class AlphaVantageDataSource(DataSource):
    """Batch reader over a landing directory of Alpha Vantage JSON
    documents (one document per file, like the reference's MinIO
    prefix)."""

    @classmethod
    def name(cls) -> str:
        return "alphavantage"

    def schema(self) -> T.StructType:
        return ALPHAVANTAGE_SOURCE_SCHEMA

    def reader(self, schema: T.StructType) -> "AlphaVantageReader":
        path = self.options.get("path")
        if not path:
            raise ValueError("alphavantage source requires .option('path', landing_dir)")
        return AlphaVantageReader(path)

    def simpleStreamReader(self, schema: T.StructType):
        path = self.options.get("path")
        if not path:
            raise ValueError("alphavantage source requires .option('path', landing_dir)")
        return AlphaVantageSimpleStreamReader(path)


class AlphaVantageReader(DataSourceReader):
    def __init__(self, landing_dir: str):
        self.landing_dir = landing_dir

    def partitions(self) -> list[_DocPartition]:
        # one partition per landed document — the file listing happens
        # once on the driver (mirrors Spark's own file-source listing);
        # parsing is executor-side
        try:
            names = sorted(
                n for n in os.listdir(self.landing_dir) if n.endswith(".json")
            )
        except FileNotFoundError:
            names = []
        if not names:
            # the API requires >= 1 partition; a sentinel yields no rows
            return [_DocPartition("")]
        return [_DocPartition(os.path.join(self.landing_dir, n)) for n in names]

    def read(self, partition: _DocPartition):
        if not partition.path:
            return
        with open(partition.path) as f:
            doc = json.load(f)
        series = doc.get("Time Series (Daily)")
        if not series:  # presence filter (get_stock.py:64-68)
            return
        raw_symbol = (doc.get("Meta Data") or {}).get("2. Symbol")
        symbol = _SYMBOL_NORMALIZATION.get(raw_symbol, raw_symbol)
        yield (symbol, json.dumps(doc), len(series))


def _parse_doc(path: str):
    """Shared row shape for the batch and streaming readers: one
    (symbol, data_json, n_days) row per landed document, presence
    filter + symbol normalization applied at the source."""
    with open(path) as f:
        doc = json.load(f)
    series = doc.get("Time Series (Daily)")
    if not series:
        return None
    raw_symbol = (doc.get("Meta Data") or {}).get("2. Symbol")
    symbol = _SYMBOL_NORMALIZATION.get(raw_symbol, raw_symbol)
    return (symbol, json.dumps(doc), len(series))


try:  # SimpleDataSourceStreamReader: Spark 4 streaming Python source API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover — older pyspark
    SimpleDataSourceStreamReader = object


class AlphaVantageSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader over the landing directory: the OFFSET is the
    sorted set of file names already ingested, so each micro-batch
    reads exactly the files that appeared since the last one —
    exactly-once without any sidecar state (the offset lives in the
    query checkpoint, like Spark's own FileStreamSource seen-files
    log). readBetweenOffsets replays a committed range on recovery
    from the same immutable landing files."""

    def __init__(self, landing_dir: str):
        self.landing_dir = landing_dir

    def _list(self) -> list[str]:
        try:
            return sorted(
                n for n in os.listdir(self.landing_dir) if n.endswith(".json")
            )
        except FileNotFoundError:
            return []

    def initialOffset(self) -> dict:
        return {"seen": "[]"}

    def read(self, start: dict):
        seen = set(json.loads(start["seen"]))
        names = self._list()
        new = [n for n in names if n not in seen]
        rows = []
        for n in new:
            row = _parse_doc(os.path.join(self.landing_dir, n))
            if row is not None:
                rows.append(row)
        end = {"seen": json.dumps(sorted(seen | set(new)))}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        seen_start = set(json.loads(start["seen"]))
        seen_end = set(json.loads(end["seen"]))
        for n in sorted(seen_end - seen_start):
            row = _parse_doc(os.path.join(self.landing_dir, n))
            if row is not None:
                yield row

    def commit(self, end: dict) -> None:
        pass  # landing files are immutable; nothing to clean up
