"""Custom Python DataSource (Spark 4 datasource API): a deterministic
synthetic survey generator in the reference's positional CSV contract
(Email, Name, Products, question columns -- survey_analysis.py:6-11).

Why a custom source: load-testing the survey pipeline needs arbitrarily
large inputs in the exact reference shape without materializing files.
The generator is seeded per (partition, row), so any cluster layout
produces the SAME rows -- scaling out changes parallelism, never data.

Scale design: ``numRows`` splits evenly across ``numPartitions`` input
partitions; each partition streams its rows lazily (no driver
materialization), so a 10^9-row synthetic corpus costs zero driver memory
and reads at full executor parallelism.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

SURVEY_SCHEMA = ("Email string, Name string, Products string, "
                 "`How was your experience?` string")

_PRODUCTS = ("Alpha Jacket", "Beta Boots", "Gamma Scarf", "Delta Watch")
_ANSWERS = (
    "great quality but slow shipping",
    "love the design and the price",
    "n/a",
    "terrible support, size runs small",
    "",
    "good value for the price",
)


def _pick(seed: str, options: tuple[str, ...]) -> str:
    h = int(hashlib.md5(seed.encode()).hexdigest()[:8], 16)
    return options[h % len(options)]


class SyntheticSurveyPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticSurveyReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n_rows = int(options.get("numrows", 1000))
        self.n_parts = int(options.get("numpartitions", 4))

    def partitions(self) -> list[InputPartition]:
        per = max(1, -(-self.n_rows // self.n_parts))
        return [
            SyntheticSurveyPartition(i, min(i + per, self.n_rows))
            for i in range(0, self.n_rows, per)
        ]

    def read(self, partition: SyntheticSurveyPartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            n_prods = int(hashlib.md5(f"np:{i}".encode()).hexdigest()[:2], 16) % 3 + 1
            prods = ", ".join(
                _pick(f"p:{i}:{j}", _PRODUCTS) for j in range(n_prods))
            yield (
                f"user{i}@example.com",
                f"User {i}",
                prods,
                _pick(f"a:{i}", _ANSWERS),
            )


class SyntheticSurveyDataSource(DataSource):
    """spark.read.format("synthetic_survey").option("numRows", N)..."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_survey"

    def schema(self) -> str:
        return SURVEY_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticSurveyReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticSurveyDataSource)
