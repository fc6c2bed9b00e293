"""Custom Python DataSource (the PySpark 4 extension point).

Spark 4's ``pyspark.sql.datasource`` API lets a PURE-PYTHON class act
as a first-class batch/stream source: the planner asks it for input
partitions, each partition's ``read`` runs ON THE EXECUTORS (Arrow-
serialized back), and pushed options arrive through the ctor. This is
the sanctioned way to graft a bespoke feed (an internal API, a binary
log format, a synthetic generator) into the DataFrame world without a
JVM connector — the modern replacement for RDD-based ingest glue.

The ``detgen`` source here generates a deterministic arithmetic stream
(id, Knuth-hash value bucket) across ``numPartitions`` independent
range slices, so:

- parallelism is REAL (one ``read`` call per partition, executor-side);
- output is engine-reproducible (pure integer arithmetic, no RNG
  state) — the correctness gate restates it as a SQL ``range()`` scan;
- the partition planning mirrors how a production source would split
  a keyspace/time-range (the 100 TB story: partitions() returns one
  split per shard/file/offset-range and reads stream independently).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

KNUTH = 2654435761  # 2^32 / phi — the classic multiplicative hash


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class DetGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("numrows", 1000))
        self.n_parts = int(options.get("numpartitions", 8))

    def partitions(self):
        per = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _RangePartition(i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition: _RangePartition):
        # executor-side: yield plain tuples, Arrow-batched by the runner
        for i in range(partition.start, partition.end):
            yield (i, (i * KNUTH) % 1000, f"row-{i % 7}")


class DetGenDataSource(DataSource):
    """``spark.read.format("detgen").option("numRows", n)`` source."""

    @classmethod
    def name(cls) -> str:
        return "detgen"

    def schema(self) -> str:
        return "id bigint, bucket bigint, tag string"

    def reader(self, schema) -> DataSourceReader:
        return DetGenReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the detgen source on a session."""
    spark.dataSource.register(DetGenDataSource)


# ---------------------------------------------------------------------------
# Streaming side of the API: a bounded deterministic stream source
# ---------------------------------------------------------------------------
from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402

STREAM_ROWS = 5000
STREAM_BATCH = 1000


class DetStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked deterministic generator: each micro-batch advances
    the offset by STREAM_BATCH ids until STREAM_ROWS, then reports
    no-progress forever (a bounded topic). read() hands Spark the batch
    AND the next offset — replays after failure go through
    readBetweenOffsets with the SAME arithmetic, so recovery is exact.
    """

    def initialOffset(self):
        return {"i": 0}

    def _rows(self, start: int, end: int):
        return iter(
            [(j, (j * KNUTH) % 1000, f"row-{j % 7}") for j in range(start, end)]
        )

    def read(self, start):
        i = start["i"]
        if i >= STREAM_ROWS:
            return iter([]), {"i": i}
        end = min(i + STREAM_BATCH, STREAM_ROWS)
        return self._rows(i, end), {"i": end}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["i"], end["i"])


class DetStreamDataSource(DataSource):
    """``spark.readStream.format("detstream")`` bounded stream."""

    @classmethod
    def name(cls) -> str:
        return "detstream"

    def schema(self) -> str:
        return "id bigint, bucket bigint, tag string"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return DetStreamReader()


def register_stream(spark) -> None:
    spark.dataSource.register(DetStreamDataSource)
