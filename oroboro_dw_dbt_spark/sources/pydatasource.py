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


# ---------------------------------------------------------------------------
# Planned late-data feed: watermark semantics made deterministic
# ---------------------------------------------------------------------------
# Each inner list is ONE micro-batch of (id, epoch-seconds) rows. The
# plan is engineered so the watermark trajectory — and therefore
# exactly which rows Spark's streaming aggregation must DROP and which
# windows it must EMIT in append mode — is decidable on paper, with no
# borderline equality cases AND no dependence on exactly when the
# engine makes a new watermark effective. Measured on this engine, the
# watermark computed from batch k's data governs batch k+2 (one batch
# later than the textbook "next batch"), so every batch transition that
# matters is guarded by a SPACER batch that leaves the max event time
# unchanged — the effective watermark at the decision batch is then
# identical whether the engine lags one batch or two:
#
#   batch 0: 12 on-time rows, 10:00..10:55 (5-min stride) -> wm 10:45
#   batch 1: SPACER id 50 @10:55 (max unchanged -> wm still 10:45)
#   batch 2: decision batch, effective wm = 10:45 under either lag:
#            6 on-time rows 11:00..11:10;
#            id 200 @10:50, id 201 @10:47 — LATE but their 10-min
#              windows end 11:00 / 10:50 > 10:45: must be ACCEPTED;
#            id 300 @10:05, id 301 @10:33 — their windows end
#              10:10 / 10:40 <= 10:45: state evicted, must be DROPPED
#   batch 3: sentinel id 400 @12:00 — pushes the final watermark to
#            11:50 so every certified window flushes
#   batch 4: SPACER sentinel id 401 @12:00 — guarantees 11:50 is
#            effective under either lag; both sentinels' own window
#            (12:00-12:10) is never passed and must never be emitted.
_B = 1704103200  # 2024-01-01 10:00:00 UTC in epoch seconds

LATE_PLAN: list[list[tuple[int, int]]] = [
    [(i, _B + i * 300) for i in range(12)],
    [(50, _B + 3300)],
    [(100 + j, _B + 3600 + j * 120) for j in range(6)]
    + [(200, _B + 3000), (201, _B + 2820), (300, _B + 300), (301, _B + 1980)],
    [(400, _B + 7200)],
    [(401, _B + 7200)],
]
LATE_DROPPED_IDS = {300, 301}  # window end <= watermark at arrival
LATE_UNFLUSHED_IDS = {400, 401}  # final watermark never passes their window


class LateFeedReader(SimpleDataSourceStreamReader):
    """Replays LATE_PLAN one batch per micro-batch, offset = batch
    index — so watermark advancement between batches is exactly the
    planned trajectory, run after run."""

    def initialOffset(self):
        return {"b": 0}

    def read(self, start):
        b = start["b"]
        if b >= len(LATE_PLAN):
            return iter([]), {"b": b}
        return iter(LATE_PLAN[b]), {"b": b + 1}

    def readBetweenOffsets(self, start, end):
        rows: list[tuple[int, int]] = []
        for b in range(start["b"], end["b"]):
            rows.extend(LATE_PLAN[b])
        return iter(rows)


class LateFeedDataSource(DataSource):
    """``spark.readStream.format("latefeed")`` — the planned feed."""

    @classmethod
    def name(cls) -> str:
        return "latefeed"

    def schema(self) -> str:
        return "id bigint, ep bigint"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return LateFeedReader()


def register_latefeed(spark) -> None:
    spark.dataSource.register(LateFeedDataSource)

# ---------------------------------------------------------------------------
# Planned two-sided feed: OUTER stream-stream join made deterministic
# ---------------------------------------------------------------------------
# One feed carries both join sides (column ``side``); the entry reads
# it twice and filters, so each side replays the same batch plan. The
# left-outer join's NULL rows only materialize when the GLOBAL
# watermark (min over both sides) passes a left row's join upper bound
# and its state is evicted — the batch plan below makes that final
# content decidable on paper under ANY watermark-effectiveness lag,
# because per side event times are monotone (nothing ever arrives
# late) and the closing sentinels push the watermark past every real
# row's bound on BOTH sides:
#
#   batch 0: L rows u1@0, u2@60, u3@120; R rows u1@300 (matches u1's
#            left row), u9@200 (right-only: must NOT appear)
#   batch 1: L u4@2000 (stays unmatched); R u2@500 (matches u2@60:
#            500 ∈ [60, 660]), u7@2100 (right-only)
#   batch 2: sentinels L u98@100000, R u99@100000 — watermark → 99400,
#            evicting u3@120 and u4@2000 unmatched (→ NULL rows); the
#            left sentinel itself is never evicted and must NOT emit.
#
# Expected final sink: 2 matched + 2 NULL-extended rows, exactly.
#
# Event times sit on a +10000 s base: the engine's initial watermark is
# epoch 0, and a row whose event time EQUALS the watermark is dropped
# on arrival at the join's late-row filter (observed: a left row at
# ep=0 vanished — neither matched nor NULL). Real feeds never straddle
# the epoch; the base keeps the plan away from that boundary artifact.
_JB = 10000

JOIN_PLAN: list[list[tuple[str, int, int, int]]] = [
    [
        ("L", 0, 1, _JB + 0),
        ("L", 1, 2, _JB + 60),
        ("L", 2, 3, _JB + 120),
        ("R", 100, 1, _JB + 300),
        ("R", 109, 9, _JB + 200),
    ],
    [
        ("L", 3, 4, _JB + 2000),
        ("R", 101, 2, _JB + 500),
        ("R", 102, 7, _JB + 2100),
    ],
    [("L", 98, 98, _JB + 100000), ("R", 199, 99, _JB + 100000)],
]
JOIN_BOUND_S = 600  # r.ep ∈ [l.ep, l.ep + bound]
JOIN_SENTINEL_L = 98


class JoinFeedReader(SimpleDataSourceStreamReader):
    """Replays JOIN_PLAN one batch per micro-batch (offset = batch
    index), same protocol as LateFeedReader."""

    def initialOffset(self):
        return {"b": 0}

    def read(self, start):
        b = start["b"]
        if b >= len(JOIN_PLAN):
            return iter([]), {"b": b}
        return iter(JOIN_PLAN[b]), {"b": b + 1}

    def readBetweenOffsets(self, start, end):
        rows: list[tuple[str, int, int, int]] = []
        for b in range(start["b"], end["b"]):
            rows.extend(JOIN_PLAN[b])
        return iter(rows)


class JoinFeedDataSource(DataSource):
    """``spark.readStream.format("joinfeed")`` — the two-sided feed."""

    @classmethod
    def name(cls) -> str:
        return "joinfeed"

    def schema(self) -> str:
        return "side string, id bigint, user_id bigint, ep bigint"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return JoinFeedReader()


def register_joinfeed(spark) -> None:
    spark.dataSource.register(JoinFeedDataSource)
