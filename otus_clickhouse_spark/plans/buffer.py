"""Buffer engine: in-memory write batching (SURVEY.md §1.4, T7).

Reference semantics (lectures/lecture_09.md:77-206): a Buffer table
holds inserted blocks in RAM and flushes them to the destination table
when any max threshold (rows/bytes/time) is crossed; reads see buffer
contents unioned with the destination. ``async_insert`` is the
server-side variant of the same batching.

Spark realization: inserted blocks accumulate driver-side as a list of
(small) DataFrames; a flush coalesces them into ONE sorted parquet
append — exactly the small-file-compaction motivation: at scale, many
tiny streaming inserts must not become many tiny parquet files, or the
100 TB table's file listing drowns the planner. The buffered union is
what a read sees before flush, matching the reference's read-through
behavior.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


class BufferTable:
    """Buffer(dest, max_rows, max_blocks) — flush thresholds ≈ the
    reference's min/max time/rows/bytes triple (lecture_09.md:98-156).
    """

    def __init__(self, engine, name: str, dest: str, max_rows: int = 65536, max_blocks: int = 16):
        self.engine = engine
        self.name = name
        self.dest = dest
        self.max_rows = max_rows
        self.max_blocks = max_blocks
        self._blocks: list[DataFrame] = []
        self._buffered_rows = 0

    def insert(self, df: DataFrame) -> None:
        """Buffer one inserted block; flush when a threshold crosses."""
        df = df.localCheckpoint(eager=True)  # cut lineage; block is small
        self._blocks.append(df)
        self._buffered_rows += df.count()
        if self._buffered_rows >= self.max_rows or len(self._blocks) >= self.max_blocks:
            self.flush()

    def read(self) -> DataFrame:
        """Read-through: destination ∪ still-buffered blocks."""
        dest = self.engine.table(self.dest)
        if not self._blocks:
            return dest
        return reduce(DataFrame.unionByName, self._blocks, dest)

    def flush(self) -> int:
        """Coalesce buffered blocks into one destination append."""
        if not self._blocks:
            return 0
        union = reduce(DataFrame.unionByName, self._blocks)
        n = self._buffered_rows
        self._blocks, self._buffered_rows = [], 0
        self.engine.insert(self.dest, union)
        self.read().createOrReplaceTempView(self.name)
        return n
