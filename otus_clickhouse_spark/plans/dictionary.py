"""External dictionaries + dictGet (lectures/lecture_11.md:1-130).

A ClickHouse dictionary is a refreshing key→attributes map queried via
``dictGet('dict', 'attr', key)`` — effectively a broadcast hash lookup
(lecture_10.md:204-217 recommends it over JOIN for small dims). Spark
realization: keep the dict as a small DataFrame; ``dict_get`` rewrites
to a **broadcast join** so lookups stay JVM-side and codegen'd rather
than a per-row UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column


@dataclass
class Dictionary:
    name: str
    key: str
    df: DataFrame  # small: key + attribute columns

    @classmethod
    def from_df(cls, spark: SparkSession, name: str, df: DataFrame, key: str) -> "Dictionary":
        d = cls(name=name, key=key, df=df)
        # the dictGet lookup view mangles every column name (__dk /
        # __da_<attr>): the rewrite embeds the CALLER's key expression
        # inside a correlated subquery over this view, and an unmangled
        # dict column named like an outer column would capture the
        # reference (inner scope wins) — e.g. a dict keyed on `number`
        # probed with an outer `number` column would degenerate to
        # WHERE number = number ≡ true
        mangled = df.select(
            F.col(key).alias("__dk"),
            *[F.col(c).alias(f"__da_{c}") for c in df.columns if c != key],
        )
        mangled.createOrReplaceTempView(f"dict_{name}")
        # a dictionary is also addressable as a table by its own name,
        # original column names intact (lecture_11.md:310: "Селектить,
        # а не диктГет-ать")
        df.createOrReplaceTempView(name)
        return d

    def get(self, attr: str, target: DataFrame, key_col: str | Column, default=None) -> DataFrame:
        """dictGet / dictGetOrDefault: append ``attr`` to ``target``.

        Broadcast left join on the key; missing keys get ``default``
        (dictGetOrDefault, lecture_11.md:305-345) or null (dictGetOrNull).
        """
        key_col = F.col(key_col) if isinstance(key_col, str) else key_col
        side = F.broadcast(self.df.select(F.col(self.key).alias("__dk"), F.col(attr)))
        out = target.join(side, key_col == F.col("__dk"), "left").drop("__dk")
        if default is not None:
            out = out.withColumn(attr, F.coalesce(F.col(attr), F.lit(default)))
        return out

    def has(self, target: DataFrame, key_col: str | Column, out_col: str = "dict_has") -> DataFrame:
        """dictHas: membership flag via broadcast semi-join-style lookup."""
        key_col = F.col(key_col) if isinstance(key_col, str) else key_col
        side = F.broadcast(
            self.df.select(F.col(self.key).alias("__dk")).distinct().withColumn("__hit", F.lit(True))
        )
        return (
            target.join(side, key_col == F.col("__dk"), "left")
            .withColumn(out_col, F.coalesce(F.col("__hit"), F.lit(False)))
            .drop("__dk", "__hit")
        )
