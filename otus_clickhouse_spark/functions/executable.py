"""Executable UDFs and executable dictionary sources.

The reference configures UDFs as external scripts that read rows from
stdin and write results to stdout, chunk by chunk (lectures/
lecture_06.md:88-100: ``type: executable``, ``format: TabSeparated``),
and dictionary sources that run a command to produce the key→attribute
rows (lecture_17.md:22-54, executable / executable_pool).

Spark realization:

- :func:`executable_udf` — ``mapInPandas``: each Arrow batch is piped
  to one short-lived process as TabSeparated lines; its stdout lines
  (one per input row) come back as output columns appended to the
  batch. This is the chunked protocol of the reference (a process per
  block, not per row), and it scales: processes run on the executors,
  batch size bounds memory, and the exchange is Arrow on the Spark
  side / TSV on the script side.
- :func:`executable_dictionary_source` — driver-side command run once,
  stdout parsed as TabSeparated into a (small) DataFrame for
  ``Engine.create_dictionary`` — the loader side of F3.
"""

from __future__ import annotations

import subprocess
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession


def executable_udf(
    df: DataFrame,
    command: list[str] | str,
    out_cols: str,
    in_cols: list[str] | None = None,
    batch_timeout: float = 60.0,
) -> DataFrame:
    """Append script-computed columns: one stdout TSV line per input row.

    ``command`` is argv (or a shell string); ``out_cols`` is a Spark
    schema fragment for the appended columns (``"doubled INT"``);
    ``in_cols`` selects which columns are serialized to stdin (default
    all). The script MUST write exactly one line per input line.
    """
    import pandas as pd

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields] + [out_cols]
    )
    src_cols = in_cols or df.columns
    n_out = len([c for c in out_cols.split(",") if c.strip()])
    use_shell = isinstance(command, str)

    def run_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            payload = pdf[src_cols].to_csv(sep="\t", header=False, index=False)
            proc = subprocess.run(
                command,
                input=payload,
                capture_output=True,
                text=True,
                shell=use_shell,
                timeout=batch_timeout,
            )
            if proc.returncode != 0:
                raise RuntimeError(f"executable UDF failed: {proc.stderr[:500]}")
            lines = proc.stdout.rstrip("\n").split("\n")
            if len(lines) != len(pdf):
                raise RuntimeError(
                    f"executable UDF wrote {len(lines)} lines for {len(pdf)} rows"
                )
            out_values = [ln.split("\t", n_out - 1) for ln in lines]
            out = pdf.copy()
            for i, spec in enumerate(c.strip() for c in out_cols.split(",")):
                out[spec.split()[0]] = [v[i] for v in out_values]
            yield out

    return df.mapInPandas(run_batches, schema=out_schema)


def executable_dictionary_source(
    spark: SparkSession,
    command: list[str] | str,
    schema: str,
    timeout: float = 60.0,
) -> DataFrame:
    """Run ``command`` once on the driver; parse its TabSeparated stdout
    into a DataFrame with ``schema`` (the dictionary's key+attributes).
    Dictionaries are small by contract (they broadcast), so a driver-side
    load matches the reference's executable source exactly."""
    proc = subprocess.run(
        command,
        capture_output=True,
        text=True,
        shell=isinstance(command, str),
        timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"executable dictionary source failed: {proc.stderr[:500]}")
    rows = [
        tuple(line.split("\t"))
        for line in proc.stdout.rstrip("\n").split("\n")
        if line
    ]
    raw = spark.createDataFrame(rows, ", ".join(f"_c{i} string" for i in range(len(rows[0]))))
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    fields = StructType.fromDDL(schema).fields
    return raw.select(
        *[F.col(f"_c{i}").cast(f.dataType).alias(f.name) for i, f in enumerate(fields)]
    )
