"""File-backed Kafka topic stand-in.

This container has no broker, so a topic is a directory of ordered
``.jsonl`` segment files (one file per produced block) with global
message offsets; consumer groups commit their consumed count to a
sidecar file — the same at-least-once, offset-tracked contract the CH
Kafka engine has against a real broker (lecture_09.md:891-918;
clusters/ch_and_kafka/db/init.sql:11-20). On a cluster the same engine
surface binds to a live broker instead: ``streaming.mv.kafka_source``
(readStream with the CH virtual columns) and ``df.write.format("kafka")``
— gated behind ``SPARK_GRAFT_KAFKA_BROKERS``.
"""

from __future__ import annotations

import json
import os


class FileTopic:
    def __init__(self, root: str, topic: str):
        self.topic = topic
        self.dir = os.path.join(root, topic)

    def _segments(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(f for f in os.listdir(self.dir) if f.endswith(".jsonl"))

    def produce(self, messages: list[str]) -> None:
        """Append one segment file holding ``messages`` (ordered)."""
        if not messages:
            return
        os.makedirs(self.dir, exist_ok=True)
        seq = len(self._segments())
        path = os.path.join(self.dir, f"b{seq:08d}.jsonl")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(messages) + "\n")
        os.replace(tmp, path)  # segment appears atomically, never half-written

    def produce_frame(self, df) -> None:
        """Distributed produce: write a single-string-column DataFrame
        with Spark's text writer (each task appends its own part file —
        row data never passes through the driver), then promote the
        part files to ordered segments with driver-side RENAMES only
        (O(#partitions) metadata ops). This is the INSERT-into-Kafka
        scale path for the broker-less stand-in; with a real broker the
        engine uses ``df.write.format("kafka")`` instead."""
        import glob
        import shutil
        import uuid

        from pyspark.sql import functions as F

        col = df.columns[0]
        staging = os.path.abspath(self.dir.rstrip("/") + f".stage-{uuid.uuid4().hex[:8]}")
        # text writer rejects NULLs; an absent value serializes as empty
        df.select(F.coalesce(F.col(col), F.lit("")).alias("value")).write.mode(
            "overwrite"
        ).format("text").save(staging)
        try:
            parts = sorted(glob.glob(os.path.join(staging, "part-*")))
            os.makedirs(self.dir, exist_ok=True)
            seq = len(self._segments())
            for p in parts:
                if os.path.getsize(p) == 0:
                    continue  # empty partition → no segment
                os.replace(p, os.path.join(self.dir, f"b{seq:08d}.jsonl"))
                seq += 1
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def messages(self) -> list[str]:
        out: list[str] = []
        for seg in self._segments():
            with open(os.path.join(self.dir, seg), encoding="utf-8") as f:
                out.extend(line.rstrip("\n") for line in f if line.strip())
        return out

    def consume(self, group: str) -> tuple[int, list[str]]:
        """New messages for ``group`` since its committed offset.
        Commits the new high-water mark; returns (start_offset, batch)."""
        marker = os.path.join(self.dir, f".group_{group}.json")
        committed = 0
        if os.path.exists(marker):
            with open(marker, encoding="utf-8") as f:
                committed = json.load(f).get("consumed", 0)
        msgs = self.messages()
        batch = msgs[committed:]
        if batch:
            os.makedirs(self.dir, exist_ok=True)
            tmp = marker + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump({"consumed": len(msgs)}, f)
            os.replace(tmp, marker)
        return committed, batch
