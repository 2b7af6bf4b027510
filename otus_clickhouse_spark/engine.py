"""Engine facade: catalog of parquet-backed tables + ClickHouse-dialect SQL.

Mirrors the reference's entry points (SURVEY.md §3): ``Engine.sql(text)``
is the EP1/EP2 query path (parse → Catalyst analyze/optimize → execute);
``Engine.insert`` is the EP3 write path (sorted, partitioned parquet
append). Table-engine semantics (ReplacingMergeTree FINAL etc.,
reference lectures/lecture_07.md:34-817) are carried as metadata on
:class:`TableDef` and realized as view rewrites in
:mod:`otus_clickhouse_spark.operators.final`.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@dataclass
class TableDef:
    """Table metadata ≈ ClickHouse DDL attributes (lectures/lecture_07.md:12-26).

    ``engine`` ∈ {MergeTree, ReplacingMergeTree, SummingMergeTree,
    AggregatingMergeTree, CollapsingMergeTree, VersionedCollapsingMergeTree,
    Log, Memory}. ``order_by`` is the sort/dedup key; ``version`` /
    ``sign`` configure the Replacing/Collapsing collapse semantics.
    """

    name: str
    path: str | None = None
    engine: str = "MergeTree"
    order_by: tuple[str, ...] = ()
    partition_by: tuple[str, ...] = ()
    version: str | None = None
    sign: str | None = None
    sum_columns: tuple[str, ...] = ()
    ttl: str | None = None  # boolean SQL expr; rows where it's true expire
    comment: str = ""
    settings: dict = field(default_factory=dict)
    # data-skipping indexes (D9; lecture_08.md:99-240): name -> (expr, type).
    # bloom-family types on plain columns map to parquet bloom filters at
    # write time; minmax/set are subsumed by row-group min/max stats.
    skip_indexes: dict = field(default_factory=dict)


# system tables holding access-control metadata: readable only with an
# explicit SELECT grant (hw12.md:53-61 ACCESS_DENIED golden); everything
# else in system.* stays implicitly readable for introspection
_PROTECTED_SYSTEM_TABLES = {
    "users", "roles", "grants", "role_grants", "quotas", "quota_limits",
    "settings_profiles",
}


class Engine:
    """Facade over a SparkSession + table registry.

    >>> eng = Engine(spark, data_dir="/root/testdata/sf0.001")
    >>> eng.sql("SELECT count(*) AS n FROM lineitem WHERE l_returnflag = 'R'")

    Hard assumption: ONE live Engine per warehouse directory (like one
    clickhouse-server per data dir). create_table/drop_table reclaim
    managed directories under ``spark-warehouse/``, so a second Engine
    instance over the same SparkSession + warehouse can delete data the
    first instance still serves — the "live registration errors above"
    guard in create_table is per-instance only.
    """

    def __init__(self, spark: SparkSession, data_dir: str | None = None):
        self.spark = spark
        self.tables: dict[str, TableDef] = {}
        self._dictionaries: dict[str, dict] = {}
        self._mvs: dict[str, list] = {}  # source table → attached MVs
        # table → {index name → IVF metadata} (vector_similarity DDL);
        # the index is a STORED derived table (centroids + inverted
        # lists) that insert() maintains incrementally
        self.vector_indexes: dict[str, dict] = {}
        self._sql_macros: dict[str, tuple] = {}  # CREATE FUNCTION lambdas
        self.session_settings: dict[str, str] = {}  # SET name = value
        self._buffers: dict[str, object] = {}  # Buffer-engine tables
        self._memory: dict[str, list] = {}  # Memory/Set-engine blocks
        self._row_policies: dict[str, list[str]] = {}  # table → predicates
        self._query_log: list[tuple] = []
        import time as _time

        self._started_at: float = _time.time()  # system.asynchronous_metrics Uptime
        self._processes: dict[str, tuple[str, float]] = {}
        self._events: dict[str, int] = {}  # cumulative counters (system.events)
        self._dict_sources: dict[str, tuple[str, list[str]]] = {}  # dict → (table, cols)
        self._dict_ddl: dict[str, str] = {}  # dict → original CREATE text
        self._view_ddl: dict[str, str] = {}  # plain view → its SELECT (SHOW CREATE)
        self._rbac_log: list[str] = []  # recorded GRANT/CREATE USER/… (D11)
        self._mutations_log: list[tuple] = []  # (statement, ts, status) — system.mutations
        # cluster topologies (lecture_15.md:40-67 <remote_servers>): name →
        # shard count. On Spark the "cluster" is the executor pool, so a
        # topology only shapes Distributed-table routing/virtual columns.
        self._clusters: dict[str, int] = {"default": 1}
        # database namespaces over the flat view catalog (D1): `default`
        # plus anything declared via CREATE DATABASE or first seen as a
        # CREATE TABLE db.t qualifier. Non-default databases mangle into
        # the flat catalog as ``{db}__{table}`` — so `streams.sensor_data`
        # and `parsed.sensor_data` are DISTINCT tables, exactly like CH
        # (clusters/ch_and_kafka/db/init.sql declares both). `default.t`
        # stays `t`. An UNKNOWN database errors instead of silently
        # acting on the same-named flat table.
        self._databases: set[str] = {"default"}
        self.current_database: str = "default"
        self._database_engines: dict[str, str] = {}  # engined CREATE DATABASE forms
        # config macros (hw09.md:295-325 getMacro usage; in CH these come
        # from <macros> in config.xml — one substitution set per server)
        self.macros: dict[str, str] = {"shard": "01", "replica": "replica_1"}
        # storage policies (hw13.md:15-27 system.storage_policies golden;
        # in CH these are <storage_configuration> server config). Tuples of
        # (policy_name, volume_name, disks) — tables reference one via
        # SETTINGS storage_policy='…'.
        self.storage_policies: list[tuple[str, str, list[str]]] = [
            ("default", "default", ["default"])
        ]
        # named collections (D14; hw19.md:37-48): name → {key: value},
        # consumed by external table functions/engines
        self._named_collections: dict[str, dict] = {}
        # backup/restore status log (S17; homeworks/hw13.md:78,123 —
        # `select * from system.backups` shows BACKUP_CREATED/RESTORED
        # rows). Tuples of (id, name, status, start_time, end_time).
        self._backups: list[tuple] = []
        # BACKUP DATABASE chain state (lecture_19.md:136-158): per-db
        # ordered history of {dest, mode} so WITH increment links to the
        # latest backup and WITH differential to the latest FULL one.
        self._db_backup_history: dict[str, list[dict]] = {}
        # RBAC entities (D11; lecture_18.md:5-216): structured mirrors of
        # _rbac_log, enforced at the query/insert boundary. The session
        # user is "default" (full access) until set_user() switches it.
        self._users: set[str] = {"default"}
        # auth method per user (hw12.md:14-22 system.users golden shows
        # auth_type; the bootstrap user authenticates via server config)
        self._user_auth: dict[str, str] = {"default": "plaintext_password"}
        self._roles: set[str] = set()
        # grants: (privilege, db, table, grantee) with '*' wildcards
        self._grants: list[tuple[str, str, str, str]] = []
        self._role_grants: dict[str, set[str]] = {}  # user → granted roles
        self._active_roles: dict[str, set[str]] = {}  # user → SET ROLE'd
        self.current_user = "default"
        # quotas (lecture_18.md:498-533): name → {interval_s, max:{counter:n}, to:set}
        self._quotas: dict[str, dict] = {}
        self._quota_usage: dict[str, list] = {}  # user → [(ts, kind, n)]
        # settings profiles (lecture_18.md:459-465): name → ({k:v}, to:set)
        self._profiles: dict[str, dict] = {}
        from otus_clickhouse_spark.plans.projections import ProjectionRegistry

        self.projections = ProjectionRegistry()
        from otus_clickhouse_spark.functions.clickhouse import register_clickhouse_functions

        register_clickhouse_functions(spark)
        if data_dir:
            self.register_data_dir(data_dir)

    # ---------------------------------------------------------------- catalog
    def register_data_dir(self, data_dir: str, tables: list[str] | None = None) -> None:
        """Register every ``<dir>/<name>.parquet`` as a named table/view."""
        names = tables or [
            f[: -len(".parquet")]
            for f in sorted(os.listdir(data_dir))
            if f.endswith(".parquet")
        ]
        for name in names:
            self.register_table(TableDef(name=name, path=os.path.join(data_dir, f"{name}.parquet")))

    def register_table(self, td: TableDef, df: DataFrame | None = None) -> None:
        """Register a table: parquet-backed (``td.path``) or an explicit DataFrame.

        Also materializes the ``<name>__final`` view when the engine type
        has FINAL collapse semantics (lecture_07.md:465-481, 551-790).
        """
        from pyspark.sql import functions as F

        from otus_clickhouse_spark.io import read_table

        self.tables[td.name] = td
        frame = df if df is not None else read_table(self.spark, td.path)
        # tiered storage (lecture_14.md:233 TTL … TO VOLUME): rows moved
        # to cold volumes are still part of the table — union them in
        if df is None:
            for cpath in td.settings.get("cold_volumes", {}).values():
                if os.path.exists(cpath):
                    frame = frame.unionByName(read_table(self.spark, cpath))
        # ALIAS columns (lecture_12.md:27-28): virtual, recomputed per
        # query — appended to the view, never stored
        for col, expr in td.settings.get("aliases", {}).items():
            if col not in frame.columns:
                frame = frame.withColumn(col, F.expr(expr))
        # row policies (lecture_18.md:561-609): mandatory prefilter on
        # every read; permissive policies OR together like the reference
        preds = self._row_policies.get(td.name)
        if preds:
            frame = frame.filter(" OR ".join(f"({p})" for p in preds))
        frame.createOrReplaceTempView(td.name)
        if td.engine in (
            "ReplacingMergeTree",
            "SummingMergeTree",
            "CollapsingMergeTree",
            "VersionedCollapsingMergeTree",
            "AggregatingMergeTree",
        ):
            from otus_clickhouse_spark.operators.final import final_view

            final_view(frame, td).createOrReplaceTempView(f"{td.name}__final")

    def create_table(self, ddl: str, path: str | None = None) -> TableDef:
        """Run a ClickHouse CREATE TABLE statement as-is (D2; DDL shapes
        per hw02.sql:1-22, lecture_07.md:34-40). The table starts empty;
        ``insert`` writes sorted/partitioned parquet under ``path``
        (default: spark-warehouse/<name>)."""
        from otus_clickhouse_spark.functions.ddl import parse_create_table

        td, schema = parse_create_table(ddl)
        if td.name in self.tables:
            # CH semantics: plain CREATE on an existing name errors;
            # IF NOT EXISTS is a no-op preserving the current data
            if re.search(r"\bIF\s+NOT\s+EXISTS\b", ddl, re.IGNORECASE):
                return self.tables[td.name]
            raise ValueError(f"table {td.name} already exists (use IF NOT EXISTS)")
        if path is None:
            # engine-managed location: CREATE means an EMPTY table, so any
            # directory left by a previous engine instance is orphaned
            # residue, never live data (a live registration errors above)
            td.path = os.path.join("spark-warehouse", td.name)
            if os.path.isdir(td.path):
                shutil.rmtree(td.path, ignore_errors=True)
        else:
            td.path = path
        td.settings["schema"] = schema  # declared column order/types for VALUES inserts
        self.tables[td.name] = td
        if td.engine == "Buffer":
            # Buffer(db, dest, layers, min/max time, min_rows, max_rows, …)
            # — lecture_09.md:77-206; reads union the buffer with dest
            from otus_clickhouse_spark.plans.buffer import BufferTable

            args = td.settings.get("engine_args", [])
            dest = (args[1] if len(args) > 1 else args[0]).strip("'\"")
            max_rows = int(args[6]) if len(args) > 6 else 65536
            buf = BufferTable(self, td.name, dest, max_rows=max_rows)
            self._buffers[td.name] = buf
            td.path = None  # nothing persisted under the buffer's own name
            buf.read().createOrReplaceTempView(td.name)
            return td
        if td.engine == "Distributed":
            return self._register_distributed(td)
        if td.engine in ("PostgreSQL", "MySQL", "JDBC"):
            # external-DB engines (S15/S16; hw19.md:63-81): the table is a
            # live JDBC proxy — no local storage, reads hit the server
            from otus_clickhouse_spark.sources.readers import (
                external_table,
                resolve_external_conf,
            )

            conf = resolve_external_conf(
                td.engine.lower(),
                td.settings.get("engine_args", []),
                self._named_collections,
            )
            td.settings["external_conf"] = conf
            td.path = None
            external_table(self.spark, conf).createOrReplaceTempView(td.name)
            return td
        if td.engine == "Kafka":
            # Kafka engine DDL (lecture_09.md:891-918; ch_and_kafka/db/
            # init.sql:11-20 SETTINGS form, :62-65 positional form
            # Kafka(broker, topic, group, format)): capture broker/topic
            # settings. INSERT produces to the topic; kafka_poll consumes
            # and fires attached MVs (on a cluster: readStream via
            # streaming.mv.kafka_source / df.write.format("kafka")).
            sm = re.findall(r"kafka_(\w+)\s*=\s*'?([\w:,./-]+)'?", ddl)
            td.settings.update({f"kafka_{k}": v for k, v in sm})
            pos = [a.strip().strip("'\"") for a in td.settings.get("engine_args", [])]
            for key, val in zip(
                ("kafka_broker_list", "kafka_topic_list", "kafka_group_name", "kafka_format"),
                pos,
            ):
                td.settings.setdefault(key, val)
            td.path = None
            self.spark.createDataFrame([], schema).createOrReplaceTempView(td.name)
            return td
        if td.engine == "Merge":
            # Merge(db, 'regex') — lectures/lecture_09.md:589-651:
            # union of all registered tables matching the regex, with
            # the `_table` virtual column
            from otus_clickhouse_spark.sources.readers import merge_tables

            args = td.settings.get("engine_args", [])
            pattern = args[-1].strip("'\"")
            td.path = None
            candidates = [n for n in self.tables if n != td.name]
            merge_tables(self.spark, pattern, candidates).createOrReplaceTempView(td.name)
            return td
        empty = self.spark.createDataFrame([], schema)
        self.register_table(td, df=empty)
        return td

    # ------------------------------------------------------------------ RBAC
    def set_user(self, name: str) -> None:
        """Switch the session user (≈ connecting as that user;
        lecture_18.md:20-26). Unknown users are rejected like a failed
        authentication. Settings profiles assigned to the user (or their
        granted roles) apply on switch — CH applies them at login."""
        if name != "default" and name not in self._users:
            raise PermissionError(f"unknown user {name}")
        self.current_user = name
        # currentUser() is a SQL UDF — rebind it to the live user so
        # queries observe the switch (CH's currentUser() does)
        self.spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION currentUser() "
            f"RETURNS STRING RETURN '{name}'"
        )
        grantees = {name} | self._role_grants.get(name, set())
        for prof in self._profiles.values():
            if grantees & prof["to"]:
                self.session_settings.update(prof["settings"])

    def _check_quota(self, kind: str, weight: int = 1) -> None:
        """Sliding-window quota counters (lecture_18.md:498-533): each
        run/error/result-rows event is stamped per user with a weight
        (1 per query/error; the row count for ``result_rows``); an
        applicable quota whose window total reaches its MAX raises
        QUOTA_EXCEEDED. ``weight=0`` checks the accumulated window
        without recording (the pre-flight for ``result_rows``, whose
        weight is only known after the query ran)."""
        import time as _time

        user = self.current_user
        if user == "default":
            return
        grantees = {user} | self._role_grants.get(user, set())
        now = _time.time()
        usage = self._quota_usage.setdefault(user, [])
        for q in self._quotas.values():
            if not (grantees & q["to"]):
                continue
            limit = q["max"].get(kind)
            if limit is None:
                continue
            total = sum(
                n for t, k, n in usage if k == kind and now - t < q["interval_s"]
            )
            if total >= limit:
                raise PermissionError(
                    f"QUOTA_EXCEEDED: {kind} limit {limit} per {q['interval_s']}s for {user}"
                )
        if weight > 0:
            usage.append((now, kind, weight))
        if len(usage) > 10000:  # bound the in-memory trail
            del usage[: len(usage) - 10000]

    def _record_quota_usage(self, kind: str, n: int) -> None:
        """Stamp after-the-fact usage (result_rows: the count exists
        only once the query finished) without re-raising."""
        import time as _time

        if self.current_user == "default" or n <= 0:
            return
        self._quota_usage.setdefault(self.current_user, []).append(
            (_time.time(), kind, n)
        )

    def system_quotas(self) -> DataFrame:
        """≈ system.quotas (lecture_18.md:538)."""
        rows = [
            (name, q["interval_s"], ",".join(sorted(q["to"])))
            for name, q in sorted(self._quotas.items())
        ]
        return self.spark.createDataFrame(
            rows, "quota_name string, duration bigint, apply_to string"
        )

    def system_quota_limits(self) -> DataFrame:
        """≈ system.quota_limits (lecture_18.md:506-533)."""
        rows = [
            (
                name,
                q["interval_s"],
                q["max"].get("queries"),
                q["max"].get("errors"),
                q["max"].get("result_rows"),
            )
            for name, q in sorted(self._quotas.items())
        ]
        return self.spark.createDataFrame(
            rows,
            "quota_name string, duration bigint, max_queries bigint, "
            "max_errors bigint, max_result_rows bigint",
        )

    def _granted(self, user: str, priv: str, table: str) -> bool:
        """Direct grants + grants of the user's ACTIVE roles (a granted
        role confers nothing until SET ROLE — lecture_18.md:170)."""
        grantees = {user} | self._active_roles.get(user, set())
        for p, _db, tbl, grantee in self._grants:
            if grantee not in grantees:
                continue
            if p not in (priv, "ALL"):
                continue
            if tbl in ("*", table):
                return True
        return False

    def check_access(self, priv: str, tables: list[str]) -> None:
        """Raise unless the session user holds ``priv`` on every table.

        ``default`` bypasses (the reference's bootstrap superuser);
        system views and engine-internal names are exempt like CH's
        implicit system-table access for introspection."""
        user = self.current_user
        if user == "default":
            return
        for t in tables:
            if t.startswith("__") or t.startswith("system"):
                continue
            if not self._granted(user, priv.upper(), t):
                raise PermissionError(
                    f"ACCESS_DENIED: user {user} lacks {priv.upper()} on {t}"
                )

    def _referenced_tables(self, text: str) -> list[str]:
        names = re.findall(r"\b(?:FROM|JOIN)\s+`?(\w+)`?", text, re.IGNORECASE)
        return [n for n in set(names) if n in self.tables]

    def system_users(self) -> DataFrame:
        """≈ system.users (lecture_18.md:56; hw12.md:72-80 golden shows
        name + auth_type): RBAC-created users."""
        rows = [
            (u, self._user_auth.get(u, "no_password"), "local_directory")
            for u in sorted(self._users)
        ]
        return self.spark.createDataFrame(
            rows, "name string, auth_type string, storage string"
        )

    def system_roles(self) -> DataFrame:
        """≈ system.roles (hw12.md:31-38 golden): name, a stable id,
        storage. The id is a deterministic UUID of the role name (CH
        assigns a random one at CREATE; determinism is friendlier to
        tests and changes nothing the reference asserts)."""
        import uuid as _uuid

        rows = [
            (r, str(_uuid.uuid5(_uuid.NAMESPACE_OID, "role:" + r)), "local_directory")
            for r in sorted(self._roles)
        ]
        return self.spark.createDataFrame(rows, "name string, id string, storage string")

    def system_role_grants(self) -> DataFrame:
        """≈ system.role_grants (lecture_18.md:195)."""
        rows = [
            (u, r, r in self._active_roles.get(u, set()))
            for u, roles in sorted(self._role_grants.items())
            for r in sorted(roles)
        ]
        return self.spark.createDataFrame(
            rows, "user_name string, granted_role_name string, active boolean"
        )

    def define_cluster(self, name: str, shards: int = 1) -> None:
        """Declare a cluster topology (lecture_15.md:40-67): the Spark
        analogue of a ``<remote_servers>`` section. ``shards`` drives
        Distributed-table ``_shard_num`` assignment and write routing."""
        self._clusters[name] = int(shards)

    def _register_distributed(self, td: TableDef) -> TableDef:
        """ENGINE = Distributed(cluster, db, local_table[, sharding_key])
        — lectures/lecture_15.md:13-34, homeworks/hw10.md:41-89.

        A DataFrame is already distributed, so reads proxy the local
        table directly (scatter-gather is Spark's task scheduling). The
        topology surfaces as the ``_shard_num`` virtual column — CH
        assigns shard = key mod shard-count (lecture_15.md:30) — and the
        sharding key shapes WRITES: insert repartitions by it into one
        partition group per shard, the Spark analogue of shard routing.
        """
        from pyspark.sql import functions as F

        args = [a.strip("'\"") for a in td.settings.get("engine_args", [])]
        if len(args) < 3:
            raise ValueError("Distributed(cluster, database, table[, sharding_key])")
        cluster, _db, local = args[0], args[1], args[2]
        td.settings["cluster"] = cluster
        td.settings["local_table"] = local
        if len(args) > 3:
            td.settings["sharding_key"] = args[3]
        n = self._clusters.setdefault(cluster, 1)
        td.settings["n_shards"] = n
        td.path = None
        self.tables[td.name] = td
        frame = self.table(local)
        key = td.settings.get("sharding_key")
        if key and n > 1:
            shard = (F.pmod(F.expr(key).cast("bigint"), F.lit(n)) + 1).cast("int")
        else:
            shard = F.lit(1).cast("int")
        frame.withColumn("_shard_num", shard).createOrReplaceTempView(td.name)
        return td

    def system_named_collections(self) -> DataFrame:
        """≈ system.named_collections (D14): names + keys, secrets masked
        like the reference's SHOW NAMED COLLECTIONS SECRETS gating."""
        rows = [
            (name, ", ".join(f"{k} = {'[HIDDEN]' if 'pass' in k else v}" for k, v in kv.items()))
            for name, kv in sorted(self._named_collections.items())
        ]
        return self.spark.createDataFrame(rows, "name string, collection string")

    def system_clusters(self) -> DataFrame:
        """≈ system.clusters (lecture_15.md:74-83; hw10.md:14-24): one
        row per (cluster, shard) of every declared topology."""
        rows = [
            (name, s, 1, "localhost", 9000)
            for name, shards in sorted(self._clusters.items())
            for s in range(1, shards + 1)
        ]
        return self.spark.createDataFrame(
            rows, "cluster string, shard_num int, replica_num int, host_name string, port int"
        )

    def system_macros(self) -> DataFrame:
        """≈ system.macros: the server's config-macro substitution set
        (hw09.md:295-325 uses getMacro('replica') over it)."""
        rows = sorted(self.macros.items())
        return self.spark.createDataFrame(rows, "macro string, substitution string")

    def system_replicas(self) -> DataFrame:
        """≈ system.replicas (hw09.md:10-20): one row per Replicated*
        table. Single-session emulation: this engine is always the
        leader of its own data; total/active replicas come from the
        widest declared cluster topology (replicas of one shard would
        each run this same engine over shared storage)."""
        n_rep = max(self._clusters.values(), default=1)
        rows = []
        for name, td in sorted(self.tables.items()):
            if not td.settings.get("replicated"):
                continue
            zk = td.settings.get(
                "zookeeper_path", f"/clickhouse/tables/{{shard}}/{name}"
            )
            for macro, sub in self.macros.items():
                zk = zk.replace("{" + macro + "}", sub)
            replica = self.macros.get("replica", "replica_1")
            rows.append(
                ("default", name, td.settings.get("engine_full", td.engine),
                 1, 0, zk, replica, f"{zk}/replicas/{replica}", n_rep, n_rep)
            )
        return self.spark.createDataFrame(
            rows,
            "database string, table string, engine string, is_leader int, "
            "is_readonly int, zookeeper_path string, replica_name string, "
            "replica_path string, total_replicas int, active_replicas int",
        )

    def system_storage_policies(self) -> DataFrame:
        """≈ system.storage_policies (hw13.md:15-27 golden: default +
        s3_main volumes with their disk lists)."""
        return self.spark.createDataFrame(
            self.storage_policies,
            "policy_name string, volume_name string, disks array<string>",
        )

    def system_databases(self) -> DataFrame:
        """≈ system.databases (D1; lecture_16.md SHOW DATABASES surface):
        one row per known namespace over the flat catalog — plus CH's
        two built-in INFORMATION_SCHEMA spellings (hw19.md:88-95 SHOW
        DATABASES golden lists both)."""
        builtin = {"system": "System", "INFORMATION_SCHEMA": "Memory",
                   "information_schema": "Memory"}
        return self.spark.createDataFrame(
            [
                (d, builtin.get(d) or self._database_engines.get(d, "Atomic"))
                for d in sorted(self._databases | set(builtin))
            ],
            "name string, engine string",
        )

    def system_backups(self) -> DataFrame:
        """≈ system.backups (hw13.md:78,123: one row per BACKUP/RESTORE
        with a uuid id and BACKUP_CREATED/RESTORED status)."""
        schema = (
            "id string, name string, status string, "
            "start_time timestamp, end_time timestamp"
        )
        if not self._backups:
            return self.spark.createDataFrame([], schema)
        return self.spark.createDataFrame(self._backups, schema)

    def add_storage_policy(self, policy: str, volume: str, disks: list[str]):
        """Register a storage policy (CH <storage_configuration> config;
        hw13.md:15-27). Tables opt in via SETTINGS storage_policy='…'.
        Upsert by name — policies are config-unique in CH, so re-adding
        one replaces it instead of duplicating the system view row."""
        self.storage_policies = [p for p in self.storage_policies if p[0] != policy]
        self.storage_policies.append((policy, volume, list(disks)))

    _ON_CLUSTER_RE = re.compile(r"\s+ON\s+CLUSTER\s+'?(\w+)'?", re.IGNORECASE)

    def execute(self, text: str, **params):
        """Statement router (EP1 entry point): DDL → catalog ops,
        everything else → :meth:`run` (logged SELECT)."""
        s = text.strip().rstrip(";")
        if "--" in s and not re.search(r"\bFORMAT\s+\w+\s*\n", s, re.IGNORECASE):
            # `-- …` line comments break the statement-shape regexes
            # (lecture_19/20 snippets end in trailing commentary); strip
            # them with a single quote-tracking scan — a two-phase sub
            # mis-lexes comments containing an unpaired quote. Inline
            # FORMAT data blocks are never touched — data lines may
            # legitimately contain `--`.
            from otus_clickhouse_spark.functions.dialect import _strip_line_comments

            s = _strip_line_comments(s).strip().rstrip(";")
        dbm = re.match(
            r"^\s*(CREATE|DROP)\s+DATABASE\s+(?:IF\s+(?:NOT\s+)?EXISTS\s+)?(\w+)"
            r"(?:\s+ON\s+CLUSTER\s+'?\w+'?)?\s*(?:ENGINE\s*=\s*(\w+)\s*(?:\([^)]*\))?\s*)?$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if dbm:
            # D1 (hw03.md:7 `create database homework`): databases are
            # namespaces over the flat catalog — CREATE registers the
            # name so later `db.table` references resolve; DROP removes
            # the name and the tables created under it stay (they live
            # in the flat catalog; CH's DROP DATABASE CASCADE semantics
            # are out of scope for the course surface). The engined form
            # (hw19.md:85 `CREATE DATABASE pg ENGINE = PostgreSQL(…)`)
            # records the engine for SHOW/system.databases; its tables
            # proxy through the table-level JDBC path (S15/S16) when
            # declared individually — remote auto-discovery needs a live
            # server this sandbox doesn't have.
            if dbm.group(1).upper() == "CREATE":
                self._databases.add(dbm.group(2).lower())
                if dbm.group(3):
                    self._database_engines[dbm.group(2).lower()] = dbm.group(3)
                return {"created_database": dbm.group(2)}
            if dbm.group(2).lower() == "default":
                # the engine's own namespace — dropping it would orphan
                # the flat catalog (CH likewise refuses on its system DBs)
                raise ValueError("cannot drop the default database")
            db = dbm.group(2).lower()
            # CH's Atomic DROP DATABASE drops the database's tables
            # (lecture_02.md database model) — cascade over the mangled
            # names registered under this namespace
            for tname in [n for n in list(self.tables) if n.startswith(db + "__")]:
                self.drop_table(tname)
            # MVs owned by the database (by MV name or by source table)
            # go with it — they are tables in CH's namespace too
            pref = db + "__"
            for src in list(self._mvs):
                kept = [mv for mv in self._mvs[src] if not mv.name.startswith(pref)]
                if src.startswith(pref) or not kept:
                    self._mvs.pop(src, None)
                else:
                    self._mvs[src] = kept
            self._databases.discard(db)
            self._database_engines.pop(db, None)
            if self.current_database == db:
                self.current_database = "default"
            return {"dropped_database": dbm.group(2)}
        um = re.match(r"^\s*USE\s+(\w+)\s*$", s, re.IGNORECASE)
        if um:
            # USE db (D1): membership check + switch — subsequent
            # unqualified names resolve in the current database first
            # (CH errors on an unknown database too)
            self._check_db_qualifier(um.group(1), "USE")
            self.current_database = um.group(1).lower()
            return {"using_database": um.group(1)}
        cm = re.match(
            r"^\s*CREATE\s+(?:TABLE|DICTIONARY|(?:MATERIALIZED\s+)?VIEW)\s+"
            r"(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\.(\w+)",
            s,
            re.IGNORECASE,
        )
        if cm:
            # a CREATE under a new qualifier implicitly declares the
            # namespace (creation is benign; only destructive statements
            # demand a previously-known database)
            self._databases.add(cm.group(1).lower())
        s = self._strip_known_db_prefixes(s)
        # ON CLUSTER <name> (lecture_15.md:84-99): every node of the Spark
        # "cluster" is the same session, so the clause reduces to declaring
        # the topology (if new) and running the statement once.
        ocm = self._ON_CLUSTER_RE.search(s)
        if ocm and re.match(r"^\s*(CREATE|DROP|ALTER|RENAME|TRUNCATE|EXCHANGE)\b", s, re.IGNORECASE):
            self._clusters.setdefault(ocm.group(1), 1)
            s = self._ON_CLUSTER_RE.sub("", s)
        ctas = re.match(
            r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*"
            r"((?:(?!\bAS\s+SELECT\b).)*?)\s*AS\s+(SELECT\b.*)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if ctas:
            # CTAS (D2; homeworks/hw03.md:123-166 denormalization pattern):
            # run the SELECT, persist as a sorted/partitioned parquet table
            name, attrs, select_sql = ctas.groups()
            em = re.search(r"ENGINE\s*=\s*(\w+)", attrs, re.IGNORECASE)
            om = re.search(r"ORDER\s+BY\s+\(?([\w, ]+?)\)?\s*(?:PARTITION|SETTINGS|$)", attrs, re.IGNORECASE)
            td = TableDef(
                name=name,
                path=os.path.join("spark-warehouse", name),
                engine=em.group(1) if em else "MergeTree",
                order_by=tuple(c.strip() for c in om.group(1).split(",")) if om else (),
            )
            self.tables[name] = td
            self.insert(name, self.sql(select_sql, **params), mode="overwrite")
            return td
        copym = re.match(
            r"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?:\w+\.)?(?P<name>\w+)\s+AS\s+"
            r"(?:\w+\.)?(?P<src>\w+)\s*(?:ENGINE\s*=\s*(?P<eng>\w+)\s*(?:\((?P<eargs>[^)]*)\))?.*)?$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if copym and copym.group("src").upper() != "SELECT":
            name, src = copym.group("name"), copym.group("src")
            if name in self.tables:
                # name collision: CH errors; IF NOT EXISTS keeps the
                # existing table (and its data) untouched
                if copym.group("ine"):
                    return self.tables[name]
                raise ValueError(f"table {name} already exists (use IF NOT EXISTS)")
            eng = (copym.group("eng") or "").strip()
            if eng.lower() == "distributed":
                # CREATE TABLE d AS local ENGINE = Distributed(…) — the
                # hw10.md:41-45 idiom: column config from the local table,
                # storage proxied through the topology
                from otus_clickhouse_spark.functions.ddl import _split_args

                td = TableDef(name=name, engine="Distributed")
                td.settings["engine_args"] = [
                    a for a in _split_args(copym.group("eargs") or "", many=True) if a
                ]
                return self._register_distributed(td)
            # CREATE TABLE a AS b (schema copy, D2; lecture_16.md:230):
            # clone the source's TableDef/engine metadata, start empty
            import copy as _copy

            import shutil as _shutil

            td = _copy.deepcopy(self.tables[src])
            td.name = name
            td.path = os.path.join("spark-warehouse", name)
            if eng:
                # CREATE TABLE new AS old ENGINE = X (hw09.md:141-144's
                # MergeTree → ReplicatedMergeTree conversion): schema
                # copies, the ENGINE clause wins. Replicated* records
                # replication identity like functions/ddl.py does.
                td.engine = re.sub(r"^Replicated", "", eng)
                if eng.startswith("Replicated"):
                    td.settings["replicated"] = True
                    eargs_raw = (copym.group("eargs") or "").strip()
                    td.settings["engine_full"] = f"{eng}({eargs_raw})" if eargs_raw else eng
                else:
                    td.settings.pop("replicated", None)
                    td.settings["engine_full"] = eng
            _shutil.rmtree(td.path, ignore_errors=True)  # fresh table: no stale parts
            # register the empty view directly: a partitioned write of
            # zero rows leaves no parquet footer to re-read
            self.register_table(td, df=self.table(src).limit(0).localCheckpoint(eager=True))
            return td
        copym3 = re.match(
            # attrs-BEFORE-AS schema copy (hw14.md:30 `create table d
            # engine=MergeTree order by tuple() as system.dashboards`):
            # CH copies the source's structure only; system.* views are
            # valid sources
            r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)\s+"
            r"(?P<attrs>ENGINE\s*=.*?)\s+AS\s+(?:(?P<srcdb>\w+)\.)?(?P<src>\w+)\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if copym3 and copym3.group("src").upper() != "SELECT":
            name = copym3.group("name")
            srcdb, src = copym3.group("srcdb"), copym3.group("src")
            attrs = copym3.group("attrs")
            if srcdb and srcdb.lower() == "system":
                method = getattr(self, f"system_{src}", None)
                if method is None:
                    raise KeyError(f"unknown system table system.{src}")
                src_df = method()
            elif srcdb is None and src in self.tables:
                src_df = self.table(src)
            else:
                src_df = None
            if src_df is not None:
                em = re.search(r"ENGINE\s*=\s*(\w+)", attrs, re.IGNORECASE)
                om = re.search(
                    r"ORDER\s+BY\s+\(?([\w, ]+?)\)?\s*(?:PARTITION|SETTINGS|$)",
                    attrs,
                    re.IGNORECASE,
                )
                okey = tuple(
                    c.strip() for c in (om.group(1).split(",") if om else [])
                    if c.strip() and c.strip() != "tuple()"
                )
                td = TableDef(
                    name=name,
                    path=os.path.join("spark-warehouse", name),
                    engine=em.group(1) if em else "MergeTree",
                    order_by=okey,
                )
                self.tables[name] = td
                self.register_table(td, df=src_df.limit(0).localCheckpoint(eager=True))
                return td
        if re.match(r"^\s*CREATE\s+TABLE\b", s, re.IGNORECASE):
            return self.create_table(s)
        dm = re.match(
            r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?:([\w]+)\.)?([\w]+)", s, re.IGNORECASE
        )
        if dm:
            self._check_db_qualifier(dm.group(1), "DROP TABLE")
            name = dm.group(2)
            if name not in self.tables and re.search(r"\bIF\s+EXISTS\b", s, re.IGNORECASE):
                return None  # DROP TABLE IF EXISTS on an absent table is a no-op
            return self.drop_table(name)
        fm = re.match(
            # INSERT … FORMAT CSV\n<data> — the HTTP/CLI inline-data form
            # (clusters/airflow_and_ch etl.py insert path over HTTP;
            # lecture_03.md format-negotiated inserts)
            r"^\s*INSERT\s+INTO\s+(?:([\w]+)\.)?([\w]+)\s*(?:\(([^)]*)\))?\s+"
            r"FORMAT\s+(\w+)\s*\n(.*)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if fm:
            db, name, collist, fmt, data = fm.groups()
            self._check_db_qualifier(db, "INSERT")
            cols = [c.strip().strip("`") for c in collist.split(",")] if collist else None
            if fmt.lower() == "values":
                return self.insert(name, self._values_frame(name, "VALUES " + data, cols))
            return self.insert(name, self._format_frame(name, fmt, data, cols))
        im = re.match(
            r"^\s*INSERT\s+INTO\s+(?:([\w]+)\.)?([\w]+)\s*(?:\(([^)]*)\))?\s+"
            r"(SELECT\b.*|WITH\b.*|VALUES\b.*)",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if im:
            self._check_db_qualifier(im.group(1), "INSERT")
            name, collist, rest = im.group(2), im.group(3), im.group(4)
            cols = [c.strip().strip("`") for c in collist.split(",")] if collist else None
            if rest.upper().startswith(("SELECT", "WITH")):
                sel = self.sql(rest, **params)
                if cols:
                    sel = sel.toDF(*cols)
                    # a PARTIAL column list fills the omitted columns
                    # with their DEFAULT exprs, same as the VALUES and
                    # FORMAT-data paths (hw06.md roles.created_at
                    # DEFAULT now() via INSERT … (cols) SELECT)
                    ddl = self.tables[name].settings.get("schema")
                    if ddl:
                        from pyspark.sql.types import StructType

                        declared = {f.name for f in StructType.fromDDL(ddl).fields}
                        if set(cols) != declared:
                            sel = self._values_frame_from(name, sel, cols)
                else:
                    sel = self._align_positional(name, sel)
                return self.insert(name, sel)
            return self.insert(name, self._values_frame(name, rest, cols))
        dfm = re.match(
            r"^\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?format\s*\(\s*(\w+)\s*,\s*(.*)\)\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if dfm:
            # DESC format(Fmt, <inline data>) — the schema-inference
            # probe (lecture_03.md:361-363 goldens): parse the literal
            # through the same format map as file() and report the
            # inferred columns
            from pyspark.sql import Row

            df = self.format_inline_table(dfm.group(1), dfm.group(2))
            shape = Row("col_name", "data_type", "comment")
            return [shape(f.name, f.dataType.simpleString(), None) for f in df.schema.fields]
        xm = re.match(
            r"^\s*EXPLAIN\s+(?:(AST|SYNTAX|PLAN|PIPELINE|ESTIMATE)\s+)?(SELECT\b.*|WITH\b.*)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if xm:
            # EXPLAIN [mode] (D7; lectures/lecture_21.md:399-452): CH modes
            # map onto Spark's explain flavors — AST/SYNTAX ≈ parsed/
            # analyzed (extended), PLAN ≈ formatted, PIPELINE ≈ physical
            # with codegen, ESTIMATE ≈ cost
            if (xm.group(1) or "").upper() == "ESTIMATE":
                return self.explain_estimate(xm.group(2))
            mode = {
                "AST": "extended",
                "SYNTAX": "extended",
                "PLAN": "formatted",
                "PIPELINE": "codegen",
            }.get((xm.group(1) or "PLAN").upper(), "formatted")
            return [self.explain(xm.group(2), mode=mode)]
        from otus_clickhouse_spark.plans.statements import try_route

        routed = try_route(self, s)
        if routed is not None:
            return routed
        return self.run(s, **params)

    def _check_db_qualifier(self, db: str | None, stmt: str) -> None:
        """The engine's namespace is flat; only KNOWN database prefixes
        (``default`` + CREATE DATABASE declarations) are transparent.
        Any other qualifier is an error, never a silent strip —
        ``DROP TABLE otherdb.t`` must not drop ``t``."""
        if db is not None and db.lower() not in self._databases and db.lower() not in (
            "information_schema",  # CH built-in, both spellings (hw19.md:88-95)
            "system",
        ):
            raise KeyError(
                f"{stmt}: unknown database '{db}' (known: {sorted(self._databases)})"
            )

    def _strip_known_db_prefixes(self, s: str) -> str:
        """Resolve ``db.`` qualifiers for KNOWN databases (quote-aware)
        into the flat catalog: ``default.t`` → ``t``, any other known
        ``db.t`` → ``db__t`` — so same-named tables in different
        databases stay distinct (init.sql's ``streams.sensor_data`` vs
        ``parsed.sensor_data``). After ``USE db``, unqualified names that
        exist under the current database resolve there first (CH scoping;
        names absent from the current db fall back to ``default`` — a
        deliberate leniency so a leaked USE can't orphan flat queries).
        Unknown prefixes are left in place; the destructive-statement
        regexes then either error explicitly or fall through to a Spark
        resolution error, never silently acting on the flat table.
        Inline FORMAT-data blocks are never rewritten (only the
        statement head before the data newline is scanned)."""
        from otus_clickhouse_spark.functions.dialect import _sub_outside_quotes

        alts = "|".join(re.escape(d) for d in sorted(self._databases))
        fm = re.search(r"\bFORMAT\s+\w+\s*\n", s, re.IGNORECASE)
        head, data = (s[: fm.end()], s[fm.end() :]) if fm else (s, "")

        def _qual(m: re.Match) -> str:
            db = m.group(1).lower()
            return m.group(2) if db == "default" else f"{db}__{m.group(2)}"

        head = _sub_outside_quotes(
            re.compile(rf"\b({alts})\.(\w+)", re.IGNORECASE), _qual, head
        )
        cur = self.current_database
        if cur not in ("default", "information_schema", "system"):
            # the two built-ins hold no user tables — resolution stays flat
            bases = sorted(
                (n[len(cur) + 2 :] for n in self.tables if n.startswith(cur + "__")),
                key=len,
                reverse=True,
            )
            if bases:
                balts = "|".join(re.escape(b) for b in bases)

                # TABLE POSITIONS ONLY: a base name counts as a table
                # reference when it directly follows a table-introducing
                # keyword (FROM/JOIN/INTO/TABLE/…). Column declarations
                # in CREATE lists, unqualified column refs, and
                # `alias.col` qualifiers share the lexical namespace but
                # never sit in these positions, so they stay untouched
                # (a global word-boundary rewrite mangled them — e.g. a
                # `status String` column while a `<db>.status` table
                # existed).
                def _base(m: re.Match) -> str:
                    kw = m.group(1).upper()
                    if kw in ("FROM", "JOIN") and re.match(
                        r"\s*\(", m.string[m.end() :]
                    ):
                        # FROM/JOIN name( … ) is a table FUNCTION call
                        # (numbers/merge/file/…), not a table reference
                        return m.group(0)
                    before = m.string[: m.start()]
                    if kw == "TO" and re.search(
                        r"(?i)\bRENAME\s+COLUMN\s+\w+\s*$", before
                    ):
                        return m.group(0)  # new COLUMN name, not a table
                    if kw == "AND" and not re.match(
                        r"\s*EXCHANGE\b", m.string, re.IGNORECASE
                    ):
                        return m.group(0)  # boolean AND, not EXCHANGE's 2nd operand
                    return m.group(0)[: -len(m.group(2))] + f"{cur}__{m.group(2)}"

                head = _sub_outside_quotes(
                    re.compile(
                        rf"\b(FROM|JOIN|INTO|TABLES?|TO|AND|EXISTS|DICTIONARY|VIEW)"
                        rf"\s+({balts})\b(?![.\w])",
                        re.IGNORECASE,
                    ),
                    _base,
                    head,
                )
                # comma-separated FROM lists (`FROM movies, genres` — the
                # old-style cross join): rewrite each member's table word;
                # aliases and clause keywords are never consumed
                _stop = (
                    r"(?!(?i:JOIN|WHERE|GROUP|ORDER|LIMIT|ON|USING|LEFT|RIGHT|"
                    r"INNER|FULL|CROSS|ANY|ASOF|PASTE|SEMI|ANTI|GLOBAL|SETTINGS|"
                    r"UNION|HAVING|PREWHERE|FINAL|AS|FORMAT|INTO)\b)"
                )

                def _fromlist(m: re.Match) -> str:
                    items = m.group(2).split(",")
                    out = [
                        re.sub(
                            rf"^(\s*)({balts})\b(?![.\w])",
                            lambda t: f"{t.group(1)}{cur}__{t.group(2)}",
                            item,
                        )
                        for item in items
                    ]
                    return m.group(1) + ",".join(out)

                _item = rf"\w+(?:\s+AS\s+\w+|\s+{_stop}\w+)?"
                head = _sub_outside_quotes(
                    re.compile(
                        rf"(\bFROM\s+)({_item}(?:\s*,\s*{_item})+)",
                        re.IGNORECASE,
                    ),
                    _fromlist,
                    head,
                )
                # `<base>.<col>` qualified column refs: the qualifier is
                # the TABLE name (CH lets you qualify by table name under
                # USE), so it mangles with it — the column part is never
                # touched. Runs outside quotes; `db.table` forms were
                # already consumed by the known-db pass above.
                head = _sub_outside_quotes(
                    re.compile(rf"(?<![\w.])({balts})\.(?=\w)"),
                    lambda m: f"{cur}__{m.group(1)}.",
                    head,
                )
                # DESCRIBE/DESC take the name statement-initially only —
                # matching `DESC` mid-statement would hit ORDER BY … DESC
                head = re.sub(
                    rf"^(\s*(?:DESCRIBE|DESC)(?:\s+TABLE)?\s+)({balts})\b(?![.\w])",
                    lambda m: f"{m.group(1)}{cur}__{m.group(2)}",
                    head,
                    flags=re.IGNORECASE,
                )
            # CREATE under the current database: the target doesn't exist
            # yet, so the base-name pass can't see it — prefix explicitly
            # (CH creates unqualified DDL targets in the current db)
            mangled = tuple(f"{d}__" for d in self._databases if d != "default")

            def _cre(m: re.Match) -> str:
                return (
                    m.group(0)
                    if m.group(2).startswith(mangled)
                    else f"{m.group(1)}{cur}__{m.group(2)}"
                )

            head = re.sub(
                r"^(\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?"
                r"(?:TABLE|DICTIONARY|MATERIALIZED\s+VIEW|VIEW)\s+"
                r"(?:IF\s+NOT\s+EXISTS\s+)?)(\w+)\b",
                _cre,
                head,
                flags=re.IGNORECASE,
            )
        return head + data

    def tables_in_database(self, db: str) -> list[str]:
        """Base table names registered under ``db`` (SHOW TABLES FROM /
        system.tables surface). ``default`` owns every flat name that
        doesn't carry another database's mangle prefix."""
        db = db.lower()
        others = [d for d in self._databases if d != "default"]
        if db == "default":
            return sorted(
                n for n in self.tables if not any(n.startswith(d + "__") for d in others)
            )
        return sorted(
            n[len(db) + 2 :] for n in self.tables if n.startswith(db + "__")
        )

    def _split_db(self, name: str) -> tuple[str, str]:
        """Mangled flat name → (database, base name)."""
        for d in sorted(self._databases, key=len, reverse=True):
            if d != "default" and name.startswith(d + "__"):
                return d, name[len(d) + 2 :]
        return "default", name

    def _values_frame(self, name: str, values_clause: str, cols: list[str] | None = None) -> DataFrame:
        """Rows from ``VALUES (…), (…)``, aligned to the table's DECLARED
        column order and types. The live view's order can differ (a
        partitioned parquet read appends partition columns last), so
        positional rename must follow the DDL, not the view.

        With an explicit column list (``INSERT INTO t (a, b) VALUES``),
        omitted columns are filled with their ``DEFAULT expr``
        (lecture_12.md:29-39) or the CH type-zero default (0 / '' /
        epoch — non-nullable columns have no NULL to fall back to).
        MATERIALIZED columns are never writable; they are computed in
        :meth:`insert`.
        """
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        td = self.tables[name]
        # CH VALUES literals use CH syntax too — `[1,2]` arrays, (a, b)
        # tuples — so the clause goes through the same literal rewrites
        # as a SELECT (found by the r11 dialect fuzz: INSERT … VALUES
        # with an array literal parse-errored while SELECT [1,2] worked)
        from otus_clickhouse_spark.functions.dialect import _rewrite_array_literals

        vals = self.spark.sql(f"SELECT * FROM {_rewrite_array_literals(values_clause)}")
        ddl = td.settings.get("schema")
        if not ddl:
            return vals.toDF(*(cols or self.table(name).columns))
        st = StructType.fromDDL(ddl)
        mat = td.settings.get("materialized", {})
        writable = [f for f in st.fields if f.name not in mat]
        if cols is None:
            cols = [f.name for f in writable]
        vals = vals.toDF(*cols)
        defaults = td.settings.get("defaults", {})
        out = []
        for f in writable:
            if f.name in cols:
                out.append(_enum_norm(td, f.name, F.col(f.name).cast(f.dataType)))
            elif f.name in defaults:
                out.append(F.expr(defaults[f.name]).cast(f.dataType).alias(f.name))
            elif f.nullable:
                out.append(F.lit(None).cast(f.dataType).alias(f.name))
            else:
                out.append(_zero_default(f.dataType).alias(f.name))
        return vals.select(*out)

    def _format_frame(
        self, name: str, fmt: str, data: str, cols: list[str] | None = None
    ) -> DataFrame:
        """Frame from ``INSERT INTO t FORMAT CSV\\n<data>`` inline data
        (CH's HTTP/CLI bulk-insert shape; the Airflow lab's etl.py pushes
        a whole CSV per statement this way). The block is spooled to a
        temp file and read through the same format map as file() — the
        parse runs in Spark, typed against the DECLARED writable schema,
        so an HTTP client and a file() load produce identical rows.
        Insert blocks are client-request-sized (CH buffers them in
        memory too); TB-scale loads go through INSERT SELECT FROM
        file()/s3() instead."""
        import tempfile

        from pyspark.sql.types import StructType

        from otus_clickhouse_spark.sources.readers import _reader

        td = self.tables[name]
        ddl = td.settings.get("schema")
        mat = td.settings.get("materialized", {}) if ddl else {}
        st = StructType.fromDDL(ddl) if ddl else self.table(name).schema
        writable = [f for f in st.fields if f.name not in mat]
        if cols is not None:
            # the parse schema must follow the STATEMENT's column order,
            # not the declared one — `INSERT INTO t (name, id)` binds the
            # first CSV field to `name` even when `id` is declared first
            by_name = {f.name: f for f in writable}
            unknown = [c for c in cols if c not in by_name]
            if unknown:
                raise KeyError(f"unknown or non-writable column(s) in INSERT: {unknown}")
            writable = [by_name[c] for c in cols]
        sub = StructType(writable)
        with tempfile.NamedTemporaryFile(
            "w", suffix=".dat", delete=False, encoding="utf-8"
        ) as f:
            f.write(data)
            spool = f.name
        try:
            # eager block materialization: insert blocks are
            # client-request-sized, and pinning the rows here lets the
            # spool file be unlinked immediately (Buffer/Memory engines
            # would otherwise hold a lazy reference to it forever)
            df = _reader(self.spark, fmt, schema=sub).load(spool).localCheckpoint(eager=True)
        finally:
            os.unlink(spool)
        if cols is not None and set(cols) != {fld.name for fld in st.fields}:
            # partial column list → route through the DEFAULT-filling
            # VALUES alignment by reusing its field logic
            return self._values_frame_from(name, df, cols)
        # full set (possibly permuted statement order) → land in declared order
        return df.select(*[f.name for f in st.fields if f.name not in mat])

    def _values_frame_from(self, name: str, vals: DataFrame, cols: list[str]) -> DataFrame:
        """Align an already-parsed frame carrying a PARTIAL column list to
        the declared schema, filling DEFAULT/zero columns (shared by the
        FORMAT-data insert path)."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        td = self.tables[name]
        st = StructType.fromDDL(td.settings["schema"])
        mat = td.settings.get("materialized", {})
        defaults = td.settings.get("defaults", {})
        out = []
        for f in st.fields:
            if f.name in mat:
                continue
            if f.name in cols:
                out.append(_enum_norm(td, f.name, F.col(f.name).cast(f.dataType)))
            elif f.name in defaults:
                out.append(F.expr(defaults[f.name]).cast(f.dataType).alias(f.name))
            elif f.nullable:
                out.append(F.lit(None).cast(f.dataType).alias(f.name))
            else:
                out.append(_zero_default(f.dataType).alias(f.name))
        return vals.select(*out)

    def _align_positional(self, name: str, df: DataFrame) -> DataFrame:
        """``INSERT INTO t SELECT …`` with no column list maps SELECT
        expressions to table columns by POSITION, like ClickHouse
        (lecture_07.md:516-524 inserts unaliased ``…State`` expressions
        into typed state columns). Rename + cast to the declared
        writable schema when arities match; otherwise pass through."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        td = self.tables.get(name)
        ddl = td.settings.get("schema") if td else None
        if not ddl:
            return df
        mat = td.settings.get("materialized", {})
        writable = [f for f in StructType.fromDDL(ddl).fields if f.name not in mat]
        if len(df.columns) != len(writable):
            return df
        df = df.toDF(*[f.name for f in writable])
        return df.select(
            *[_enum_norm(td, f.name, F.col(f.name).cast(f.dataType)) for f in writable]
        )

    def execute_script(self, script: str, **params) -> list:
        """Run a multi-statement SQL script (homeworks/scripts/hw02.sql
        shape): statements split on top-level semicolons (quote- and
        comment-aware), each routed through :meth:`execute`. Returns
        the per-statement results."""
        results = []
        for stmt in _split_statements(script):
            results.append(self.execute(stmt, **params))
        return results

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def drop_table(self, name: str) -> None:
        """DROP TABLE: deregister AND delete managed data (ClickHouse
        drops the table's parts). Only warehouse-managed directories are
        removed — paths registered over external parquet (register_table
        on user data) are never touched, matching DROP on a table whose
        storage the server doesn't own."""
        self.spark.catalog.dropTempView(name)
        # the engine-semantics companion view (registered by register_table
        # for Replacing/Summing/Collapsing engines) must not outlive the
        # base table — it points at the deleted files
        self.spark.catalog.dropTempView(f"{name}__final")
        # vector_similarity indexes die with the table (ADVICE r11: a
        # re-created same-name table must not inherit stale lists)
        self.refresh_vector_indexes(name, "drop")
        # an MV is dropped BY NAME like any table (CH: MVs live in the
        # table namespace); detach its trigger or the next insert into
        # its source would fire a dangling transform. Source-keyed
        # attachments survive a SOURCE drop, like CH (recreating the
        # source re-arms the view).
        for src, mvs in list(self._mvs.items()):
            kept = [mv for mv in mvs if mv.name != name]
            if kept:
                self._mvs[src] = kept
            else:
                self._mvs.pop(src, None)
        td = self.tables.pop(name, None)
        # an unregistered name may still have an orphaned managed dir
        # from an earlier engine over the same warehouse
        path = td.path if (td is not None and td.path) else os.path.join("spark-warehouse", name)
        warehouse = os.path.abspath("spark-warehouse")
        cold = list(td.settings.get("cold_volumes", {}).values()) if td else []
        for p in [os.path.abspath(path)] + [os.path.abspath(c) for c in cold]:
            if p.startswith(warehouse + os.sep) and os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)

    # ------------------------------------------------------------------- SQL
    def sql(self, text: str, **params) -> DataFrame:
        """Run SQL; accepts a ClickHouse-flavoured dialect.

        Dialect handling: ``FROM t FINAL`` → the engine-semantics view
        (lecture_07.md:465-481); ClickHouse function names are available
        as registered SQL UDFs (functions/clickhouse.py); ``{name:Type}``
        query parameters (lectures/lecture_03.md:303-307) bind from
        ``params``.
        """
        from otus_clickhouse_spark.functions.dialect import translate

        if len(self._databases) > 1 or self.current_database != "default":
            # non-default namespaces exist: resolve db.table qualifiers
            # (and current-db unqualified names) to mangled flat names
            # before any rewrite looks at identifiers. Idempotent —
            # execute() may already have resolved.
            text = self._strip_known_db_prefixes(text)
        served = self.projections.try_rewrite_sql(text)
        if served is not None:
            return served
        if re.search(r"\bASOF\s+(LEFT\s+)?JOIN\b", text, re.IGNORECASE):
            from otus_clickhouse_spark.operators.asof import rewrite_asof_sql

            rewritten = rewrite_asof_sql(self, text)
            if rewritten is not None:
                text = rewritten
        if re.search(
            r"\b(?:ANY\s+(?:LEFT\s+|INNER\s+)?|(?:LEFT|INNER)\s+ANY\s+)JOIN\b",
            text,
            re.IGNORECASE,
        ):
            from otus_clickhouse_spark.operators.joins import rewrite_any_join_sql

            rewritten = rewrite_any_join_sql(self, text)
            if rewritten is not None:
                text = rewritten
        # *Cluster variants (lecture_11.md:411 fileCluster; s3Cluster etc.):
        # CH fans the read across cluster nodes — Spark's reader already
        # parallelizes over the executor pool, so the cluster arg drops
        text = re.sub(
            r"\b(file|s3|url|hdfs)Cluster\s*\(\s*'?[\w.-]+'?\s*,\s*",
            r"\1(",
            text,
            flags=re.IGNORECASE,
        )
        # FROM format(Fmt, <inline literal>) table function
        # (lecture_03.md:358-366) — materialize as a temp view; the
        # scalar format() string function is untouched (FROM-anchored)
        fim = re.search(
            r"\bFROM\s+(format\s*\(\s*(\w+)\s*,\s*('(?:[^']|'')*'|\$\$.*?\$\$)\s*\))",
            text,
            re.IGNORECASE | re.DOTALL,
        )
        if fim:
            import uuid as _uuid

            view = f"__fmt_inline_{_uuid.uuid4().hex[:8]}"
            self.format_inline_table(fim.group(2), fim.group(3)).createOrReplaceTempView(view)
            text = text[: fim.start(1)] + view + text[fim.end(1) :]
        fm = _FILE_FN_RE.search(text)
        if fm:
            # file/s3/gcs/url/hdfs table functions in raw SQL (S2-S6;
            # lecture_11.md:404-415, hw02.sql:43-46): resolve to a reader
            # view. s3/gcs/hdfs are path-scheme concerns of the same reader.
            from otus_clickhouse_spark.sources.readers import file_table, url_table

            fn, path, fmt, structure = fm.groups()
            reader = url_table if fn.lower() == "url" else file_table
            view = "__tf_" + re.sub(r"[^\w]+", "_", path)[-48:].strip("_")
            reader(
                self.spark, path, fmt or "Parquet", structure
            ).createOrReplaceTempView(view)
            text = text[: fm.start()] + f"FROM {view}" + text[fm.end() :]
        jm = _EXT_FN_RE.search(text)
        if jm:
            # postgresql()/mysql()/jdbc() table functions in raw SQL
            # (S15/S16; hw19.md:44-48), positional or named-collection
            # (D14) form → JDBC reader view
            from otus_clickhouse_spark.functions.ddl import _split_args
            from otus_clickhouse_spark.sources.readers import (
                external_table,
                resolve_external_conf,
            )

            kind, rawargs = jm.group(1).lower(), jm.group(2)
            conf = resolve_external_conf(
                kind, _split_args(rawargs, many=True), self._named_collections
            )
            view = "__ext_" + re.sub(r"[^\w]+", "_", conf.get("table", "t"))[-40:].strip("_")
            external_table(self.spark, conf).createOrReplaceTempView(view)
            text = text[: jm.start()] + f"FROM {view}" + text[jm.end() :]
        gm = _GENRAND_FN_RE.search(text)
        if gm:
            # generateRandom('structure'[, seed]) (S10; lecture_08.md:232):
            # lazily-generated rows — the query's LIMIT stops generation
            from otus_clickhouse_spark.sources.readers import generate_random

            structure, seed = gm.group(1), gm.group(2)
            view = "__genrand_" + re.sub(r"[^\w]+", "_", structure)[:40].strip("_")
            generate_random(
                self.spark, structure, 10_000_000, int(seed) if seed else None
            ).createOrReplaceTempView(view)
            text = text[: gm.start()] + f"FROM {view}" + text[gm.end() :]
        # system.one: the 1-row dummy table behind `SELECT 1`
        text = re.sub(
            r"\bsystem\.one\b", "(SELECT 1 AS dummy)", text, flags=re.IGNORECASE
        )
        # getMacro('name') (hw09.md:295-325): config-macro lookup — a
        # per-server constant, so it folds to a literal at translate time
        text = re.sub(
            r"\bgetMacro\s*\(\s*'(\w+)'\s*\)",
            lambda gm: "'" + self.macros.get(gm.group(1), "") + "'",
            text,
        )
        # system.* metadata tables in raw SQL (D8; lecture_16.md:60-98,
        # lecture_20.md:296-478 monitoring queries): materialize the
        # engine-maintained frame as a view at query time. Also unwraps
        # remote()/cluster()/clusterAllReplicas(c, system.x) — on Spark
        # the driver already sees global metadata, so the fan-out is a
        # no-op (lecture_16.md:90-98).
        text = re.sub(
            r"\b(?:remote|cluster(?:AllReplicas)?)\s*\(\s*[^,()]+,\s*(system\.\w+)\s*\)",
            r"\1",
            text,
            flags=re.IGNORECASE,
        )
        for sysname in set(re.findall(r"\bsystem\.(\w+)\b", text)):
            method = getattr(self, f"system_{sysname}", None)
            if method is None:
                continue
            # access-control metadata requires an explicit grant, exactly
            # the denial hw12.md:53-61 demonstrates (most other system
            # tables stay implicitly readable, like CH's introspection set)
            if (
                sysname in _PROTECTED_SYSTEM_TABLES
                and self.current_user != "default"
                and not self._granted(self.current_user, "SELECT", sysname)
            ):
                raise PermissionError(
                    f"ACCESS_DENIED: user {self.current_user} lacks the grant "
                    f"SELECT ON system.{sysname}"
                )
            view = f"__system_{sysname}"
            method().createOrReplaceTempView(view)
            text = re.sub(rf"\bsystem\.{sysname}\b", view, text)
        # COLUMNS('regex') dynamic projection (P1; lecture_02.md course
        # usage `select columns('key') from system.tables`): expand to the
        # FROM relation's matching column names at translate time
        while True:
            colm = re.search(r"\bCOLUMNS\s*\(\s*'([^']+)'\s*\)", text, re.IGNORECASE)
            if not colm:
                break
            fmm = re.search(r"\bFROM\s+`?(\w+)`?", text, re.IGNORECASE)
            if not fmm:
                raise ValueError("COLUMNS('re') needs a resolvable FROM table")
            cols = self.spark.table(fmm.group(1)).columns
            pat = re.compile(colm.group(1))
            matched = [c for c in cols if pat.search(c)]
            if not matched:
                raise ValueError(f"COLUMNS({colm.group(1)!r}) matches no columns")
            text = text[: colm.start()] + ", ".join(matched) + text[colm.end() :]
        mm = _MERGE_FN_RE.search(text)
        if mm:
            # merge([db,] 'regex') table function (S8; lecture_09.md:589-651)
            # → union view of matching registered tables + `_table` column
            from otus_clickhouse_spark.sources.readers import merge_tables

            regex = mm.group(1)
            view = "__merge_" + re.sub(r"[^\w]+", "_", regex).strip("_")
            merge_tables(self.spark, regex).createOrReplaceTempView(view)
            text = text[: mm.start()] + f"FROM {view}" + text[mm.end() :]
        pm = _PASTE_SQL_RE.search(text)
        if pm:
            # PASTE JOIN (J8; lecture_10.md:15): zip the two relations
            # positionally and run the rest of the query over the view
            from otus_clickhouse_spark.operators.joins import paste_zip

            def rel(r: str) -> DataFrame:
                return self.sql(r[1:-1]) if r.startswith("(") else self.table(r)

            view = f"__paste_{abs(hash(pm.group(0))) % 10**8}"
            paste_zip(rel(pm.group(1)), rel(pm.group(2))).createOrReplaceTempView(view)
            text = text[: pm.start()] + f"FROM {view}" + text[pm.end() :]
        limit_by = None
        lb = _LIMIT_BY_RE.search(text)
        if lb and lb.group(2).strip():
            # LIMIT n BY cols [LIMIT m] — per-group top-n (ClickHouse
            # clause; same family as lecture_10's per-key dedup tricks).
            # Planned as one window shuffle partitioned by the BY keys.
            from otus_clickhouse_spark.functions.dialect import _split_top_commas

            n_per = int(lb.group(1))
            tail_limit = int(lb.group(3)) if lb.group(3) else None
            by_items = [s.strip() for s in _split_top_commas(lb.group(2))]
            om = None
            for cand in _ORDER_ITEMS_RE.finditer(text):
                if not text[cand.end() : lb.start()].strip():
                    om = cand  # the ORDER BY directly before LIMIT n BY
            order_items = (
                [s.strip() for s in _split_top_commas(om.group(1))] if om else []
            )
            text = text[: om.start() if om else lb.start()]
            limit_by = (n_per, by_items, order_items, tail_limit)
        dicts = {n: d.key for n, d in self._dictionaries.items()}
        fill = _WITH_FILL_RE.search(text)
        if fill:
            text = text[: fill.start()] + f"ORDER BY {fill.group(1)}" + text[fill.end() :]
        translated = translate(text, self.tables, dicts, self._sql_macros)
        try:
            df = self.spark.sql(translated, args=params or None)
        except Exception as exc:
            # Type-directed fixups the text layer can't decide statically
            # (CH polymorphic length() on arrays; decimal array indexes
            # in element_at): retry with minimal flip sets — analysis-
            # only cost, error path only (r11 dialect fuzz findings).
            df = self._retry_analysis_fixups(translated, exc, params)
        if fill:
            from otus_clickhouse_spark.operators.with_fill import with_fill

            col, _asc, lo, hi, step, interp_raw = fill.groups()
            interp = None
            if interp_raw is not None:
                from otus_clickhouse_spark.functions.dialect import _split_top_commas

                # INTERPOLATE (c [AS expr], …): no AS = carry previous value
                interp = {}
                for item in _split_top_commas(interp_raw):
                    am = re.match(r"(?is)^\s*(\w+)(?:\s+AS\s+(.+))?$", item.strip())
                    if am:
                        interp[am.group(1)] = am.group(2).strip() if am.group(2) else None

            def _val(tok):
                if tok is None:
                    return None
                if tok.startswith("{"):  # {p:Type} param form
                    tok = ":" + tok[1:].split(":")[0]
                if tok.startswith(":"):
                    return params[tok[1:]]
                try:
                    return int(tok)
                except ValueError:
                    return float(tok) if re.fullmatch(r"-?\d+\.\d*", tok) else tok.strip("'\"")

            df = with_fill(
                df, col, step=_val(step), start=_val(lo), stop=_val(hi), interpolate=interp
            )
            df = df.orderBy(F_desc(col) if (_asc or "").upper() == "DESC" else col)
        if limit_by:
            df = _apply_limit_by(df, *limit_by)
        if self.session_settings.get("join_use_nulls") == "0" and re.search(
            r"\b(LEFT|RIGHT|FULL)\s+(OUTER\s+)?JOIN\b", text, re.IGNORECASE
        ):
            df = self._fill_join_defaults(df, text)
        return df

    def _retry_analysis_fixups(
        self, translated: str, exc: Exception, params, attempts: list | None = None
    ):
        """Type-directed repairs after a failed analysis — the dialect
        layer is textual and cannot know argument types, so two CH
        constructs only resolve once Catalyst has typed them:

        - polymorphic ``length()``: CH accepts strings AND arrays; Spark
          splits it (length/size) → flip ``length(`` to ``size(``;
        - array subscripts with non-INT numeric indexes: CH UInt64 lands
          as DECIMAL(20,0); Spark's element_at wants INT → wrap the
          index in CAST(… AS INT) (maps keep their key type — only
          flipped occurrences change).

        All-occurrences flip first (the common case — one analysis),
        then minimal subsets, under a TOTAL budget of ``attempts``
        analyses across recursion (ADVICE r11: unbounded 2^n × cross-
        class recursion added hundreds of analysis passes to queries
        that were never fixable). If nothing lands, the ORIGINAL error
        is re-raised — the last combo's error is noise. (The error
        message quotes the RESOLVED plan, so a textual match against
        the source can't locate the offender directly.)"""
        import itertools

        msg = str(exc)
        fixers = []
        if "UNEXPECTED_INPUT_TYPE" in msg and 'resolve "length(' in msg:
            spots = [m.start() for m in re.finditer(r"\blength\(", translated)]

            def flip_len(txt: str, p: int) -> str:
                return txt[:p] + "size(" + txt[p + len("length(") :]

            fixers.append((spots, flip_len))
        if "UNEXPECTED_INPUT_TYPE" in msg and 'resolve "element_at(' in msg:
            spots = [m.start() for m in re.finditer(r"\belement_at\(", translated)]

            def flip_idx(txt: str, p: int) -> str:
                # wrap element_at's SECOND argument in CAST(… AS INT)
                depth, i, comma = 0, p + len("element_at("), -1
                start_args = i
                while i < len(txt):
                    c = txt[i]
                    if c == "(":
                        depth += 1
                    elif c == ")":
                        if depth == 0:
                            break
                        depth -= 1
                    elif c == "," and depth == 0:
                        comma = i
                    elif c in "'\"":
                        nxt = txt.find(c, i + 1)
                        i = nxt if nxt != -1 else len(txt) - 1
                    i += 1
                if comma == -1 or i >= len(txt):
                    return txt
                sub = txt[comma + 1 : i].strip()
                return f"{txt[:comma]}, CAST({sub} AS INT){txt[i:]}"

            fixers.append((spots, flip_idx))
        if not fixers:
            raise exc
        # 96 reaches r<=3 subsets of 8 spots (1+8+28+56=93) — the fuzz
        # corpus' worst real case is a 12-expression batch mixing
        # string- and array-length at 7-8 sites needing a 2-flip subset
        budget = attempts if attempts is not None else [96]
        for spots, flip in fixers:
            if not spots or len(spots) > 8:
                continue
            # all-occurrences first, then minimal subsets ascending
            orders = [tuple(range(len(spots)))] + [
                combo
                for r in range(1, len(spots))
                for combo in itertools.combinations(range(len(spots)), r)
            ]
            for combo in orders:
                if budget[0] <= 0:
                    raise exc
                budget[0] -= 1
                txt = translated
                for i in sorted(combo, reverse=True):
                    txt = flip(txt, spots[i])
                try:
                    return self.spark.sql(txt, args=params or None)
                except Exception as e2:
                    # a DIFFERENT fixable class may surface once the
                    # first one is repaired (length + subscript in
                    # one query) — recurse, sharing the budget
                    m2 = str(e2)
                    other = ('resolve "element_at(' in m2
                             if 'resolve "length(' in msg
                             else 'resolve "length(' in m2)
                    if "UNEXPECTED_INPUT_TYPE" in m2 and other:
                        try:
                            return self._retry_analysis_fixups(
                                txt, e2, params, attempts=budget
                            )
                        except Exception:
                            continue
        raise exc

    def _fill_join_defaults(self, df: DataFrame, text: str) -> DataFrame:
        """J16 ``join_use_nulls = 0`` (lecture_10.md settings surface):
        ClickHouse's default fills non-matched outer-join rows with TYPE
        DEFAULTS (0 / '' / epoch) instead of NULLs — in CH a NULL can
        only appear there for Nullable columns. Mirror that contract:
        fill defaults for output columns that some referenced table
        declares NOT NULL (Nullable columns keep their NULLs). The
        engine's baseline is the SQL-standard ``join_use_nulls = 1``;
        this path activates on the explicit SET."""
        non_nullable: set[str] = set()
        for tname in self._referenced_tables(text):
            schema = self.tables[tname].settings.get("schema", "")
            for coldef in schema.split(","):
                if "NOT NULL" in coldef.upper():
                    non_nullable.add(coldef.strip().split()[0])
        fills: dict = {}
        for f in df.schema.fields:
            if f.name not in non_nullable:
                continue
            t = f.dataType.simpleString()
            if t in ("string",):
                fills[f.name] = ""
            elif t.startswith(("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")):
                fills[f.name] = 0
        return df.na.fill(fills) if fills else df

    def add_projection(self, name: str, table: str, group_keys, aggs) -> None:
        """ADD/MATERIALIZE PROJECTION (lecture_13.md:187-242): build the
        pre-aggregate; matching Engine.sql aggregates are then silently
        served from it (try_rewrite_sql)."""
        from otus_clickhouse_spark.plans.projections import Projection

        self.projections.add(
            self.table(table),
            Projection(name=name, table=table, group_keys=tuple(group_keys), aggs=dict(aggs)),
        )

    def explain(self, text: str, mode: str = "formatted") -> str:
        """EXPLAIN [PLAN] (D7; lectures/lecture_21.md:399-452)."""
        df = self.sql(text)
        return df._sc._jvm.PythonSQLUtils.explainString(  # same path .explain() prints
            df._jdf.queryExecution(), mode
        )

    def format_inline_table(self, fmt: str, raw: str) -> DataFrame:
        """``format(Format, <data>)`` table function (lecture_03.md:
        358-366): parse an inline literal through the same format map as
        ``file()`` with schema inference. ``Values`` data runs through
        Spark's native VALUES parser with CH's ``c1..cN`` names; other
        formats spool to a temp file for the standard reader. Inline
        literals are statement-sized by definition — TB-scale data goes
        through file()/s3()."""
        import tempfile

        raw = raw.strip()
        if raw.startswith("$$") and raw.endswith("$$"):
            data = raw[2:-2]
        elif raw[:1] in "'\"" and raw[-1:] == raw[:1]:
            data = raw[1:-1].replace(raw[0] * 2, raw[0])
        else:
            data = raw
        if fmt.lower() == "values":
            df = self.spark.sql(f"SELECT * FROM (VALUES {data})")
            return df.toDF(*[f"c{i + 1}" for i in range(len(df.columns))])
        from otus_clickhouse_spark.sources.readers import _reader

        with tempfile.NamedTemporaryFile(
            "w", suffix=".dat", delete=False, encoding="utf-8"
        ) as f:
            f.write(data)
            spool = f.name
        try:
            return _reader(self.spark, fmt).load(spool).localCheckpoint(eager=True)
        finally:
            os.unlink(spool)

    def explain_estimate(self, text: str) -> list:
        """``EXPLAIN ESTIMATE`` (D7; lecture_21.md's estimate mode): CH
        answers (database, table, parts, rows, marks) per MergeTree
        table from part metadata WITHOUT running the query. The parquet
        analogue reads footers only: parts = data files, rows = footer
        row counts, marks = row groups (the granule pointer analogue —
        one min/max pruning unit each)."""
        import pyarrow.parquet as pq

        rows = []
        for name in sorted(self._referenced_tables(text)):
            td = self.tables.get(name)
            if td is None or not td.path or not os.path.exists(td.path):
                continue
            files = []
            if os.path.isfile(td.path):
                files = [td.path]
            else:
                for root, _, fns in os.walk(td.path):
                    files.extend(
                        os.path.join(root, f) for f in fns if f.endswith(".parquet")
                    )
            n_rows = 0
            marks = 0
            for f in files:
                meta = pq.ParquetFile(f).metadata
                n_rows += meta.num_rows
                marks += meta.num_row_groups
            db, base = self._split_db(name)
            rows.append((db, base, len(files), n_rows, marks))
        from pyspark.sql import Row

        shape = Row("database", "table", "parts", "rows", "marks")
        return [shape(*r) for r in rows]

    def run_query(self, text: str, **params) -> tuple[list[str], list]:
        """Execute SQL eagerly with full bookkeeping; returns
        ``(columns, rows)`` — the shape interface renderers need.

        Records the query in the query log (≈ system.query_log,
        lectures/lecture_20.md:619-654): query text, wall duration,
        result rows, exception type. Each run gets a query_id and
        executes under a Spark job group named by it, so
        ``system.processes`` can list it and ``KILL QUERY WHERE
        query_id = '…'`` can cancel its jobs from another thread (M7;
        lecture_16.md:328-336). The CLI and HTTP interfaces route
        through here so their queries are listed and killable too."""
        import time
        import uuid

        self.check_access("SELECT", self._referenced_tables(text))
        t0 = time.time()
        try:
            self._check_quota("queries")
            # pre-flight: a user whose result_rows quota window is already
            # exhausted fails BEFORE running (CH accumulates and rejects)
            self._check_quota("result_rows", weight=0)
        except Exception as exc:
            # a quota rejection is still a logged, error-counted query in
            # the reference (system.query_log records ExceptionBeforeStart
            # rows and the errors quota accumulates them)
            self._bump("FailedQuery")
            self._quota_usage.setdefault(self.current_user, []).append(
                (time.time(), "errors", 1)
            )
            self._query_log.append(
                self._query_log_row(
                    text, t0, -1, type(exc).__name__, event="ExceptionBeforeStart"
                )
            )
            raise
        qid = uuid.uuid4().hex[:16]
        self._processes[qid] = (text, t0)
        sc = self.spark.sparkContext
        sc.setJobGroup(qid, text[:200], interruptOnCancel=True)
        self._bump("Query")
        self._bump("SelectQuery")
        try:
            df = self.sql(text, **params)
            rows = self._collect_capped(df)
        except Exception as exc:  # logged like query_log's exception column
            self._bump("FailedSelectQuery")
            self._quota_usage.setdefault(self.current_user, []).append(
                (time.time(), "errors", 1)
            )
            self._query_log.append(
                self._query_log_row(text, t0, -1, type(exc).__name__)
            )
            raise
        finally:
            self._processes.pop(qid, None)
            sc.setJobGroup(None, None)
        self._record_quota_usage("result_rows", len(rows))
        self._query_log.append(self._query_log_row(text, t0, len(rows), ""))
        return df.columns, rows

    def _collect_capped(self, df: DataFrame) -> list:
        """Driver-side collect honoring ``max_result_rows`` /
        ``result_overflow_mode`` (lecture_18.md:443-555 settings
        surface). When the setting is active the collect is BOUNDED at
        limit+1 rows — closing the one previously unbounded driver
        materialization on the interactive path. ``throw`` (the CH
        default) raises TOO_MANY_ROWS; ``break`` truncates at exactly
        the limit (CH returns the partial result)."""
        limit = int(self.session_settings.get("max_result_rows", 0) or 0)
        if limit <= 0:
            return df.collect()
        rows = df.limit(limit + 1).collect()
        if len(rows) > limit:
            mode = self.session_settings.get("result_overflow_mode", "throw")
            if mode == "break":
                return rows[:limit]
            raise RuntimeError(
                f"TOO_MANY_ROWS: query result exceeds max_result_rows = "
                f"{limit} (result_overflow_mode = 'throw')"
            )
        return rows

    def run(self, text: str, **params):
        """:meth:`run_query` returning just the rows (Python-API path)."""
        return self.run_query(text, **params)[1]

    def _query_log_row(
        self, text: str, t0: float, n_rows: int, exc: str, event: str | None = None
    ) -> tuple:
        """One system.query_log row (lecture_20.md:296-478 column set;
        hw14.md's dashboards filter on type/event_time and fold the
        touched-tables array). ``event`` overrides the type column —
        pre-flight rejections (quota) log as ``ExceptionBeforeStart``,
        matching the reference's before-start/while-processing split
        (lecture_20.md:623; ADVICE r11)."""
        import datetime as _dt
        import time

        now = _dt.datetime.now()
        touched = sorted(
            name for name in self.tables
            if re.search(rf"\b{re.escape(name)}\b", text)
        )
        return (
            text,
            event or ("QueryFinish" if not exc else "ExceptionWhileProcessing"),
            now,
            now.date(),
            time.time() - t0,
            n_rows,
            exc,
            touched,
        )

    def _bump(self, event: str, n: int = 1) -> None:
        self._events[event] = self._events.get(event, 0) + n

    def kill_query(self, query_id: str) -> bool:
        """``KILL QUERY WHERE query_id = '…'`` (M7; lecture_16.md:
        328-336): cancel the job group of a query running in another
        thread. Returns whether the id was live."""
        live = query_id in self._processes
        self.spark.sparkContext.cancelJobGroup(query_id)
        return live

    # ----------------------------------------------------------------- write
    def insert(self, name: str, df: DataFrame, mode: str = "append") -> None:
        """EP3 insert path: sorted/partitioned parquet write (lecture_04.md:9-52).

        Sorting within partitions by the table's ORDER BY reproduces the
        MergeTree property that row-group min/max stats (≈ sparse PK
        index) are selective for ORDER-BY-key predicates. Expression
        partition keys (``PARTITION BY toYYYYMM(dt)``, SURVEY.md §7 hard
        part 6) are materialized as generated ``_p_*`` columns at write
        time, so directory layout — and therefore partition pruning —
        matches the ClickHouse partition key exactly.
        """
        from pyspark.sql import functions as F

        self._bump("InsertQuery")
        self.check_access("INSERT", [name])
        if name in self._buffers:
            buf = self._buffers[name]
            buf.insert(df)
            buf.read().createOrReplaceTempView(name)  # read-through view
            return
        td = self.tables[name]
        if td.engine in ("Memory", "Set"):
            # Memory / Set engines (lecture_09.md:424-496): rows held
            # in RAM — blocks accumulate driver-side, the view is the
            # cached union; Set additionally feeds `IN <table>`
            blocks = self._memory.setdefault(name, [])
            blocks.append(df.localCheckpoint(eager=True))
            from functools import reduce

            union = reduce(DataFrame.unionByName, blocks)
            if td.engine == "Set":
                union = union.distinct()
            # no .cache(): the blocks are already eagerly checkpointed
            # (pinned in memory), and caching the union trips Spark's
            # cache-manager on checkpoints of range()-TVF-derived plans
            # (NoSuchElementException: key not found — seen on
            # `INSERT INTO mem SELECT … FROM numbers(n)`)
            union.createOrReplaceTempView(name)
            for mv in self._mvs.get(name, []):
                mv.process_block(df)
            return
        if td.engine == "Null":
            # Null engine (lecture_13.md:376; hw15.md:9-53): data is
            # discarded but attached MVs still fire — the standard
            # transform-without-landing ingestion pattern
            for mv in self._mvs.get(name, []):
                mv.process_block(df)
            return
        if td.engine == "Kafka":
            # INSERT into a Kafka table PRODUCES (hw17.md "задание со
            # звездочкой"; init.sql:62-79 parsed → to_kafka queue MV):
            # serialize rows per kafka_format and publish to the topic
            self._kafka_produce_frame(td, df)
            return
        if td.engine == "Distributed":
            # write path (lecture_15.md:15-34): shard = key mod shard
            # count; repartition into one partition group per shard —
            # the Spark analogue of routing inserts to shard replicas —
            # then land in the local table
            key = td.settings.get("sharding_key")
            n = td.settings.get("n_shards", 1)
            if key and n > 1:
                df = df.repartition(n, F.pmod(F.expr(key).cast("bigint"), F.lit(n)))
            elif key:
                df = df.repartition(F.expr(key))
            self.insert(td.settings["local_table"], df, mode=mode)
            self._register_distributed(td)  # refresh proxy view + _shard_num
            for mv in self._mvs.get(name, []):
                mv.process_block(df)
            return
        # MATERIALIZED columns: always computed at insert, never writable
        # (lecture_12.md:14-27) — overwrite/add regardless of the input
        for col, expr in td.settings.get("materialized", {}).items():
            df = df.withColumn(col, F.expr(expr))
        block = df  # the inserted block, pre-partition-columns, for MV triggers
        part_cols = []
        for expr in td.partition_by:
            if re.fullmatch(r"[A-Za-z_][\w]*", expr) and expr in df.columns:
                part_cols.append(expr)
            else:
                gen = "_p_" + re.sub(r"[^\w]+", "_", expr).strip("_")
                df = df.withColumn(gen, F.expr(expr))
                part_cols.append(gen)
        if td.order_by:
            df = df.sortWithinPartitions(*[k for k in td.order_by if k in df.columns])
        # LZ4 block compression is ClickHouse's default codec
        # (lecture_02.md compression model) and measurably out-writes
        # snappy on this path (see the bench insert-probe sweep); parquet
        # dictionary encoding stays on for the read side (its row-group
        # dictionaries are the LowCardinality analogue)
        # Parquet per-page CRC32 costs ~15% of write throughput on the
        # insert probe and guards only against silent page corruption —
        # ClickHouse likewise relies on its own compressed-block
        # checksums, and parquet-mr wrote no page CRCs before 1.12, so
        # readers everywhere tolerate their absence. Page size stays at
        # the 1 MB default: the page column-index is the sparse-PK
        # analogue for sub-row-group pruning and larger pages would
        # coarsen it.
        writer = (
            df.write.mode(mode)
            .option("compression", "lz4")
            .option("parquet.page.write-checksum.enabled", "false")
        )
        # parquet bloom filters on the sort key (≈ bloom_filter skipping
        # index, D9/lecture_08.md:99-240): point lookups on ORDER BY
        # columns skip row groups even when min/max ranges overlap
        bloom_cols = {k for k in td.order_by}
        bloom_cols.update(
            expr
            for expr, itype in td.skip_indexes.values()
            if itype.split("(")[0] in ("bloom_filter", "tokenbf_v1", "ngrambf_v1")
        )
        for k in bloom_cols:
            if k in df.columns:
                writer = writer.option(f"parquet.bloom.filter.enabled#{k}", "true")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(td.path)
        self.register_table(td)  # refresh the view over the new file set
        # push the inserted block through attached MVs synchronously,
        # like ClickHouse's PushingToViews (lecture_13.md:160-166);
        # an MV inserting into its target re-triggers that table's MVs,
        # which is exactly the cascade semantics (init.sql:46-79)
        for mv in self._mvs.get(name, []):
            mv.process_block(block)
        # vector_similarity indexes: append ONLY the inserted sliver to
        # the stored IVF lists with the ORIGINAL centroids — O(block),
        # never O(table) (lecture_13.md:187-257 part-build analogy)
        for iname, meta in self.vector_indexes.get(name, {}).items():
            if not meta.get("built"):
                self._maybe_build_vector_index(name, iname)
            else:
                from otus_clickhouse_spark.pipeline.similarity import ivf_append_index

                ivf_append_index(
                    block.select(
                        F.col(meta["id_col"]).alias("vec_id"),
                        F.expr(meta["expr"]).alias("embedding"),
                    ),
                    meta["path"],
                )

    def _maybe_build_vector_index(self, table: str, iname: str) -> bool:
        """Initial build of a vector_similarity index (ADD INDEX on a
        populated table, or the first insert after ADD INDEX on an empty
        one): train the coarse quantizer on the table's current rows and
        persist centroids + lists. No-op until the table has data."""
        from pyspark.sql import functions as F

        meta = self.vector_indexes[table][iname]
        td = self.tables[table]
        if not meta.get("path") and td.path:
            meta["path"] = td.path.rstrip("/") + f".__ivf_{iname}"
        if not meta.get("path") or not td.path or not os.path.exists(td.path):
            return False
        rows = self.table(table).select(
            F.col(meta["id_col"]).alias("vec_id"),
            F.expr(meta["expr"]).alias("embedding"),
        )
        if rows.isEmpty():
            return False
        from otus_clickhouse_spark.pipeline.similarity import ivf_write_index

        ivf_write_index(rows, meta["path"], k=meta["k"], iters=meta["iters"])
        meta["built"] = True
        return True

    def vector_topk(
        self, table: str, iname: str, queries: DataFrame, k: int = 5, nprobe: int = 2
    ) -> DataFrame:
        """Serve ANN top-k from a table's stored vector_similarity index
        (queries: (q_id, qv)); probes nprobe inverted lists via
        partition-pruned reads — no retrain, no corpus scan."""
        from otus_clickhouse_spark.pipeline.similarity import ivf_search_stored

        meta = self.vector_indexes[table][iname]
        if not meta.get("built"):
            raise ValueError(f"vector index {iname} on {table} is empty (no data)")
        return ivf_search_stored(self.spark, meta["path"], queries, k=k, nprobe=nprobe)

    def refresh_vector_indexes(self, name: str, mode: str = "rebuild") -> None:
        """Keep vector_similarity indexes consistent with DML/DDL that
        changes the table's row set (ADVICE r11 + verdict r11 #3 —
        before this, ALTER DELETE/UPDATE/OPTIMIZE/TRUNCATE/DROP left
        stale rows in the stored lists and vector_topk could serve ids
        the table no longer holds). ClickHouse's contract is
        rebuild-on-mutation (lecture_16.md:60-98); the stored-centroid
        variant here skips retraining, so the cost is one assignment
        pass over the surviving rows.

        mode: ``rebuild`` (mutations/OPTIMIZE — reassign surviving rows
        to the STORED centroids and swap the lists), ``truncate`` (drop
        the stored lists, keep the definition; the next insert
        retrains), ``drop`` (remove definitions AND stored data — a
        re-created same-name table must start clean)."""
        from pyspark.sql import functions as F

        metas = self.vector_indexes.get(name)
        if not metas:
            return
        if mode == "drop":
            for meta in self.vector_indexes.pop(name).values():
                if meta.get("path"):
                    shutil.rmtree(meta["path"], ignore_errors=True)
            return
        for meta in metas.values():
            if mode == "truncate" or not meta.get("built"):
                if meta.get("path"):
                    shutil.rmtree(meta["path"], ignore_errors=True)
                meta["built"] = False
                continue
            rows = self.table(name).select(
                F.col(meta["id_col"]).alias("vec_id"),
                F.expr(meta["expr"]).alias("embedding"),
            )
            if rows.isEmpty():
                # mutation emptied the table: no rows to assign — drop
                # the lists; the next insert rebuilds from scratch
                shutil.rmtree(meta["path"], ignore_errors=True)
                meta["built"] = False
                continue
            from otus_clickhouse_spark.pipeline.similarity import ivf_rebuild_lists

            ivf_rebuild_lists(rows, meta["path"])

    # ------------------------------------------------------------------ Kafka
    def _kafka_topic(self, td: "TableDef"):
        from otus_clickhouse_spark.streaming.topics import FileTopic

        topic = td.settings.get("kafka_topic_list", td.name)
        return FileTopic(os.path.join("spark-warehouse", "_kafka"), topic)

    def _kafka_produce_frame(self, td: "TableDef", df: DataFrame) -> None:
        """Serialize a block per ``kafka_format`` and publish it to the
        table's topic (init.sql:62-79 outbound-queue MV). Both paths are
        distributed: a real broker takes ``df.write.format("kafka")``;
        the broker-less file-topic stand-in writes per-task part files
        promoted to segments by rename (FileTopic.produce_frame) — row
        data never materializes on the driver either way. Per-format
        escaping lives in :func:`formats.serialize_frame` (shared with
        the CLI module — r7 verdict #5); the file-topic path passes
        ``line_framed=True`` so one logical row is always one message
        (ADVICE r7: RFC-4180 quoted newlines split across line-framed
        segments)."""
        from otus_clickhouse_spark.formats import serialize_frame, serialize_header

        fmt = td.settings.get("kafka_format", "JSONEachRow")
        brokers = os.environ.get("SPARK_GRAFT_KAFKA_BROKERS")
        ser = serialize_frame(df, fmt, line_framed=not brokers)
        # ADVICE r8: WithNames formats publish the column-names header
        # as the FIRST message of each produced block (CH emits the
        # header per written block; data-only output misparses on a
        # header-expecting consumer)
        head = serialize_header(df, fmt)
        if brokers:
            topic = td.settings.get("kafka_topic_list", td.name)
            if head is not None:
                (
                    self.spark.createDataFrame([(head,)], "value string")
                    .write.format("kafka")
                    .option("kafka.bootstrap.servers", brokers)
                    .option("topic", topic)
                    .save()
                )
            (
                ser.write.format("kafka")
                .option("kafka.bootstrap.servers", brokers)
                .option("topic", topic)
                .save()
            )
            return
        if head is not None:
            self._kafka_topic(td).produce([head])
        self._kafka_topic(td).produce_frame(ser)

    def kafka_produce(self, topic: str, messages: list[str]) -> None:
        """External-producer helper (the lab's ``kafka_producer.py``
        stand-in: clusters/ch_and_kafka/src/kafka_producer.py writes
        JSON sensor payloads straight to the topic)."""
        from otus_clickhouse_spark.streaming.topics import FileTopic

        FileTopic(os.path.join("spark-warehouse", "_kafka"), topic).produce(messages)

    def kafka_poll(self, name: str) -> DataFrame:
        """One consumer tick for a Kafka-engine table: consume the
        topic's new messages for the table's consumer group, shape them
        into the declared schema, attach CH's virtual columns
        (``_topic/_key/_offset/_timestamp_ms/_partition``,
        init.sql:22-45 raw landing), and push the block through attached
        MVs — the CH background consumption loop, advanced explicitly.
        On a cluster the continuous path is streaming.mv.kafka_source →
        writeStream (the env-gated real-broker tests)."""
        import datetime as _dt

        from pyspark.sql import functions as F

        name = self._strip_known_db_prefixes(name).strip()
        td = self.tables[name]
        topic = td.settings.get("kafka_topic_list", name)
        group = td.settings.get("kafka_group_name", name)
        start, msgs = self._kafka_topic(td).consume(group)
        schema = self.spark.table(name).schema
        now = _dt.datetime.now()
        rows = [(m, topic, "", start + i, now, 0) for i, m in enumerate(msgs)]
        base = self.spark.createDataFrame(
            rows,
            "message string, _topic string, _key string, _offset long, "
            "_timestamp_ms timestamp, _partition int",
        )
        block = self._kafka_shape_block(base, schema).localCheckpoint(eager=True)
        for mv in self._mvs.get(name, []):
            mv.process_block(block)
        return block

    @staticmethod
    def _kafka_shape_block(base: DataFrame, schema) -> DataFrame:
        """Shape a raw message frame (message + virtual columns) into a
        Kafka-engine table's declared schema: single-String declarations
        (kafka_format='JSONAsString') receive the raw message under the
        declared column name; structured declarations parse as
        JSONEachRow."""
        from pyspark.sql import functions as F

        virt = ["_topic", "_key", "_offset", "_timestamp_ms", "_partition"]
        if len(schema) == 1 and schema[0].dataType.simpleString() == "string":
            return base.withColumnRenamed("message", schema[0].name)
        return base.select(F.from_json("message", schema).alias("j"), *virt).select(
            "j.*", *virt
        )

    def kafka_attach_stream(self, name: str, checkpoint: str | None = None):
        """Continuous consumption for a Kafka-engine table — CH's
        background consumer loop as a Structured Streaming query. The
        file-topic stand-in reads the topic directory as a text stream;
        with ``SPARK_GRAFT_KAFKA_BROKERS`` set the same wiring consumes
        the real broker via ``streaming.mv.kafka_source``. Each
        micro-batch is shaped exactly like :meth:`kafka_poll`'s block
        (declared schema + virtual columns) and pushed through the
        attached MV cascade inside ``foreachBatch``. Returns the
        StreamingQuery — the caller owns its lifecycle."""
        import tempfile

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        name = self._strip_known_db_prefixes(name).strip()
        td = self.tables[name]
        topic = td.settings.get("kafka_topic_list", name)
        schema = self.spark.table(name).schema
        brokers = os.environ.get("SPARK_GRAFT_KAFKA_BROKERS")
        # Per-trigger bound (r7 verdict weak #2): without one, attaching
        # over a large backlog materializes the WHOLE backlog in the
        # first micro-batch. CH's consumer loop is likewise block-bounded
        # (kafka_max_block_size, default 65536).
        max_block = int(td.settings.get("kafka_max_block_size", 65536))
        if brokers:
            from otus_clickhouse_spark.streaming.mv import kafka_source

            raw = kafka_source(
                self.spark, brokers, topic, maxOffsetsPerTrigger=str(max_block)
            ).select(
                F.col("value").alias("message"),
                "_topic",
                F.lit("").alias("_key"),
                "_offset",
                F.col("_timestamp").alias("_timestamp_ms"),
                "_partition",
            )
        else:
            tdir = self._kafka_topic(td).dir
            os.makedirs(tdir, exist_ok=True)
            counter = {"offset": 0}
            raw = (
                self.spark.readStream.schema("value string")
                .option("pathGlobFilter", "*.jsonl")
                # segments are produce blocks; 16/trigger bounds a batch
                # the way maxOffsetsPerTrigger bounds the broker path
                .option("maxFilesPerTrigger", "16")
                .text(tdir)
                .select(
                    F.col("value").alias("message"),
                    F.lit(topic).alias("_topic"),
                    F.lit("").alias("_key"),
                    F.lit(0).cast("long").alias("_offset"),  # assigned per batch
                    F.current_timestamp().alias("_timestamp_ms"),
                    F.lit(0).alias("_partition"),
                )
            )
        mvs = self._mvs.get(name, [])
        ck = checkpoint or tempfile.mkdtemp(prefix="kafka_ck_")
        # Staging root for the micro-batch rebind (ADVICE r8): on the
        # broker path, executors may not share the driver's filesystem,
        # so a driver-local tempdir either loses executor-written parts
        # (file:// default FS) or leaks remote staging dirs that
        # shutil.rmtree can't reach (HDFS/S3 default FS). Stage under
        # the STREAM'S CHECKPOINT LOCATION — by contract an fs URI both
        # driver and executors resolve identically — and delete through
        # the Hadoop FileSystem API. The broker-less file-topic
        # stand-in is local-mode by construction and keeps a tempdir.
        stage_root = (
            f"{ck.rstrip('/')}/_stage"
            if brokers
            else tempfile.mkdtemp(prefix="kafka_stage_")
        )

        def _stage_rm(path: str) -> None:
            jvm = self.spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
            fs.delete(hpath, True)

        # --- exactly-once landing protocol (r10 verdict ask #6) -------
        # foreachBatch is AT-LEAST-ONCE: after a crash, Spark replays the
        # last uncommitted epoch WITH THE SAME epoch id, and the MV
        # cascade's appends would duplicate. Protocol (local-fs
        # checkpoints; a remote ck URI skips it — the broker path's
        # production answer is a transactional table format):
        #   pre-image : before touching any landing table, persist the
        #               file listing of every (transitive) MV target
        #               under <ck>/_epochs/<epoch>.pre;
        #   commit    : after all appends, write <epoch>.commit and drop
        #               the pre-image;
        #   replay    : .commit present → the epoch fully landed, skip;
        #               .pre present → a crash interrupted the appends;
        #               delete landing files NOT in the pre-image (roll
        #               back the partial attempt), then process normally.
        # Kill the stream at ANY point and restart from the checkpoint:
        # the landing tables converge to exactly-once contents. (MV
        # targets are owned by the stream while attached — same contract
        # as the reference's Kafka→MV→MergeTree pipeline.)
        epochs_dir = os.path.join(ck, "_epochs") if "://" not in ck else None
        if epochs_dir:
            os.makedirs(epochs_dir, exist_ok=True)
        else:
            # ADVICE r11: the URI-checkpoint path silently degraded to
            # at-least-once; operators must know duplicates are possible
            # on replay (the production answer there is a transactional
            # table format on the landing side)
            import warnings

            warnings.warn(
                "kafka_attach_stream: remote checkpoint URI — exactly-once "
                "epoch markers are local-fs only; landing is AT-LEAST-ONCE "
                "on replay",
                stacklevel=2,
            )

        def _landing_targets() -> dict[str, str]:
            out, stack = {}, list(mvs)
            while stack:
                mv = stack.pop()
                td = self.tables.get(mv.target) if mv.target else None
                if td is not None and td.path:
                    out[mv.target] = td.path
                stack.extend(mv.cascades)
            return out

        def _listing(path: str) -> list[str]:
            files = []
            for root, _, fns in os.walk(path):
                files.extend(
                    os.path.relpath(os.path.join(root, f), path) for f in fns
                )
            return sorted(files)

        def process(batch_df, epoch):
            # foreachBatch hands a frame bound to the micro-batch's CLONED
            # session; MV transforms register temp views on the ENGINE's
            # session, so the block must be rebound there. r7 verdict
            # weak #2: the old rebind collect()ed every micro-batch to
            # the driver. Now the batch STAGES to parquet (a distributed
            # write) and re-reads on the engine session — row data never
            # passes through the driver; together with the per-trigger
            # bound above, a deep backlog streams through in
            # block-sized, executor-resident batches.
            # ADVICE r8: structured streaming delivers no-data batches
            # to foreachBatch; a zero-partition frame writes a part-less
            # parquet dir that the re-read dies on ('Unable to infer
            # schema') — guard BEFORE the write.
            if batch_df.isEmpty():
                return
            pre = commit = None
            if epochs_dir:
                commit = os.path.join(epochs_dir, f"{epoch}.commit")
                pre = os.path.join(epochs_dir, f"{epoch}.pre")
                if os.path.exists(commit):
                    return  # replay of a fully-committed epoch
                targets = _landing_targets()
                if os.path.exists(pre):
                    # crash mid-epoch: roll back the partial appends
                    with open(pre) as fh:
                        snap = json.loads(fh.read())
                    for tname, path in targets.items():
                        keep = set(snap.get(tname, []))
                        if not os.path.exists(path):
                            continue
                        for rel in _listing(path):
                            if rel not in keep:
                                os.remove(os.path.join(path, rel))
                else:
                    snap = {
                        t: (_listing(p) if os.path.exists(p) else [])
                        for t, p in targets.items()
                    }
                    tmp = pre + ".tmp"
                    with open(tmp, "w") as fh:
                        fh.write(json.dumps(snap))
                    os.replace(tmp, pre)
            stage = f"{stage_root.rstrip('/')}/epoch_{epoch}"
            batch_df.write.mode("overwrite").parquet(stage)
            block = self.spark.read.parquet(stage)
            n = block.count()
            if not brokers:
                # stand-in offsets: contiguous per consumer (the window
                # input is bounded by maxFilesPerTrigger × block size)
                w = Window.orderBy(F.monotonically_increasing_id())
                start = counter["offset"]
                block = block.withColumn(
                    "_offset", F.row_number().over(w).cast("long") + F.lit(start - 1)
                )
                counter["offset"] = start + n
            shaped = self._kafka_shape_block(block, schema).localCheckpoint(eager=True)
            # the eager checkpoint pins the block executor-side; the
            # staging files are no longer referenced
            _stage_rm(stage)
            for mv in mvs:
                mv.process_block(shaped)
            if epochs_dir:
                with open(commit, "w") as fh:
                    fh.write("")
                if pre and os.path.exists(pre):
                    os.remove(pre)
                # ADVICE r11: one .commit marker per micro-batch is
                # unbounded growth on a long-lived stream. Spark never
                # replays epochs older than the last committed one, so
                # markers more than N epochs behind are dead — prune
                # them (N=16 keeps a generous replay margin).
                try:
                    for fn in os.listdir(epochs_dir):
                        if fn.endswith(".commit"):
                            try:
                                old_epoch = int(fn[: -len(".commit")])
                            except ValueError:
                                continue
                            if old_epoch < int(epoch) - 16:
                                os.remove(os.path.join(epochs_dir, fn))
                except OSError:
                    pass  # pruning is best-effort; markers are tiny

        return (
            raw.writeStream.foreachBatch(process)
            .option("checkpointLocation", ck)
            .start()
        )

    # -------------------------------------------------------------------- MVs
    def create_materialized_view(
        self, name: str, target: str, select_sql: str, source: str, populate: bool = False
    ):
        """CREATE MATERIALIZED VIEW … TO target AS SELECT … FROM source
        (lectures/lecture_09.md:668-744): an INSERT trigger — each block
        inserted into ``source`` is transformed by the SELECT and
        appended to ``target`` (per-block semantics, no merge with
        existing target data). ``POPULATE`` backfills from the current
        source contents (lecture_09.md:716-718)."""
        import uuid as _uuid

        from otus_clickhouse_spark.streaming.mv import MaterializedView

        if target not in self.tables:
            td = TableDef(name=target, path=os.path.join("spark-warehouse", target))
            self.tables[target] = td

        def transform(block: DataFrame) -> DataFrame:
            view = f"__mv_block_{_uuid.uuid4().hex[:8]}"
            block.createOrReplaceTempView(view)
            try:
                return self.sql(
                    re.sub(rf"\bFROM\s+{source}\b", f"FROM {view}", select_sql, flags=re.IGNORECASE)
                ).localCheckpoint(eager=True)
            finally:
                self.spark.catalog.dropTempView(view)

        mv = MaterializedView(
            name=name, transform=transform,
            sink=lambda out: self.insert(target, out), target=target,
        )
        self._mvs.setdefault(source, []).append(mv)
        if populate:
            self.insert(target, self.sql(select_sql).localCheckpoint(eager=True))
        return mv

    # ----------------------------------------------------------- dictionaries
    def create_dictionary(self, name: str, df: DataFrame, key: str) -> None:
        """CH external dictionary (lectures/lecture_11.md:1-130): a small
        key→attributes map held driver-side and broadcast into lookups.

        CH errors when a dictionary name collides with an existing table
        (they share the database namespace) — mirror that rather than
        silently clobbering the table's temp view (reloading an existing
        dictionary under its own name is fine)."""
        from otus_clickhouse_spark.plans.dictionary import Dictionary

        if name in self.tables and name not in self._dictionaries:
            raise ValueError(
                f"cannot CREATE DICTIONARY {name}: a table with that name exists"
            )
        self._dictionaries[name] = Dictionary.from_df(self.spark, name, df, key)

    def dictionary(self, name: str):
        return self._dictionaries[name]

    def reload_dictionary(self, name: str, df: DataFrame | None = None) -> bool:
        """SYSTEM RELOAD DICTIONARY (lecture_04.md:85): re-read the
        source (recorded at CREATE DICTIONARY) and swap the broadcast."""
        d = self._dictionaries[name]
        if df is None:
            src = self._dict_sources.get(name)
            df = self.table(src[0]).select(*src[1]) if src else d.df
        self.create_dictionary(name, df, d.key)
        return True

    def system_dictionaries(self) -> DataFrame:
        """≈ system.dictionaries (lecture_11.md:312,356-390): one row per
        live dictionary, CH's dotted key./attribute. column names kept so
        the lecture's ``select * … format Vertical`` probe runs verbatim.
        Status is always LOADED — our dictionaries materialize at CREATE
        (the lecture's own advice: configure eager load)."""
        import uuid as _uuid

        rows = []
        for name, d in sorted(self._dictionaries.items()):
            attrs = [f for f in d.df.schema.fields if f.name != d.key]
            key_f = [f for f in d.df.schema.fields if f.name == d.key]
            rows.append(
                (
                    "default", name,
                    str(_uuid.uuid5(_uuid.NAMESPACE_OID, "dict:" + name)),
                    "LOADED",
                    [d.key],
                    [f.dataType.simpleString() for f in key_f],
                    [f.name for f in attrs],
                    [f.dataType.simpleString() for f in attrs],
                    d.df.count(),
                    self._dict_sources.get(name, ("", []))[0],
                )
            )
        return self.spark.createDataFrame(
            rows,
            "database string, name string, uuid string, status string, "
            "`key.names` array<string>, `key.types` array<string>, "
            "`attribute.names` array<string>, `attribute.types` array<string>, "
            "element_count long, source string",
        )

    def system_dashboards(self) -> DataFrame:
        """≈ system.dashboards (lecture_22.md:1-4): the built-in
        monitoring dashboard's (dashboard, title, query) rows — the web
        page fetches these and substitutes {rounding}/{seconds}. Queries
        here target our system.metrics/events counterparts so they run
        against this engine."""
        rows = [
            ("Overview", "Queries/second",
             "SELECT count(*) FROM system.query_log"),
            ("Overview", "Selected rows/second",
             "SELECT value FROM system.events WHERE event = 'SelectedRows'"),
            ("Overview", "Inserted rows/second",
             "SELECT value FROM system.events WHERE event = 'InsertedRows'"),
            ("Overview", "Total MergeTree parts",
             "SELECT count(*) FROM system.parts"),
        ]
        return self.spark.createDataFrame(
            rows, "dashboard string, title string, query string"
        )

    # ----------------------------------------------------------- system views
    def system_tables(self) -> DataFrame:
        """≈ system.tables (lectures/lecture_02.md:197-276). Column names
        AND types follow CH (Array data_paths; footer-derived
        total_rows/total_bytes — hw08.md's size probe) so lecture
        queries — including COLUMNS('key') projections and
        ``data_paths != []`` — run verbatim."""
        import hashlib

        def _sizes(path):
            """(rows, compressed bytes, uncompressed bytes, has_data) from
            parquet footers — metadata reads only, never data pages. At
            warehouse scale this is the one catalog call that touches
            O(files) footers; a production deployment keeps part
            metadata resident like CH (or a lakehouse manifest) instead
            of re-reading footers per introspection query."""
            import pyarrow.parquet as pq

            if not path or not os.path.exists(path):
                return 0, 0, 0, 0
            files = (
                [path]
                if os.path.isfile(path)
                else [
                    os.path.join(r, f)
                    for r, _, fs in os.walk(path)
                    for f in fs
                    if f.endswith(".parquet")
                ]
            )
            n = comp = uncomp = 0
            for f in files:
                meta = pq.ParquetFile(f).metadata
                n += meta.num_rows
                comp += os.path.getsize(f)
                uncomp += sum(
                    meta.row_group(i).total_byte_size for i in range(meta.num_row_groups)
                )
            return n, comp, uncomp, int(bool(files))

        rows = []
        for t in self.tables.values():
            n, comp, uncomp, has = _sizes(t.path)
            rows.append(
                (
                    *self._split_db(t.name),
                    hashlib.md5(t.name.encode()).hexdigest(),
                    t.engine,
                    [t.path] if t.path else [],
                    os.path.join("spark-warehouse", f"{t.name}.def"),
                    ",".join(t.order_by),
                    ",".join(t.order_by),
                    ",".join(t.partition_by),
                    t.comment,
                    n,
                    comp,
                    uncomp,
                    has,
                )
            )
        from pyspark.sql import functions as F

        return self.spark.createDataFrame(
            rows,
            "database string, name string, uuid string, engine string, "
            "data_paths array<string>, "
            "metadata_path string, primary_key string, sorting_key string, "
            "partition_key string, comment string, total_rows long, "
            "total_bytes long, total_bytes_uncompressed long, has_own_data int",
        ).withColumn("table", F.col("name"))  # CH exposes `table` as a name alias

    def system_parts(self) -> DataFrame:
        """≈ system.parts: one row per data file (lecture_08.md:273-377)."""
        rows = []
        for t in self.tables.values():
            if not t.path or not os.path.exists(t.path):
                continue
            if os.path.isfile(t.path):
                rows.append(
                    (t.name, os.path.basename(t.path), "all", "all", "default",
                     t.path, os.path.getsize(t.path), 1)
                )
            else:
                # hot tier + any TTL-moved cold volumes (lecture_14.md:233):
                # parts report the disk they live on, like CH with a
                # storage policy (hw13.md:15-27)
                tiers = [(t.path, "default")] + [
                    (cp, vol)
                    for vol, cp in t.settings.get("cold_volumes", {}).items()
                ]
                for tier_path, disk in tiers:
                    if not os.path.isdir(tier_path):
                        continue
                    for root, _dirs, files in os.walk(tier_path):
                        for f in files:
                            if f.endswith(".parquet"):
                                p = os.path.join(root, f)
                                rel = os.path.relpath(p, tier_path)
                                part = os.path.dirname(rel) or "all"
                                # CH reports the bare partition VALUE
                                # (hw11.md golden `partition: 20240101`),
                                # not the hive directory name — strip the
                                # `col=` prefix incl. generated `_p_*`
                                # partition-expression columns
                                part = re.sub(r"^[^=/]+=", "", part)
                                rows.append(
                                    (t.name, rel, part, part, disk, p,
                                     os.path.getsize(p), 1)
                                )
        from pyspark.sql import functions as F

        return self.spark.createDataFrame(
            rows,
            "table string, name string, partition string, partition_id string, "
            "disk_name string, path string, bytes_on_disk long, active int",
            # listed files are all live — removal is immediate here
            # (hw11.md's post-DROP-PARTITION inspection runs verbatim)
        ).withColumn("removal_state", F.lit("Part hasn't begun to be removed"))

    def system_query_log(self) -> DataFrame:
        """≈ system.query_log (lecture_20.md:296-478): queries run via
        :meth:`run`, with duration / result rows / exception."""
        import datetime as _dt

        from pyspark.sql import functions as F

        empty = ("", "QueryFinish", _dt.datetime.now(), _dt.date.today(), 0.0, 0, "", [])
        df = self.spark.createDataFrame(
            self._query_log or [empty],
            "query string, type string, event_time timestamp, event_date date, "
            "duration_sec double, result_rows long, exception string, "
            "tables array<string>",
        )
        # CH-named companions (lecture_20.md:828-843 slow-query probe
        # runs verbatim): start time ≈ event_time − duration; read_rows
        # reports the result size (the engine doesn't meter scan I/O —
        # documented proxy); exception_code 0 ⇔ success; single-node
        # _shard_num = 1
        return (
            df.withColumn(
                "query_start_time",
                (F.unix_timestamp("event_time") - F.col("duration_sec")).cast("timestamp"),
            )
            .withColumn("query_duration_ms", (F.col("duration_sec") * 1000).cast("long"))
            .withColumn("read_rows", F.col("result_rows"))
            .withColumn("read_bytes", F.lit(0).cast("long"))
            .withColumn("memory_usage", F.lit(0).cast("long"))
            .withColumn(
                "exception_code",
                F.when(F.col("exception") == "", 0).otherwise(1).cast("int"),
            )
            .withColumn("_shard_num", F.lit(1).cast("int"))
        )

    def system_metric_log(self) -> DataFrame:
        """≈ system.metric_log (lecture_20.md:790-798 failure sweep):
        periodic snapshots with one ProfileEvent_* column per counter.
        One current-snapshot row here; the failure counters derive from
        the query log (FailedQuery family) — replication/distributed
        failure classes are structurally zero on the single-JVM
        topology, exactly what the lecture's healthy-cluster golden
        shows."""
        import datetime as _dt

        failed = [q for q in self._query_log
                  if q[1] in ("ExceptionWhileProcessing", "ExceptionBeforeStart")]
        n_sel = sum(1 for q in failed if re.match(r"\s*(SELECT|WITH)\b", q[0], re.IGNORECASE))
        n_ins = sum(1 for q in failed if re.match(r"\s*INSERT\b", q[0], re.IGNORECASE))
        now = _dt.datetime.now()
        return self.spark.createDataFrame(
            [("localhost", now, now.date(), len(failed), n_sel, n_ins, 0, 0, 0, 0)],
            "hostname string, event_time timestamp, event_date date, "
            "ProfileEvent_FailedQuery long, ProfileEvent_FailedSelectQuery long, "
            "ProfileEvent_FailedInsertQuery long, "
            "ProfileEvent_ReplicatedPartFailedFetches long, "
            "ProfileEvent_ReplicatedPartChecksFailed long, "
            "ProfileEvent_DistributedConnectionFailTry long, "
            "ProfileEvent_ReplicatedDataLoss long",
        )

    def system_projection_parts_columns(self) -> DataFrame:
        """≈ system.projection_parts_columns (lecture_13.md projection
        inspection): one row per (projection, column) with the parent
        table and the materialized row count."""
        rows = []
        for p in self.projections.projections.values():
            cols = list(p.group_keys) + list(p.aggs)
            n = p.df.count() if p.df is not None else 0
            for pos, col in enumerate(cols, 1):
                rows.append((p.name, p.table, f"{p.table}_all", int(n), 1, col, "", pos))
        return self.spark.createDataFrame(
            rows or [("", "", "", 0, 0, "", "", 0)],
            "name string, table string, parent_name string, rows long, active int, "
            "column string, type string, column_position int",
        ).where("name != ''")

    def system_merge_tree_settings(self) -> DataFrame:
        """≈ system.merge_tree_settings (lecture_09.md:async-insert
        probe): MergeTree profile defaults. The Spark analogue of each
        knob is noted in the description column; unknown names simply
        return no rows, like CH."""
        rows = [
            ("index_granularity", "8192", "row-group/page granule analogue"),
            ("max_bytes_to_merge_at_max_space_in_pool", "161061273600", "compaction target size"),
            ("parts_to_throw_insert", "3000", "small-files backpressure"),
            ("old_parts_lifetime", "480", "compacted-file GC delay"),
            ("merge_with_ttl_timeout", "14400", "TTL sweep cadence"),
        ]
        return self.spark.createDataFrame(
            rows, "name string, value string, description string"
        )

    def system_errors(self) -> DataFrame:
        """≈ system.errors (lecture_20.md:337-349): error classes with
        trip counts since start. Derived from the query log's exception
        records — name is the exception class, value its count."""
        import datetime as _dt
        from collections import Counter

        errs = [
            (q[6].split(":")[0].strip() or "UNKNOWN", q[6], q[2])
            for q in self._query_log
            if q[1] in ("ExceptionWhileProcessing", "ExceptionBeforeStart")
        ]
        counts = Counter(name for name, _, _ in errs)
        last: dict[str, tuple] = {}
        for name, msg, ts in errs:
            last[name] = (msg, ts)
        rows = [
            (name, int(n), last[name][0][:200], last[name][1])
            for name, n in counts.items()
        ]
        return self.spark.createDataFrame(
            rows or [("", 0, "", _dt.datetime.now())],
            "name string, value long, last_error_message string, "
            "last_error_time timestamp",
        ).where("name != ''")

    def system_merges(self) -> DataFrame:
        """≈ system.merges (lecture_20.md:320-334): merges/mutations IN
        FLIGHT right now. The engine's OPTIMIZE and mutations are
        synchronous — between statements nothing is running, so the
        current-state table is schema-correct and empty (exactly what a
        quiesced CH server shows)."""
        return self.spark.createDataFrame(
            [],
            "database string, table string, elapsed double, progress double, "
            "rows_read long, is_mutation int, merge_type string",
        )

    def system_asynchronous_metrics(self) -> DataFrame:
        """≈ system.asynchronous_metrics (lecture_20.md:252-308, the
        third Prometheus/Graphite export source beside metrics/events):
        periodically sampled host-level gauges. Real samples where the
        platform provides them."""
        import time as _time

        rows = []
        try:
            la1, la5, la15 = os.getloadavg()
            rows += [("LoadAverage1", la1), ("LoadAverage5", la5), ("LoadAverage15", la15)]
        except OSError:
            pass
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        rows.append(("MemoryResident", float(line.split()[1]) * 1024))
                        break
        except OSError:
            pass
        rows.append(("Uptime", _time.time() - self._started_at))
        rows.append(("NumberOfTables", float(len(self.tables))))
        return self.spark.createDataFrame(rows, "metric string, value double")

    def system_replication_queue(self) -> DataFrame:
        """≈ system.replication_queue (lecture_20.md:823-827): pending
        replicated fetches/merges. The single-JVM topology has no
        queue — schema-correct and empty, the healthy-cluster state the
        lecture query expects."""
        return self.spark.createDataFrame(
            [],
            "table string, replica_name string, node_name string, merge_type string, "
            "last_exception string, last_attempt_time timestamp",
        )

    def system_trace_log(self) -> DataFrame:
        """≈ system.trace_log (hw14.md:36-41 MemoryPeak dashboards;
        lecture_20.md profiling): the sampling-profiler event stream.
        The JVM path has no clickhouse-style memory/CPU sampler wired
        into Python, so the view is schema-correct and EMPTY here — on
        a cluster the rows would come from a SparkListener feeding task
        metrics (peakExecutionMemory) into this table's shape."""
        return self.spark.createDataFrame(
            [],
            "event_time timestamp, event_date date, trace_type string, "
            "query_id string, size long",
        )

    def system_columns(self) -> DataFrame:
        """≈ system.columns (lecture_02.md:197-276): one row per column
        of each registered table, with the attribute kind."""
        rows = []
        for t in self.tables.values():
            defaults = t.settings.get("defaults", {})
            mat = t.settings.get("materialized", {})
            aliases = t.settings.get("aliases", {})
            try:
                fields = self.table(t.name).schema.fields
            except Exception:
                continue
            for f in fields:
                kind, expr = "", ""
                if f.name in defaults:
                    kind, expr = "DEFAULT", defaults[f.name]
                elif f.name in mat:
                    kind, expr = "MATERIALIZED", mat[f.name]
                elif f.name in aliases:
                    kind, expr = "ALIAS", aliases[f.name]
                rows.append((t.name, f.name, f.dataType.simpleString(), kind, expr))
        return self.spark.createDataFrame(
            rows, "table string, name string, type string, default_kind string, default_expression string"
        )

    def system_functions(self) -> DataFrame:
        """≈ system.functions (lecture_06.md:112-119): registered
        ClickHouse-named SQL UDFs plus user lambdas, with origin."""
        from otus_clickhouse_spark.functions.clickhouse import AGGREGATE_ALIASES, SCALAR_ALIASES

        rows = [
            (n, "SQLUserDefined", f"CREATE FUNCTION {n} AS ({', '.join(ps)}) -> {body}")
            for n, (ps, body) in self._sql_macros.items()
        ]
        rows += [(n, "System", "") for n in SCALAR_ALIASES]
        rows += [(n, "System", "") for n in AGGREGATE_ALIASES]
        return self.spark.createDataFrame(rows, "name string, origin string, create_query string")

    def system_data_skipping_indices(self) -> DataFrame:
        """system.data_skipping_indices (D8; lecture_08.md:225)."""
        rows = [
            (t, i, expr, itype)
            for t, td in self.tables.items()
            for i, (expr, itype) in td.skip_indexes.items()
        ]
        return self.spark.createDataFrame(
            rows, "table string, name string, expr string, type string"
        )

    def system_events(self) -> DataFrame:
        """≈ system.events (lecture_20.md:296-478 monitoring): cumulative
        engine counters (Query/SelectQuery/InsertQuery/FailedSelectQuery)."""
        rows = sorted(self._events.items())
        return self.spark.createDataFrame(
            rows or [("", 0)], "event string, value long"
        ).where("event != ''")

    def system_metrics(self) -> DataFrame:
        """≈ system.metrics: current gauges (running queries, registered
        tables/dictionaries) — the Prometheus-exporter surface the course
        scrapes (lecture_20.md:497-529)."""
        rows = [
            ("Query", len(self._processes)),
            ("TablesRegistered", len(self.tables)),
            ("DictionariesRegistered", len(self._dictionaries)),
            ("MaterializedViews", sum(len(v) for v in self._mvs.values())),
        ]
        return self.spark.createDataFrame(rows, "metric string, value long")

    def system_mutations(self) -> DataFrame:
        """≈ system.mutations (lecture_16.md:60-98): mutations routed
        through Engine.execute, with completion time. Our mutations are
        synchronous write-then-swap, so ``is_done`` is always 1 — unlike
        CH's async part rewrites (a difference, documented)."""
        rows = [
            (
                s,
                (tm.group(1) if (tm := re.search(r"\bTABLE\s+(\w+)", s, re.IGNORECASE)) else ""),
                f"mutation_{i}.txt",
                float(ts),
                1,
            )
            for i, (s, ts, _st) in enumerate(self._mutations_log)
        ]
        from pyspark.sql import functions as F

        return (
            self.spark.createDataFrame(
                rows or [("", "", "", 0.0, 0)],
                "command string, table string, mutation_id string, finished_at double, is_done int",
            )
            .where("command != ''")
            # failure bookkeeping (lecture_20.md:817-821 stuck-mutation
            # probe): synchronous write-then-swap either succeeds or
            # raises to the caller, so the fail columns are empty/null
            .withColumn("latest_fail_reason", F.lit(""))
            .withColumn("latest_fail_time", F.lit(None).cast("timestamp"))
        )

    def system_grants(self) -> DataFrame:
        """≈ system.grants (lecture_18.md:134-216; hw12.md:83-107
        Vertical golden): one structured row per (privilege, object,
        grantee) — grantee lands in user_name or role_name depending on
        which kind of principal it is, like CH."""
        rows = [
            (
                grantee if grantee not in self._roles else None,
                grantee if grantee in self._roles else None,
                priv,
                None if db == "*" else db,
                None if tbl == "*" else tbl,
                None,
                0,
                0,
            )
            for priv, db, tbl, grantee in self._grants
        ]
        return self.spark.createDataFrame(
            rows,
            "user_name string, role_name string, access_type string, "
            "database string, table string, column string, "
            "is_partial_revoke int, grant_option int",
        )

    def system_processes(self) -> DataFrame:
        """≈ system.processes (lecture_16.md:328-336): queries currently
        inside :meth:`run`, with their cancellable query_id."""
        import time

        now = time.time()
        rows = [(qid, text, round(now - t0, 3)) for qid, (text, t0) in self._processes.items()]
        return self.spark.createDataFrame(
            rows or [("", "", 0.0)], "query_id string, query string, elapsed double"
        ).where("query_id != ''")

    def system_settings(self) -> DataFrame:
        """≈ system.settings: spark conf + session SET overrides
        (lecture_12.md:62-212)."""
        items = [(k, str(v)) for k, v in self.spark.sparkContext.getConf().getAll()]
        items += list(self.session_settings.items())
        return self.spark.createDataFrame(items, "name string, value string")


_FINAL_RE = re.compile(r"\bFROM\s+([A-Za-z_][A-Za-z0-9_]*)\s+FINAL\b", re.IGNORECASE)

_PASTE_REL = r"(\w+|\((?:[^()]|\([^()]*\))*\))"
_PASTE_SQL_RE = re.compile(
    rf"\bFROM\s+{_PASTE_REL}\s+PASTE\s+JOIN\s+{_PASTE_REL}", re.IGNORECASE | re.DOTALL
)

# ORDER BY t [ASC|DESC] WITH FILL [FROM x] [TO y] [STEP n]
# (lectures/lecture_20.md:29-33; homeworks/hw14.md:35-70)
_WITH_FILL_RE = re.compile(
    r"ORDER\s+BY\s+(\w+)(?:\s+(ASC|DESC))?\s+WITH\s+FILL"
    r"(?:\s+FROM\s+(\S+))?(?:\s+TO\s+(\S+))?(?:\s+STEP\s+(\S+))?"
    r"(?:\s+INTERPOLATE\s*\(([^)]*)\))?",
    re.IGNORECASE,
)

# file/s3/gcs/url/hdfs('path'[, 'format'[, 'structure']]) table functions
_FILE_FN_RE = re.compile(
    r"\bFROM\s+(file|s3|gcs|url|hdfs)\s*\(\s*'([^']+)'"
    r"(?:\s*,\s*'([^']+)')?(?:\s*,\s*'([^']+)')?\s*\)",
    re.IGNORECASE,
)

# postgresql/mysql/jdbc(conn-or-collection, …) table functions
# (S15/S16 hw19.md:44-48; named-collection form D14 hw19.md:37-48)
_EXT_FN_RE = re.compile(
    r"\bFROM\s+(postgresql|mysql|jdbc)\s*\(([^()]*)\)", re.IGNORECASE
)

# generateRandom('a UInt64, …'[, seed]) table function (lecture_08.md:232)
_GENRAND_FN_RE = re.compile(
    r"\bFROM\s+generateRandom\s*\(\s*'([^']+)'\s*(?:,\s*(\d+)\s*)?\)", re.IGNORECASE
)

# merge([currentDatabase()|'db',] 'regex') table function (lecture_09.md:645)
_MERGE_FN_RE = re.compile(
    r"\bFROM\s+merge\s*\(\s*(?:(?:currentDatabase\(\)|'\w+')\s*,\s*)?'([^']+)'\s*\)",
    re.IGNORECASE,
)

# LIMIT n BY expr_list [LIMIT m] — ClickHouse per-group top-n clause
_LIMIT_BY_RE = re.compile(
    r"\bLIMIT\s+(\d+)\s+BY\s+(.*?)(?:\s+LIMIT\s+(\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ORDER_ITEMS_RE = re.compile(
    r"\bORDER\s+BY\s+(.*?)(?=\s+LIMIT\s)", re.IGNORECASE | re.DOTALL
)


def F_desc(col: str):
    from pyspark.sql import functions as F

    return F.desc(col)


def _order_expr(item: str):
    """Parse one ORDER BY item ('expr [ASC|DESC] [NULLS FIRST|LAST]')."""
    from pyspark.sql import functions as F

    m = re.match(
        r"(.*?)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?\s*$",
        item.strip(),
        re.IGNORECASE | re.DOTALL,
    )
    c = F.expr(m.group(1))
    return c.desc() if (m.group(2) or "").upper() == "DESC" else c.asc()


def _apply_limit_by(
    df: DataFrame, n_per: int, by_items: list[str], order_items: list[str], tail: int | None
) -> DataFrame:
    """LIMIT n BY: keep the first n rows per BY-key group, in the query's
    ORDER BY order (arbitrary pick when unordered, as in ClickHouse)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    order = [_order_expr(o) for o in order_items] or [F.lit(1).asc()]
    w = Window.partitionBy(*[F.expr(b) for b in by_items]).orderBy(*order)
    out = (
        df.withColumn("__lb_rn", F.row_number().over(w))
        .filter(F.col("__lb_rn") <= n_per)
        .drop("__lb_rn")
    )
    if order_items:
        out = out.orderBy(*[_order_expr(o) for o in order_items])
    return out.limit(tail) if tail is not None else out


def _split_statements(script: str) -> list[str]:
    """Split a SQL script on top-level semicolons, skipping semicolons
    inside quotes and stripping ``--`` line comments."""
    out, buf = [], []
    i, n = 0, len(script)
    while i < n:
        c = script[i]
        if c in "'\"`":
            j = i + 1
            while j < n and script[j] != c:
                j += 2 if script[j] == "\\" else 1
            buf.append(script[i : j + 1])
            i = j + 1
            continue
        if c == "-" and script[i : i + 2] == "--":
            j = script.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and script[i : i + 2] == "/*":
            j = script.find("*/", i)
            i = n if j < 0 else j + 2
            continue
        if c == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(c)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def _enum_norm(td, fname: str, col):
    """Enum columns accept the name OR the numeric code on insert (CH
    behavior; hw02.sql:17 + hw02.md:91-105): codes are normalized to
    the stored name string via a literal map (codegen'd, no UDF)."""
    mapping = td.settings.get("enums", {}).get(fname)
    if not mapping:
        return col.alias(fname)
    from pyspark.sql import functions as F

    m = F.create_map(
        *[F.lit(x) for name, code in mapping.items() for x in (str(code), name)]
    )
    return F.coalesce(m[col], col).alias(fname)


def _zero_default(dtype):
    """ClickHouse type-zero default for non-nullable columns with no
    DEFAULT clause (0 / '' / epoch / false / empty container)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(dtype, T.StringType):
        return F.lit("")
    if isinstance(dtype, T.BooleanType):
        return F.lit(False)
    if isinstance(dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return F.lit("1970-01-01").cast(dtype)
    if isinstance(dtype, T.ArrayType):
        return F.array().cast(dtype)
    if isinstance(dtype, T.MapType):
        return F.map_from_arrays(F.array(), F.array()).cast(dtype)
    return F.lit(0).cast(dtype)  # numeric family
