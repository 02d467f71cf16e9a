"""Connector configuration surface (SURVEY.md §2.1 S4).

The reference wraps six Debezium connectors, each mapping task fields
to engine properties (mysql/Capture.java:74-95, postgres/Capture.java:
100-108 + PostgresService.java:30-74, sqlserver/SqlServerInterface.
java:35-41, oracle/Capture.java:96-117, db2/Capture.java:73-90,
mongodb/Capture.java:122-146). In this engine a "connector" is the
config head that turns those knobs into (a) properties a real CDC
source would receive and (b) an EngineConfig for the replay loop — the
log itself is one envelope format, so connector diversity collapses to
configuration (SURVEY.md: "connector diversity collapses to
envelope-schema options").

No live MySQL/Postgres/... servers exist here; these classes
validate/normalize the same option surface the reference exposes so a
user of the reference can port a task definition 1:1. One connector
DOES run live end to end: SQLite (sources/sqlite_connector.py) —
trigger-audit capture with a consistent snapshot, offset store, and
at-least-once re-delivery absorbed by the engine's LWW.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class SnapshotMode(str, Enum):
    """Union of the reference's per-connector snapshot modes
    (mysql/MysqlInterface.java:43-53, postgres/PostgresInterface.java:
    107-112, sqlserver/SqlServerInterface.java:43-47)."""

    INITIAL = "initial"
    INITIAL_ONLY = "initial_only"
    WHEN_NEEDED = "when_needed"
    NEVER = "never"
    NO_DATA = "no_data"
    ALWAYS = "always"
    RECOVERY = "recovery"


@dataclass
class ConnectorConfig:
    """Common surface (reference AbstractDebeziumInterface.java:
    108-148): include/exclude regex lists + snapshot mode + freeform
    properties passthrough (AbstractDebeziumTask.java:591-595)."""

    hostname: str = "localhost"
    port: int = 0
    username: str | None = None
    password: str | None = None
    database_include_list: list[str] = field(default_factory=list)
    database_exclude_list: list[str] = field(default_factory=list)
    table_include_list: list[str] = field(default_factory=list)
    table_exclude_list: list[str] = field(default_factory=list)
    column_include_list: list[str] = field(default_factory=list)
    column_exclude_list: list[str] = field(default_factory=list)
    snapshot_mode: SnapshotMode = SnapshotMode.INITIAL
    properties: dict[str, str] = field(default_factory=dict)

    connector_class = "generic"

    @staticmethod
    def _join(values: list[str]) -> str:
        # comma-escaping as in the reference (joinProperties,
        # AbstractDebeziumTask.java:600-608)
        return ",".join(v.replace(",", "\\,") for v in values)

    def to_properties(self) -> dict[str, str]:
        p = {
            "connector.class": self.connector_class,
            "database.hostname": self.hostname,
            "database.port": str(self.port),
            "snapshot.mode": self.snapshot_mode.value,
        }
        if self.username:
            p["database.user"] = self.username
        if self.password:
            p["database.password"] = self.password
        for key, vals in (
            ("database.include.list", self.database_include_list),
            ("database.exclude.list", self.database_exclude_list),
            ("table.include.list", self.table_include_list),
            ("table.exclude.list", self.table_exclude_list),
            ("column.include.list", self.column_include_list),
            ("column.exclude.list", self.column_exclude_list),
        ):
            if vals:
                p[key] = self._join(vals)
        p.update(self.properties)  # freeform passthrough wins
        return p

    def include_exclude_regexes(self) -> dict[str, str | None]:
        """The predicate form our filter operator consumes (F1)."""

        def rx(vals: list[str]) -> str | None:
            return "|".join(f"(?:{v})" for v in vals) if vals else None

        return {
            "db_include": rx(self.database_include_list),
            "db_exclude": rx(self.database_exclude_list),
            "table_include": rx(self.table_include_list),
            "table_exclude": rx(self.table_exclude_list),
        }

    def column_regexes(self) -> dict[str, str | None]:
        """column.include/exclude.list regex form
        (AbstractDebeziumTask.java:567-589) for column_include_exclude."""

        def rx(vals: list[str]) -> str | None:
            return "|".join(f"(?:{v})" for v in vals) if vals else None

        return {
            "include": rx(self.column_include_list),
            "exclude": rx(self.column_exclude_list),
        }

    def engine_overrides(self) -> dict:
        """EngineConfig fields this connector surface decides: the
        execution wiring for snapshot mode + db/table filters (the
        reference pushes the same knobs into the Debezium engine,
        mysql/Capture.java:81-92)."""
        io = self.include_exclude_regexes()
        return {
            "snapshot_mode": self.snapshot_mode.name,
            "db_include": io["db_include"],
            "db_exclude": io["db_exclude"],
            "table_include": io["table_include"],
            "table_exclude": io["table_exclude"],
        }


@dataclass
class MySqlConfig(ConnectorConfig):
    """mysql/Capture.java:74-95: server id, binlog position offsets."""

    port: int = 3306
    server_id: str = "5400"
    connector_class = "mysql"

    def to_properties(self) -> dict[str, str]:
        p = super().to_properties()
        p["database.server.id"] = self.server_id
        return p


@dataclass
class PostgresConfig(ConnectorConfig):
    """postgres/Capture.java:100-108 + PostgresService.java:30-74:
    logical decoding plugin, replication slot, publication, SSL."""

    port: int = 5432
    plugin_name: str = "pgoutput"
    slot_name: str = "kestra"
    publication_name: str = "kestra_publication"
    ssl_mode: str = "disable"
    connector_class = "postgres"

    def to_properties(self) -> dict[str, str]:
        p = super().to_properties()
        p.update(
            {
                "plugin.name": self.plugin_name,
                "slot.name": self.slot_name,
                "publication.name": self.publication_name,
                "database.sslmode": self.ssl_mode,
            }
        )
        return p


@dataclass
class SqlServerConfig(ConnectorConfig):
    """sqlserver/SqlServerInterface.java:35-41: database names list."""

    port: int = 1433
    database_names: list[str] = field(default_factory=list)
    connector_class = "sqlserver"

    def to_properties(self) -> dict[str, str]:
        p = super().to_properties()
        if self.database_names:
            p["database.names"] = self._join(self.database_names)
        return p


@dataclass
class OracleConfig(ConnectorConfig):
    """oracle/Capture.java:96-117: SID / pluggable database."""

    port: int = 1521
    sid: str | None = None
    pdb_name: str | None = None
    connector_class = "oracle"

    def to_properties(self) -> dict[str, str]:
        p = super().to_properties()
        if self.sid:
            p["database.dbname"] = self.sid
        if self.pdb_name:
            p["database.pdb.name"] = self.pdb_name
        return p


@dataclass
class Db2Config(ConnectorConfig):
    """db2/Capture.java:73-90."""

    port: int = 50000
    database: str | None = None
    connector_class = "db2"

    def to_properties(self) -> dict[str, str]:
        p = super().to_properties()
        if self.database:
            p["database.dbname"] = self.database
        return p


@dataclass
class MongoConfig(ConnectorConfig):
    """mongodb/Capture.java:122-146: connection string + capture modes
    (with/without pre-images)."""

    connection_string: str | None = None
    capture_mode: str = "change_streams_update_full"
    connector_class = "mongodb"

    def to_properties(self) -> dict[str, str]:
        p = super().to_properties()
        if self.connection_string:
            p["mongodb.connection.string"] = self.connection_string
        p["capture.mode"] = self.capture_mode
        return p


CONNECTORS = {
    c.connector_class: c
    for c in (
        MySqlConfig,
        PostgresConfig,
        SqlServerConfig,
        OracleConfig,
        Db2Config,
        MongoConfig,
    )
}
