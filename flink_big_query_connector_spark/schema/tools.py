"""Catalog CRUD + schema evolution against the Spark catalog.

Port of the reference's ``schema/SchemaTools.java``: create/exists/get/list
tables, additive schema evolution with column drop (the add-then-drop diff
of ``updateTable``, :87-100), and view replacement (``updateView``, :54-65)
— re-expressed as Spark SQL DDL on the session catalog.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType


def _q(ident: str) -> str:
    return ".".join(f"`{p}`" for p in ident.split("."))


class SchemaTools:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    # -- CRUD (SchemaTools.java:44-85) -------------------------------------
    def create_table(self, name: str, schema: StructType, using: str = "parquet",
                     location: str | None = None) -> None:
        ddl = schema.toDDL()
        loc = f" LOCATION '{location}'" if location else ""
        self.spark.sql(f"CREATE TABLE {_q(name)} ({ddl}) USING {using}{loc}")

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(name)

    def get_table_schema(self, name: str) -> StructType:
        return self.spark.table(name).schema

    def list_tables(self, database: str | None = None) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables(database)]

    def drop_table(self, name: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {_q(name)}")

    # -- schema evolution (SchemaTools.java:87-100,147-167) -----------------
    def update_table(self, name: str, desired: StructType) -> dict:
        """Diff live vs desired: ADD new columns, then DROP removed
        top-level columns — the same two-step patch+drop the reference does.
        Returns {"added": [...], "dropped": [...]} (empty lists = no-op)."""
        live = self.get_table_schema(name)
        live_names = {f.name for f in live.fields}
        desired_names = {f.name for f in desired.fields}

        added = [f for f in desired.fields if f.name not in live_names]
        dropped = sorted(live_names - desired_names)

        if added:
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in added
            )
            self.spark.sql(f"ALTER TABLE {_q(name)} ADD COLUMNS ({cols})")
        if dropped:
            try:
                for col in dropped:
                    # `DROP COLUMN IF EXISTS` per removed top-level column,
                    # like the reference's generated ALTER (:160-167).
                    self.spark.sql(
                        f"ALTER TABLE {_q(name)} DROP COLUMN IF EXISTS `{col}`"
                    )
            except Exception:
                # v1 file-format tables (plain parquet) don't support DROP
                # COLUMN; emulate by rewriting without the columns.  A v2
                # catalog (Delta/Iceberg) takes the fast path above.
                self._rewrite_without_columns(name, dropped)
        return {"added": [f.name for f in added], "dropped": dropped}

    def _rewrite_without_columns(self, name: str, dropped: list[str]) -> None:
        import tempfile

        staging = tempfile.mkdtemp(prefix="schema_evolve_")
        self.spark.table(name).drop(*dropped).write.mode("overwrite").parquet(
            staging
        )
        pruned = self.spark.read.parquet(staging)
        self.drop_table(name)
        self.create_table(name, pruned.schema)
        pruned.write.insertInto(name)

    # -- views (SchemaTools.java:54-65) -------------------------------------
    def update_view(self, name: str, query: str) -> None:
        self.spark.sql(f"CREATE OR REPLACE VIEW {_q(name)} AS {query}")
