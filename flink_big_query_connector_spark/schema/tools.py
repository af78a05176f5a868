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

    def get_table(self, name: str) -> dict | None:
        """Full catalog metadata for a table, or None when absent — the
        ``getTable`` accessor (``SchemaTools.java:72-74``, which returns
        the client's Table object or null).  Spark-side the table's
        metadata object is the catalog entry: name/catalog/namespace,
        type (MANAGED/EXTERNAL/VIEW), description, and the live schema."""
        if not self.exists(name):
            return None
        t = self.spark.catalog.getTable(name)
        return {
            "name": t.name,
            "catalog": t.catalog,
            "namespace": list(t.namespace or []),
            "description": t.description,
            "table_type": t.tableType,
            "is_temporary": t.isTemporary,
            "schema": self.get_table_schema(name),
        }

    def list_tables(self, database: str | None = None) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables(database)]

    def drop_table(self, name: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {_q(name)}")

    # -- schema evolution (SchemaTools.java:87-100,110-135,147-167) ---------
    def update_table(self, name: str, desired: StructType) -> dict:
        """Diff live vs desired: ADD new columns, then DROP removed
        top-level columns — the same two-step patch+drop the reference does
        (``updateTable`` :87-100).  Field ATTRIBUTES carry through the
        patch exactly as ``fieldsToTableFieldSchema`` (:110-135) does:

        - description -> Spark column COMMENT (the ``comment`` metadata
          key), emitted on ADD and re-patched via ALTER COLUMN when a
          retained column's description changed;
        - precision/scale -> encoded in ``DecimalType(p, s)`` and
          maxLength in ``varchar(n)``/``char(n)``, so both survive the
          generated DDL verbatim;
        - policy tags -> opaque ``policy_tags`` metadata preserved on the
          StructField (no Spark enforcement — catalog metadata only, the
          same pass-through role the reference's PolicyTags copy plays).

        The no-op check is order-insensitive over FULL fields (name, type,
        nullability, description), mirroring the reference's
        ``containsAll`` short-circuit (SchemaToolsTest
        ``shouldDoNothingWhenSchemasAreTheSame``).  Returns
        {"added": [...], "dropped": [...], "updated": [...]}."""
        live = self.get_table_schema(name)

        def _sig(f):
            return (
                f.name,
                f.dataType.simpleString(),
                f.nullable,
                f.metadata.get("comment"),
            )

        if {_sig(f) for f in live.fields} == {_sig(f) for f in desired.fields}:
            return {"added": [], "dropped": [], "updated": []}

        live_by = {f.name: f for f in live.fields}
        desired_names = {f.name for f in desired.fields}

        added = [f for f in desired.fields if f.name not in live_by]
        dropped = sorted(set(live_by) - desired_names)

        def _comment_clause(f):
            c = f.metadata.get("comment")
            if c is None:
                return ""
            return " COMMENT '" + str(c).replace("'", "''") + "'"

        if added:
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}{_comment_clause(f)}"
                for f in added
            )
            self.spark.sql(f"ALTER TABLE {_q(name)} ADD COLUMNS ({cols})")

        # description re-patch on retained columns (the RPC full-schema
        # patch updates every field's attributes, not just new ones)
        updated = []
        for f in desired.fields:
            lf = live_by.get(f.name)
            if lf is None:
                continue
            new_c = f.metadata.get("comment")
            if new_c is not None and new_c != lf.metadata.get("comment"):
                esc = str(new_c).replace("'", "''")
                self.spark.sql(
                    f"ALTER TABLE {_q(name)} ALTER COLUMN `{f.name}` "
                    f"COMMENT '{esc}'"
                )
                updated.append(f.name)
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
        return {
            "added": [f.name for f in added],
            "dropped": dropped,
            "updated": updated,
        }

    def _rewrite_without_columns(self, name: str, dropped: list[str]) -> None:
        from ..scratch import scratch_dir

        # preserve the table's location: recreating without it would turn
        # an external table managed (orphaning the old directory and
        # colliding with the warehouse path on later recreates)
        location = None
        for r in self.spark.sql(f"DESCRIBE FORMATTED {_q(name)}").collect():
            if r["col_name"].strip() == "Location":
                location = r["data_type"].strip()
                break
        staging = scratch_dir("schema_evolve_")
        self.spark.table(name).drop(*dropped).write.mode("overwrite").parquet(
            staging
        )
        pruned = self.spark.read.parquet(staging)
        self.drop_table(name)
        self.create_table(name, pruned.schema, location=location)
        pruned.write.mode("overwrite").insertInto(name)

    # -- views (SchemaTools.java:54-65) -------------------------------------
    def update_view(self, name: str, query: str) -> None:
        self.spark.sql(f"CREATE OR REPLACE VIEW {_q(name)} AS {query}")
