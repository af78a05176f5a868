from .tools import SchemaTools  # noqa: F401
from .transformer import (  # noqa: F401
    bq_schema_to_struct_type,
    struct_type_to_bq_schema,
)
