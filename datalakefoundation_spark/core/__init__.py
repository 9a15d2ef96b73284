from datalakefoundation_spark.core.exceptions import (  # noqa: F401
    DatalakeException,
    DuplicateBusinesskeyException,
    MetadataNotInitializedException,
)
from datalakefoundation_spark.core.normalize import (  # noqa: F401
    clean_column_name,
    datalake_normalize,
    schema_compare,
)
