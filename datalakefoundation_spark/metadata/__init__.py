from datalakefoundation_spark.metadata.models import (  # noqa: F401
    Connection,
    Entity,
    EntityColumn,
    EntityTransformation,
    Environment,
    Metadata,
    Watermark,
)
from datalakefoundation_spark.metadata.sources import (  # noqa: F401
    JsonFolderMetadataSettings,
    JsonMetadataSettings,
    StringMetadataSettings,
)
