"""Exception hierarchy (parity with reference: Processing.scala:13-31,
metadata/metadata.scala:19-22)."""


class DatalakeException(Exception):
    """Base class for engine errors."""


class CalculatedColumnException(DatalakeException):
    """A metadata-declared calculated-column expression failed to resolve
    (reference: Processing.scala:259-272 — fatal, includes column + expr)."""


class DuplicateBusinesskeyException(DatalakeException):
    """Slice contains duplicate business keys (reference: Processing.scala:191-205)."""


class MetadataNotInitializedException(DatalakeException):
    """Metadata object used before its settings source was initialized
    (reference: metadata/metadata.scala:19-22,29-31)."""


class DuplicateEntityIdException(DatalakeException):
    """Two entities share an id in the metadata config
    (reference: DatalakeMetadataSettings.scala:56-59)."""


class EntityNotFoundException(DatalakeException):
    pass


class ConcurrentCommitException(DatalakeException):
    """Another writer committed the same table version first (optimistic
    concurrency conflict); re-read the latest manifest and retry."""


class ConstraintViolationException(DatalakeException):
    """A CHECK constraint with action='fail' matched violating slice rows
    (rebuild addition — the Delta CHECK-constraint analog; message carries
    per-constraint violation counts)."""
