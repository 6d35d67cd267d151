"""Error contract mirroring the reference's exception taxonomy
(`fiona/errors.py`): the names users catch keep working."""


class FionaSparkError(Exception):
    """Base class."""


class AttributeFilterError(FionaSparkError, ValueError):
    """Invalid WHERE clause (`fiona/errors.py` AttributeFilterError;
    raised from `fiona/ogrext.pyx:1830-1840` on OGR parse failure)."""


class SchemaError(FionaSparkError):
    """Schema mismatch on write (`fiona/errors.py` SchemaError)."""


class DriverError(FionaSparkError):
    """Unknown/unsupported format (`fiona/errors.py` DriverError)."""


class UnsupportedGeometryTypeError(FionaSparkError):
    """Schema declares a geometry type outside the model
    (`fiona/errors.py` parity)."""


class GeometryTypeValidationError(FionaSparkError):
    """Record geometry type not allowed by the collection schema
    (`fiona/collection.py:699-720` _valid_geom_types)."""


class ReduceError(FionaSparkError):
    """`fio reduce` produced more than one value
    (`fiona/features.py:282-316`)."""
