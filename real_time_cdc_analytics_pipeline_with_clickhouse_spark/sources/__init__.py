from . import cdc_feed  # noqa: F401
