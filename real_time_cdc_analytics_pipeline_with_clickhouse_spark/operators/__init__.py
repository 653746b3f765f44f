from . import cdc, dedup, enrich, multimodal, relational, rollups, similarity  # noqa: F401
