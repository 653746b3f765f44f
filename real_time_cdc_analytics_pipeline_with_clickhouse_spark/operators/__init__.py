from . import cdc, dedup, dsir, enrich, multimodal, relational, rollups, similarity  # noqa: F401
