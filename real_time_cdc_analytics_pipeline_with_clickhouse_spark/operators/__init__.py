from . import cdc, dedup, dsir, embedder, enrich, multimodal, relational, rollups, similarity  # noqa: F401
