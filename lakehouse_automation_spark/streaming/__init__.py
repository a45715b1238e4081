from .ingest import IngestPipeline, SURVEY_SCHEMA

__all__ = ["IngestPipeline", "SURVEY_SCHEMA"]
