"""PySpark-native rebuild of the GenAI-IDP accelerator's extraction engine.

Public API (mirrors the reference's stage-service surface,
``lib/idp_common_pkg/idp_common/__init__.py:11-72``, re-expressed as
DataFrame → DataFrame stages):

    from accelerated_intelligent_document_processing_on_aws_spark import (
        get_spark, extract_stage, run_pipeline,
    )

Subpackages:
    kernels/    pure pandas/numpy extraction + comparison kernels
    functions/  pure-Catalyst column expression builders
    operators/  DataFrame operators (extract, sectionize, dedup, similarity,
                evaluate)
    io/         snapshot-versioned table IO + lineage/checkpoint store
    datagen/    deterministic transcripts synthesizer (seed=42)
    streaming/  Structured Streaming ingestion (micro-batch analog of the
                reference's SQS/queue throttle)
"""

from .session import get_spark  # noqa: F401
from .pipeline import PipelineConfig, extract_stage, run_pipeline  # noqa: F401
