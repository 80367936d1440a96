"""Structured Streaming surface (SURVEY.md §2.11)."""

from ecommerce_etl_pipeline_spark.streaming.streams import (  # noqa: F401
    ann_index_stream,
    cdc_apply_stream,
    cdc_snapshot,
    classifier_gate_stream,
    daily_sales_stream,
    deduped_events_stream,
    ingest_dedup_stream,
    decontam_gate_stream,
    quality_gate_stream,
    read_documents_stream,
    read_embeddings_stream,
    read_events_stream,
    session_window_stream,
    sliding_window_stream,
    stream_to_memory,
    stream_to_table,
    user_running_counts_stream,
    view_purchase_attribution_stream,
)
