"""Structured Streaming adapters (incremental ingest).

The reference is strictly batch (SURVEY.md §2.9); streaming here is an
*extension*: new source files flow through the signature stage
incrementally so the expensive featurization never recomputes, while
candidate/verify/components re-run in batch over the growing signature
table (LSH banding is associative over rows, so incremental signatures
compose exactly)."""
