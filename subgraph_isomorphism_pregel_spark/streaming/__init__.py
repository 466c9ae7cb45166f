"""Structured Streaming surface (the reference is batch-only BSP; this is the
streaming face of the same engine for event tables)."""
