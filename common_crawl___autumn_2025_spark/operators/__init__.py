"""Training-data-pipeline operators: dedup, similarity search, text
quality, multimodal record processing — the engine-new surface a
100 TB corpus pipeline needs beyond the reference's operators."""
