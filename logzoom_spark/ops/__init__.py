"""Large-scale training-data pipeline operators (dedup, text analysis,
similarity search, multimodal plumbing) over the `documents` and
`embeddings` tables."""
