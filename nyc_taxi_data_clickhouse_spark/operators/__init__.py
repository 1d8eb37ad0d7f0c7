"""Extension operators beyond reference parity (SURVEY §7): dedup,
similarity search, text analysis, multimodal plumbing."""
