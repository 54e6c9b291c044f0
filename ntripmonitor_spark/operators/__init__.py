"""Engine operators: RTCM decode/flatten (reference parity) and the
training-data pipeline extensions (dedup, similarity search, text
analysis, multimodal columns)."""
