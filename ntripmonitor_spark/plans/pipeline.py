"""Training-data pipeline operators (the north-star extensions beyond
the reference surface): deduplication, similarity search, text analysis,
multimodal column plumbing. Filled in per-op; each registers a Spark
callable + DuckDB oracle (or rows-only when genuinely non-SQL).
"""

from __future__ import annotations
